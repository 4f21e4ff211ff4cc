"""Stage-by-stage profiling of kg_build_transcripts and kg_link_entities
(guide §1: find where the time goes before changing anything).

Each logical stage is materialized with a noop sink in dependency order so
its time is isolated; two passes expose first-run (codegen/JIT/GC) costs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile_r06", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warmup as bench.py
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()

    from agraph_spark.caching import release_caches
    from agraph_spark.materialize import build_nodes
    from agraph_spark.operators.fused import extract_documents_fused
    from agraph_spark.operators.linking import (
        canonical_mapping,
        lsh_candidate_pairs,
        score_candidates,
        verify_pairs_batched,
    )
    from agraph_spark.operators.reassemble import reassemble_conversations
    from agraph_spark.operators.relations import (
        cooccurrence_relations,
        pattern_relations,
        to_triples,
        validate_relations,
    )

    def t(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 3)
        print(f"  {name:34s} {dt:8.3f}", flush=True)
        sc.setJobDescription(None)
        return out

    for it in range(2):
        print(f"--- kg_build pass {it} ---", flush=True)
        docs = reassemble_conversations(tdf)
        t("reassemble(noop)", lambda: noop(docs))
        extracted = extract_documents_fused(docs)
        t("kernel(noop, uncached)", lambda: noop(extracted))
        from agraph_spark.caching import track
        extracted_c = track(extract_documents_fused(docs))
        t("kernel(cache materialize)", lambda: extracted_c.count())
        documents = extracted_c.select("conv_id", "text")
        entities = extracted_c.select("conv_id", F.explode("ents").alias("e")).select(
            "conv_id", "e.name", "e.name_norm", "e.entity_type", "e.confidence",
            "e.entity_order")
        candidates = extracted_c.select("conv_id", F.explode("cands").alias("c")).select(
            "conv_id", "c.pred", "c.head_text", "c.tail_text")
        t("entities explode(noop)", lambda: noop(entities))
        pat = pattern_relations(candidates, entities)
        t("pattern_relations(noop)", lambda: noop(pat))
        coo = cooccurrence_relations(documents, entities)
        t("cooccurrence(noop)", lambda: noop(coo))
        triples = to_triples(validate_relations(pat.unionByName(coo)))
        t("triples(count, cached upstream)", lambda: triples.count())

        print(f"--- kg_link pass {it} ---", flush=True)
        nodes = build_nodes(entities)
        t("build_nodes(noop)", lambda: noop(nodes))
        nodes_c = track(build_nodes(entities))
        t("build_nodes(cache)", lambda: nodes_c.count())

        from pyspark.ml.feature import HashingTF, MinHashLSH

        linkable = (F.length("name_norm") <= 32) & (
            F.size(F.split(F.col("name_norm"), r"\s+")) <= 4)
        prepared = nodes_c.where(linkable).select(
            "entity_id", "name_norm", "entity_type",
            F.concat(F.lit("^^"), F.col("name_norm"), F.lit("$$")).alias("padded"),
        ).withColumn(
            "grams",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("padded") - 2, F.lit(1))),
                    lambda i: F.col("padded").substr(i, F.lit(3)),
                )
            ),
        ).where(F.size("grams") > 0)
        tf = HashingTF(inputCol="grams", outputCol="features",
                       numFeatures=1 << 18, binary=True)
        feat = tf.transform(prepared)
        t("feat(noop)", lambda: noop(feat))
        lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                         numHashTables=4, seed=42)
        model = t("lsh.fit", lambda: lsh.fit(feat))
        joined = model.approxSimilarityJoin(feat, feat, 0.6, distCol="lsh_distance")
        raw_pairs = (
            joined.where(
                (F.col("datasetA.entity_id") < F.col("datasetB.entity_id"))
                & (F.col("datasetA.entity_type") == F.col("datasetB.entity_type")))
            .select(
                F.col("datasetA.entity_id").alias("id_a"),
                F.col("datasetB.entity_id").alias("id_b"),
                F.col("datasetA.name_norm").alias("name_a"),
                F.col("datasetB.name_norm").alias("name_b"),
                F.col("datasetA.entity_type").alias("type_a"),
                F.col("datasetB.entity_type").alias("type_b"),
                "lsh_distance"))
        t("approxSimilarityJoin(noop)", lambda: noop(raw_pairs))
        pairs = score_candidates(lsh_candidate_pairs(nodes_c), 0.7)
        verified = verify_pairs_batched(pairs).where(F.col("is_duplicate"))
        confirmed = verified.select("id_a", "id_b")
        t("full chain -> confirmed(noop)", lambda: noop(confirmed))
        t("canonical_mapping(count)", lambda: canonical_mapping(confirmed).count())
        release_caches(spark)
    tdf.unpersist()


if __name__ == "__main__":
    main()
