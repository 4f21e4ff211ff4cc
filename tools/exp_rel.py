"""A/B: pre-partitioned+sorted caches for the cooccurrence self-join and the
resolve_mentions table vs current. Checks multiset equality of triples and
times fresh runs of the docs pipeline (kg_triples_docs shape)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agraph_spark.caching import release_caches, track  # noqa: E402
from agraph_spark.operators.fused import extract_documents_fused  # noqa: E402
from agraph_spark.operators.relations import (  # noqa: E402
    _conv_join,
    resolve_mentions,
    split_sentences,
    to_triples,
    validate_relations,
)
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark, spread  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402

P_COOCCURRENCE_CONFIDENCE = 0.5
P_PATTERN_CONFIDENCE = 0.7


def cooccurrence_v2(documents, entities):
    sents = split_sentences(documents)
    hits = _conv_join(sents, entities, None).where(
        F.instr(F.col("sent"), F.col("name_norm")) > 0
    ).select("conv_id", "sent_idx", "name_norm", "entity_type", "entity_order")
    # pre-partition + sort INSIDE the cache on the self-join keys: both
    # sides then scan the cache exchange- and sort-free
    hits = track(hits.repartition("conv_id", "sent_idx")
                 .sortWithinPartitions("conv_id", "sent_idx"))
    a = hits.alias("a")
    b = hits.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.conv_id") == F.col("b.conv_id"),
                F.col("a.sent_idx") == F.col("b.sent_idx"),
                F.col("a.entity_order") < F.col("b.entity_order"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("conv_id"),
            F.col("a.name_norm").alias("head_norm"),
            F.col("a.entity_type").alias("head_type"),
            F.lit("related_to").alias("pred"),
            F.col("b.name_norm").alias("tail_norm"),
            F.col("b.entity_type").alias("tail_type"),
            F.lit(P_COOCCURRENCE_CONFIDENCE).alias("conf"),
        )
    )


def pattern_v2(candidates, entities):
    texts = (
        candidates.select("conv_id", F.col("head_text").alias("text"))
        .unionByName(candidates.select("conv_id", F.col("tail_text").alias("text")))
        .distinct()
    )
    res = resolve_mentions(texts, entities, None)
    res = track(res.repartition("conv_id", "text")
                .sortWithinPartitions("conv_id", "text"))
    h = res.select(
        "conv_id", F.col("text").alias("head_text"),
        F.col("ent_norm").alias("head_norm"), F.col("ent_type").alias("head_type"))
    t = res.select(
        "conv_id", F.col("text").alias("tail_text"),
        F.col("ent_norm").alias("tail_norm"), F.col("ent_type").alias("tail_type"))
    return (
        candidates.join(h, ["conv_id", "head_text"])
        .join(t, ["conv_id", "tail_text"])
        .select("conv_id", "head_norm", "head_type", "pred", "tail_norm",
                "tail_type", F.lit(P_PATTERN_CONFIDENCE).alias("conf"))
    )


def triples_v2(documents):
    documents = spread(documents)
    extracted = track(extract_documents_fused(documents))
    entities = extracted.select("conv_id", F.explode("ents").alias("e")).select(
        "conv_id", "e.name", "e.name_norm", "e.entity_type", "e.confidence",
        "e.entity_order")
    candidates = extracted.select("conv_id", F.explode("cands").alias("c")).select(
        "conv_id", "c.pred", "c.head_text", "c.tail_text")
    pat = pattern_v2(candidates, entities)
    coo = cooccurrence_v2(extracted.select("conv_id", "text"), entities)
    return to_triples(validate_relations(pat.unionByName(coo)))


def tset_hash(df):
    h = F.md5(F.concat_ws("|", "conv_id", "subj", "pred", "obj",
                          F.format_string("%.6f", "conf")))
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.conv(F.substring(h, 1, 14), 16, 10).cast("decimal(38,0)")).alias("s"),
    ).first()


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_rel", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("conv_id"), "text")

    from agraph_spark.pipeline import build_triples_from_texts

    # correctness first
    a = tset_hash(build_triples_from_texts(docs))
    release_caches(spark)
    b = tset_hash(triples_v2(docs))
    release_caches(spark)
    print(f"equal: {a == b}  a={a}  b={b}", flush=True)

    for it in range(3):
        t0 = time.time()
        build_triples_from_texts(docs).count()
        ta = time.time() - t0
        release_caches(spark)
        t0 = time.time()
        triples_v2(docs).count()
        tb = time.time() - t0
        release_caches(spark)
        print(f"iter {it}: current {ta:.2f}s  v2 {tb:.2f}s", flush=True)


if __name__ == "__main__" and not os.environ.get("EXP_MODE"):
    main()


def triples_v3(documents):
    """Eager cache materialization: count() res/hits caches before their
    double-consumer joins so the two union branches don't race to build
    the same cached partitions concurrently (duplicated work)."""
    from agraph_spark.operators.relations import (
        cooccurrence_relations,
        pattern_relations,
    )

    documents = spread(documents)
    extracted = track(extract_documents_fused(documents))
    extracted.count()  # eager: kernel cache built once, no racing branches
    entities = extracted.select("conv_id", F.explode("ents").alias("e")).select(
        "conv_id", "e.name", "e.name_norm", "e.entity_type", "e.confidence",
        "e.entity_order")
    candidates = extracted.select("conv_id", F.explode("cands").alias("c")).select(
        "conv_id", "c.pred", "c.head_text", "c.tail_text")
    pat = pattern_relations(candidates, entities)
    coo = cooccurrence_relations(extracted.select("conv_id", "text"), entities)
    return to_triples(validate_relations(pat.unionByName(coo)))


def main_v3() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_rel3", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("conv_id"), "text")
    from agraph_spark.pipeline import build_triples_from_texts
    for it in range(3):
        t0 = time.time()
        build_triples_from_texts(docs).count()
        ta = time.time() - t0
        release_caches(spark)
        t0 = time.time()
        triples_v3(docs).count()
        tb = time.time() - t0
        release_caches(spark)
        print(f"iter {it}: current {ta:.2f}s  v3-eager {tb:.2f}s", flush=True)


if os.environ.get("EXP_MODE") == "v3":
    main_v3()
