"""A/B experiment: lsh_candidate_pairs with (a) slim projection before the
approxSimilarityJoin and (b) a persisted feature table, vs the current
implementation. Asserts identical output pairs; times full link chain."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agraph_spark.caching import release_caches, track  # noqa: E402
from agraph_spark.materialize import build_nodes  # noqa: E402
from agraph_spark.operators.linking import (  # noqa: E402
    canonical_mapping,
    score_candidates,
    stub_verify_model,
    verify_pairs_batched,
)
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def lsh_pairs_v2(nodes, num_hash_tables=4, max_jaccard_distance=0.6, ngram=3,
                 vocab_features=1 << 18, max_name_len=32, max_name_words=4):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    linkable = (F.length("name_norm") <= max_name_len) & (
        F.size(F.split(F.col("name_norm"), r"\s+")) <= max_name_words
    )
    prepared = nodes.where(linkable).select(
        "entity_id", "name_norm", "entity_type",
        F.concat(F.lit("^^"), F.col("name_norm"), F.lit("$$")).alias("padded"),
    ).withColumn(
        "grams",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("padded") - (ngram - 1), F.lit(1))),
                lambda i: F.col("padded").substr(i, F.lit(ngram)),
            )
        ),
    ).where(F.size("grams") > 0)

    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=vocab_features, binary=True)
    # slim: drop padded/grams before the self-join (the join's distinct
    # shuffles full structs of both sides); persist so the self-join's two
    # sides scan the cache instead of recomputing nodes->grams->TF twice
    feat = track(tf.transform(prepared).select(
        "entity_id", "name_norm", "entity_type", "features"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, max_jaccard_distance, distCol="lsh_distance")
    return (
        joined.where(
            (F.col("datasetA.entity_id") < F.col("datasetB.entity_id"))
            & (F.col("datasetA.entity_type") == F.col("datasetB.entity_type"))
        )
        .select(
            F.col("datasetA.entity_id").alias("id_a"),
            F.col("datasetB.entity_id").alias("id_b"),
            F.col("datasetA.name_norm").alias("name_a"),
            F.col("datasetB.name_norm").alias("name_b"),
            F.col("datasetA.entity_type").alias("type_a"),
            F.col("datasetB.entity_type").alias("type_b"),
            "lsh_distance",
        )
    )


def link_v2(nodes):
    pairs = score_candidates(lsh_pairs_v2(nodes), 0.7)
    verified = verify_pairs_batched(pairs, stub_verify_model).where(F.col("is_duplicate"))
    return canonical_mapping(verified.select("id_a", "id_b"))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_link", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()
    build = build_kg(tdf)
    build.triples.count()

    from agraph_spark.operators.linking import link_entities, lsh_candidate_pairs

    # correctness: same candidate pair set
    nodes = build_nodes(build.entities)
    old_pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(nodes).collect()}
    new_pairs = {(r.id_a, r.id_b) for r in lsh_pairs_v2(nodes).collect()}
    release_caches(spark)
    print("pairs equal:", old_pairs == new_pairs, len(old_pairs), len(new_pairs), flush=True)

    for it in range(3):
        t0 = time.time()
        n_old = link_entities(build_nodes(build.entities)).count()
        t_old = time.time() - t0
        release_caches(spark)
        t0 = time.time()
        n_new = link_v2(build_nodes(build.entities)).count()
        t_new = time.time() - t0
        release_caches(spark)
        print(f"iter {it}: old {t_old:.2f}s (n={n_old})  new {t_new:.2f}s (n={n_new})", flush=True)


if __name__ == "__main__" and os.environ.get("EXP_MODE") != "profile":
    main()


def profile_v2(spark, build):
    """Where does link_v2's remaining time go?"""
    import time as _t
    from pyspark.ml.feature import HashingTF, MinHashLSH

    nodes = build_nodes(build.entities)
    t0 = _t.time()
    linkable = (F.length("name_norm") <= 32) & (
        F.size(F.split(F.col("name_norm"), r"\s+")) <= 4)
    prepared = nodes.where(linkable).select(
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
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = track(tf.transform(prepared).select(
        "entity_id", "name_norm", "entity_type", "features"))
    n = feat.count()
    print(f"  feat cache ({n} rows): {_t.time()-t0:.2f}s", flush=True)
    t0 = _t.time()
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feat)
    print(f"  fit: {_t.time()-t0:.2f}s", flush=True)
    t0 = _t.time()
    joined = model.approxSimilarityJoin(feat, feat, 0.6, distCol="lsh_distance")
    raw = (
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
    raw.write.format("noop").mode("overwrite").save()
    print(f"  lsh join (noop): {_t.time()-t0:.2f}s", flush=True)
    t0 = _t.time()
    pairs = score_candidates(raw, 0.7)
    verified = verify_pairs_batched(pairs, stub_verify_model).where(F.col("is_duplicate"))
    confirmed = verified.select("id_a", "id_b")
    confirmed.write.format("noop").mode("overwrite").save()
    print(f"  verify chain (noop, incl join recompute): {_t.time()-t0:.2f}s", flush=True)
    t0 = _t.time()
    canonical_mapping(confirmed).count()
    print(f"  canonical_mapping (incl chain recompute): {_t.time()-t0:.2f}s", flush=True)
    release_caches(spark)


def main2() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_link", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()
    build = build_kg(tdf)
    build.triples.count()
    for it in range(2):
        print(f"--- pass {it} ---", flush=True)
        profile_v2(spark, build)
if os.environ.get("EXP_MODE") == "profile":
    main2()
