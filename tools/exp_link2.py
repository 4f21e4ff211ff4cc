"""Cold sub-step timing of the round-6 link cutover path (fresh process)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agraph_spark.caching import release_caches, track  # noqa: E402
from agraph_spark.materialize import build_nodes  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_link2", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()
    build = build_kg(tdf)
    build.triples.count()

    from pyspark.ml.feature import HashingTF, MinHashLSH

    import agraph_spark.operators.linking as L

    for it in range(2):
        print(f"--- pass {it} ---", flush=True)
        nodes = build_nodes(build.entities)
        t0 = time.time()
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
        print(f"  plan-build: {time.time()-t0:.2f}", flush=True)
        t0 = time.time()
        lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
        model = lsh.fit(feat)
        print(f"  fit: {time.time()-t0:.2f}", flush=True)
        t0 = time.time()
        n = feat.count()
        print(f"  feat.count ({n}): {time.time()-t0:.2f}", flush=True)
        t0 = time.time()
        rows = model.transform(feat).collect()
        print(f"  transform+collect: {time.time()-t0:.2f}", flush=True)
        t0 = time.time()
        pairs_df = L._driver_lsh_pairs(spark, rows, 0.6,
                                       nodes.schema["entity_id"].dataType)
        print(f"  driver pairs + createDataFrame: {time.time()-t0:.2f}", flush=True)
        t0 = time.time()
        scored = L.score_candidates(pairs_df, 0.7)
        verified = L.verify_pairs_batched(scored).where(F.col("is_duplicate"))
        confirmed = verified.select("id_a", "id_b")
        mapping = L.canonical_mapping(confirmed)
        nm = mapping.count()
        print(f"  score+verify+canonical ({nm}): {time.time()-t0:.2f}", flush=True)
        release_caches(spark)


if __name__ == "__main__":
    main()
