"""Round-6b: split lsh_candidate_pairs' cutover path (fit / feat.count /
hashed.collect / driver banding / createDataFrame) on the d7_chain corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from agraph_spark.caching import release_caches, track  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_d7_inner", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.ml.feature import HashingTF, MinHashLSH
    from agraph_spark.operators.linking import _driver_lsh_pairs

    d = entrymod._docs(spark, sf_dir)
    key = F.col("doc_id").cast("string")
    nodes = d.select(
        F.concat(F.lit("e"), key).alias("entity_id"),
        F.md5(key).alias("name_norm"),
        F.lit("t").alias("entity_type"))

    def t(name, fn):
        t0 = time.time()
        out = fn()
        print(f"  {name:28s} {time.time()-t0:8.3f}", flush=True)
        return out

    for i in range(2):
        print(f"--- pass {i} ---", flush=True)
        prepared = nodes.select(
            "entity_id", "name_norm", "entity_type",
            F.concat(F.lit("^^"), F.col("name_norm"), F.lit("$$")).alias("padded"),
        ).withColumn(
            "grams",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("padded") - 2, F.lit(1))),
                    lambda j: F.col("padded").substr(j, F.lit(3)),
                )
            ),
        ).where(F.size("grams") > 0)
        tf = HashingTF(inputCol="grams", outputCol="features",
                       numFeatures=1 << 18, binary=True)
        feat = track(tf.transform(prepared).select(
            "entity_id", "name_norm", "entity_type", "features"))
        lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                         numHashTables=4, seed=42)
        model = t("lsh.fit", lambda: lsh.fit(feat))
        hashed = model.transform(feat)
        n = t("feat.count", feat.count)
        rows = t("hashed.collect", hashed.collect)
        out = t("driver banding + createDF", lambda: _driver_lsh_pairs(
            spark, rows, 0.6, id_type=nodes.schema["entity_id"].dataType))
        t("local count", out.count)
        t("local count again", out.count)
        release_caches(spark)


if __name__ == "__main__":
    main()
