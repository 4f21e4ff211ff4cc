"""Synthesize an sf1-equivalent table set by replicating sf0.1 (VERDICT r4 #6).

No sf1 directory ships with the test data, but the round-4 verdict asks
whether the bench suite's costs grow superlinearly with graph density —
so build one: every fact table is replicated ``factor`` times with
shifted keys, while region/nation (the graph's hub vocabulary) stay
fixed. That makes nation hubs ``factor``x hotter — the exact density
growth cycles/paths/components must survive.

Replica texts get a per-replica suffix token so the dedup operators see
near-duplicates (bounded pair groups of size ``factor``), not a wall of
byte-identical clones.

Usage: python tools/make_sf_big.py [OUT_DIR] [FACTOR]   (defaults /tmp/sf1, 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agraph_spark.session import get_spark

SRC = os.environ.get("SF_BIG_SRC", "/root/testdata/sf0.1")

# Key DOMAINS: each gets one span, computed from its defining (parent)
# table, and every column in that domain — PK and FKs alike — shifts by
# the same span. Shifting each column by its own table's max would
# misalign FKs whenever max(child FK) != max(parent PK) (e.g. real TPC-H,
# where a third of customers have no orders).
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
}

# table -> [(column, domain)]
SHIFT = {
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey"),
                 ("l_suppkey", "suppkey")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "part": [("p_partkey", "partkey")],
}
COPY = ["region", "nation"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="make_sf_big", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    for name in COPY:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite") \
            .parquet(f"{out_dir}/{name}.parquet")
        print(f"copied {name}")

    reps = spark.range(factor).select(F.col("id").cast("int").alias("_rep"))
    spans = {}
    for dom, (tbl, col) in DOMAINS.items():
        src = f"{SRC}/{tbl}.parquet"
        if os.path.exists(src):
            spans[dom] = spark.read.parquet(src).agg(F.max(col)).first()[0] + 1
    for name, keys in SHIFT.items():
        src = f"{SRC}/{name}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        keys = [(k, d) for k, d in keys if k in df.columns and d in spans]
        big = df.crossJoin(F.broadcast(reps))
        for k, dom in keys:
            big = big.withColumn(k, (F.col(k) + F.col("_rep") * F.lit(spans[dom])
                                     ).cast(dict(df.dtypes)[k]))
        if "text" in df.columns:
            big = big.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"),
                             F.col("_rep").cast("string"))))
        big.drop("_rep").write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"replicated {name} x{factor}: {n} rows")


if __name__ == "__main__":
    main()
