"""Round-6c: can the ~3 s cold-process tax on dd_minhash's signature
stage be removed by SHRINKING the generated code instead of warming it?

The current minhash_signatures emits 32 min-aggregates (one janino class
with 32 xxhash64 calls + 32 buffer updates per row); cold it costs 3.8 s
vs 0.95 s warm (exp_dd_profile) — compile/JIT, not compute. Variant NEW
reformulates the same arithmetic as explode(seed 0..k-1) -> ONE min
aggregate on (doc, seed) -> tiny collect_list assembly: identical hash
values, identical mins, tiny generated methods, one extra (negligible,
32 rows/doc) exchange.

Usage:
  python tools/exp_sig_codegen.py OLD|NEW   # fresh-process cold timing of
                                            # the full bench-shaped operator
  python tools/exp_sig_codegen.py VERIFY    # old==new signatures, both modes
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agraph_spark.session import get_spark  # noqa: E402


def minhash_signatures_v2(
    df,
    num_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
):
    from agraph_spark.operators.dedup_docs import md5_hash60, shingle_table

    sh = shingle_table(df, id_col, text_col, n)
    seed = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    if hash_mode == "md5":
        ex = sh.select("doc", "shingle", seed)
        hv = F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("seed").cast("string"), F.col("shingle"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
    else:
        ex = sh.select("doc", F.xxhash64(F.col("shingle")).alias("h"), seed)
        hv = F.xxhash64(F.col("seed"), F.col("h"))
    mins = (
        ex.select("doc", "seed", hv.alias("hv"))
        .groupBy("doc", "seed")
        .agg(F.min("hv").alias("m"))
    )
    return (
        mins.groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("seed", "m"))).alias("sm"))
        .select("doc", F.transform("sm", lambda x: x["m"]).alias("sig"))
    )


def main() -> None:
    mode = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_sig_codegen", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    docs.count()

    import agraph_spark.operators.dedup_docs as DD

    if mode == "VERIFY":
        for hm in ("xxhash64", "md5"):
            old = DD.minhash_signatures(docs, hash_mode=hm).withColumnRenamed("sig", "sig_old")
            new = minhash_signatures_v2(docs, hash_mode=hm).withColumnRenamed("sig", "sig_new")
            j = old.join(new, "doc", "full_outer")
            n_total = j.count()
            n_bad = j.where(
                F.col("sig_old").isNull()
                | F.col("sig_new").isNull()
                | (F.col("sig_old") != F.col("sig_new"))
            ).count()
            print(f"{hm}: {n_total} docs, {n_bad} mismatches", flush=True)
            assert n_bad == 0, hm
        print("VERIFY OK", flush=True)
        return

    if mode == "NEW":
        DD.minhash_signatures = minhash_signatures_v2

    spark.sparkContext.setJobDescription(f"dd_minhash[{mode}]")
    t0 = time.time()
    n = DD.minhash_lsh_pairs(docs, threshold=0.3).count()
    t_full = time.time() - t0
    print(f"{mode}: full dd_minhash cold {t_full:.3f} s  rows={n}", flush=True)


if __name__ == "__main__":
    main()
