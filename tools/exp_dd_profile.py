"""Round-6b: stage-by-stage isolation of dd_minhash and dd_ngram_jaccard
at bench scale (noop/count per stage, two passes to expose JIT).
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
    spark = get_spark(app_name="exp_dd_profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    docs.count()

    from agraph_spark.operators.dedup_docs import (
        _cap_buckets,
        minhash_lsh_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingle_table,
    )

    def t(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        print(f"  {name:38s} {time.time()-t0:8.3f}   {out if isinstance(out, int) else ''}",
              flush=True)
        sc.setJobDescription(None)
        return out

    for i in range(2):
        print(f"--- pass {i} ---", flush=True)
        # minhash stages
        sig = track(minhash_signatures(docs))
        t("mh sig cache count", sig.count)
        rows_n = 32 // 8
        band_vals = [
            F.xxhash64(F.concat_ws(",", *[
                F.element_at("sig", b * rows_n + r + 1).cast("string")
                for r in range(rows_n)]))
            for b in range(8)
        ]
        band_rows = sig.select("doc", F.posexplode(F.array(*band_vals)).alias("band", "bucket"))
        capped = track(_cap_buckets(band_rows, ["band", "bucket"], 5000, True))
        t("mh band cap count (incl hot log)", capped.count)
        a, b2 = capped.alias("a"), capped.alias("b")
        cand = (a.join(b2, ["band", "bucket"]).where(F.col("a.doc") < F.col("b.doc"))
                .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")).distinct())
        t("mh cand self-join count", cand.count)
        t("mh full (fresh op) count",
          lambda: minhash_lsh_pairs(docs).count())
        release_caches(spark)

        # ngram stages
        sh = track(shingle_table(docs))
        t("ng shingle cache count", sh.count)
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("c"))
               .where(F.col("c") > 200).select("shingle"))
        t("ng hot count", hot.count)
        filtered = sh.join(hot, "shingle", "left_anti")
        aa, bb = filtered.alias("a"), filtered.alias("b")
        inter = (aa.join(bb, "shingle").where(F.col("a.doc") < F.col("b.doc"))
                 .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
                 .agg(F.count("*").alias("inter")))
        t("ng inter self-join count", inter.count)
        t("ng full (fresh op) count", lambda: ngram_jaccard_pairs(docs).count())
        release_caches(spark)


if __name__ == "__main__":
    main()
