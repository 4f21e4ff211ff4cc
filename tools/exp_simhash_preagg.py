"""Round-6c REJECTED experiment: pre-aggregate (doc, tok) occurrence
counts before simhash64's 63-bit-sum aggregate (sum of +/-1 per
occurrence == cnt * +/-1, so fingerprints are identical — verified 0
mismatches both hash modes). The 2.33x row cut does NOT pay: warm A/B is
a wash-to-slightly-worse at sf0.1 AND sf1 (OLD 1.6-1.9 s vs NEW
1.9-2.4 s) because the extra (doc,tok) exchange offsets the heavy-stage
savings — the 63-agg partial aggregation is already map-side-bounded.
Same lesson class as the dd_ngram eager-pass rejection (r6a).
Usage: python tools/exp_simhash_preagg.py [sf_dir] [AB|VERIFY]
"""

import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from agraph_spark.session import get_spark
from agraph_spark import caching
import __spark_entry__ as E

spark = get_spark(app_name="probe_sh", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
docs = E._docs(spark, sf).select("doc_id", "text")
docs.count()
from agraph_spark.operators.dedup_docs import md5_hash60
from agraph_spark.session import spread

def simhash_v2(df, id_col="doc_id", text_col="text", hash_mode="xxhash64"):
    toks = spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+"), 0)).alias("tok"))
    # pre-aggregate occurrences: sum of +/-1 per occurrence == cnt * +/-1
    toks = toks.groupBy("doc", "tok").agg(F.count("*").alias("cnt"))
    if hash_mode == "md5":
        toks = toks.withColumn("h", md5_hash60(F.col("tok"), 0)); n_bits = 60
    else:
        toks = toks.withColumn("h", F.xxhash64("tok")); n_bits = 63
    bit_sums = toks.groupBy("doc").agg(
        *[F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"b{i}")
          for i in range(n_bits)])
    return bit_sums.select(
        "doc",
        sum([F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i)).otherwise(F.lit(0).cast("long"))
             for i in range(n_bits)]).alias("simhash"))

from agraph_spark.operators.dedup_docs import simhash64
mode = sys.argv[2] if len(sys.argv) > 2 else "AB"
if mode == "VERIFY":
    for hm in ("xxhash64", "md5"):
        old = simhash64(docs, hash_mode=hm).withColumnRenamed("simhash", "s_old")
        new = simhash_v2(docs, hash_mode=hm).withColumnRenamed("simhash", "s_new")
        j = old.join(new, "doc", "full_outer")
        bad = j.where(F.col("s_old").isNull() | F.col("s_new").isNull() | (F.col("s_old") != F.col("s_new"))).count()
        print(hm, "docs", j.count(), "mismatches", bad, flush=True)
    sys.exit(0)
for p in range(3):
    t0=time.time(); simhash64(docs).count(); a=time.time()-t0
    t0=time.time(); simhash_v2(docs).count(); b=time.time()-t0
    print(f"pass {p}: OLD {a:.3f}  NEW {b:.3f}", flush=True)
