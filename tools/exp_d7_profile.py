"""Round-6b: stage isolation of q_d7_chain (11.1 s in the full sweep —
the most expensive registered query; the bench's kg_link chain on the
same operators takes 3.1 s). Two passes to expose JIT.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from agraph_spark.caching import release_caches  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_d7_profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from agraph_spark.operators.linking import (
        alias_link,
        canonical_mapping,
        lsh_candidate_pairs,
        score_candidates,
        stub_verify_model,
        verify_pairs_batched,
    )

    d = entrymod._docs(spark, sf_dir)
    key = F.col("doc_id").cast("string")
    nodes = d.select(
        F.concat(F.lit("e"), key).alias("entity_id"),
        F.md5(key).alias("name"),
        F.md5(key).alias("name_norm"),
        F.lit("t").alias("entity_type"),
        F.lit(0.8).alias("confidence"),
        F.lit(None).cast("array<string>").alias("aliases"),
        F.lit(1).cast("long").alias("n_mentions"))
    alias_dict = d.where(F.col("doc_id") % 4 == 0).select(
        F.md5(key).alias("alias"),
        F.concat(F.lit("g"), (F.col("doc_id") % 40).cast("string"))
         .alias("canonical_name"),
        F.lit("t").alias("entity_type"))

    def t(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        print(f"  {name:34s} {time.time()-t0:8.3f}   {out if isinstance(out, int) else ''}",
              flush=True)
        sc.setJobDescription(None)
        return out

    for i in range(2):
        print(f"--- pass {i} ---", flush=True)
        cand = lsh_candidate_pairs(nodes)
        t("lsh_candidate_pairs count", cand.count)
        pairs = score_candidates(cand, 0.7)
        t("score_candidates count", pairs.count)
        verified = verify_pairs_batched(pairs, stub_verify_model).where(F.col("is_duplicate"))
        t("verify count", verified.count)
        hits = alias_link(nodes, alias_dict)
        t("alias_link count", hits.count)
        by_target = hits.alias("x").join(
            hits.alias("y"),
            (F.col("x.canonical_name") == F.col("y.canonical_name"))
            & (F.col("x.entity_id") < F.col("y.entity_id")),
        ).select(F.col("x.entity_id").alias("id_a"), F.col("y.entity_id").alias("id_b"))
        confirmed = verified.select("id_a", "id_b").unionByName(by_target).distinct()
        t("confirmed distinct count", confirmed.count)
        mapping = canonical_mapping(confirmed)
        t("canonical_mapping count", mapping.count)
        release_caches(spark)


if __name__ == "__main__":
    main()
