"""Round-6b experiment: how much of kg_build_transcripts' bench cost is
first-run planning/codegen tax vs computation?

Runs the EXACT bench path (build_kg(tdf).triples.count()) twice in one
session, releasing tracked caches in between (same as the bench's _fresh
hygiene). If run2 << run1, the delta is plan/codegen tax the 200-conv
warmup does not cover.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agraph_spark.caching import release_caches  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_build_jit", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    release_caches(spark)

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()

    for i in range(3):
        t0 = time.time()
        build = build_kg(tdf)
        n = build.triples.count()
        dt = round(time.time() - t0, 3)
        print(f"run{i}: {dt:8.3f}  n_triples={n}", flush=True)
        build.documents.unpersist()
        build.entities.unpersist()
        release_caches(spark)


if __name__ == "__main__":
    main()
