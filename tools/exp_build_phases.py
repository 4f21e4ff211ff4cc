"""Round-6b: split kg_build's first-run cost into driver-side planning
(analysis+optimization+physical planning, forced via queryExecution) vs
execution (jobs), for run0 (cold) and run1 (warm) in one session.
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
    spark = get_spark(app_name="exp_build_phases", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    release_caches(spark)

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()

    for i in range(2):
        t0 = time.time()
        build = build_kg(tdf)   # includes the kernel-cache eager count job
        t_build_kg = time.time()
        qe = build.triples._jdf.queryExecution()
        qe.executedPlan()       # force analysis/optimization/physical planning
        t_plan = time.time()
        n = build.triples.count()
        t_exec = time.time()
        print(f"run{i}: build_kg(count incl)={t_build_kg-t0:7.3f}  "
              f"plan={t_plan-t_build_kg:7.3f}  exec={t_exec-t_plan:7.3f}  "
              f"total={t_exec-t0:7.3f}  n={n}", flush=True)
        build.documents.unpersist()
        build.entities.unpersist()
        release_caches(spark)


if __name__ == "__main__":
    main()
