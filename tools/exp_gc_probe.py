"""Round-6b: are the intermittent multi-second stalls GC pauses or host
noise? Runs N bench-shaped kg_build iterations with -Xlog:gc to
/tmp/gc_probe.log; afterwards grep the log for long pauses and compare
their timestamps with the slow iterations.

Usage: python tools/exp_gc_probe.py [N]
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
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="exp_gc_probe", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={
            "spark.driver.extraJavaOptions":
                "-Xlog:gc*:file=/tmp/gc_probe.log:time,uptime"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    release_caches(spark)

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()

    for i in range(n_iter):
        t0 = time.time()
        build = build_kg(tdf)
        n = build.triples.count()
        print(f"iter{i}: start_uptime~{t0:.3f} wall={time.time()-t0:7.3f} n={n}",
              flush=True)
        build.documents.unpersist()
        build.entities.unpersist()
        release_caches(spark)


if __name__ == "__main__":
    main()
