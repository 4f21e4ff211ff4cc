"""Round-6b: does the 200-conv warmup build_kg compile the SAME physical
plan shapes as the 3000-conv timed run? If not, the warmup cannot amortize
codegen/JIT for the bench, which would explain the measured ~5 s first-run
tax (exp_build_jit: 10.6 cold vs 4.9 warm in one session).

Prints the operator-node histogram of triples.explain for both sizes and a
diff of node kinds (join strategies, salting, AQE shapes).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agraph_spark.caching import release_caches  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def plan_nodes(df) -> Counter:
    txt = df._jdf.queryExecution().executedPlan().toString()
    nodes = re.findall(r"^[\s:+*\-(\d)]*([A-Za-z]+[A-Za-z0-9]*)", txt, re.M)
    return Counter(nodes), txt


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_plan_diff", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for n_convs, cache in ((200, False), (3000, True)):
        tdf = transcripts_df(spark, n_convs=n_convs, seed=1 if n_convs == 200 else 42)
        build = build_kg(tdf, cache_documents=cache)
        cnt, txt = plan_nodes(build.triples)
        out[n_convs] = cnt
        with open(f"/tmp/plan_{n_convs}.txt", "w") as f:
            f.write(txt)
        release_caches(spark)

    keys = sorted(set(out[200]) | set(out[3000]))
    print(f"{'node':40s} {'200conv':>8s} {'3000conv':>9s}")
    for k in keys:
        a, b = out[200].get(k, 0), out[3000].get(k, 0)
        mark = "  <<<" if a != b else ""
        print(f"{k:40s} {a:8d} {b:9d}{mark}")


if __name__ == "__main__":
    main()
