"""Round-6b: time EVERY registered queries() entry at sf0.1 with the
driver's methodology (fresh _fresh-wrapped call + .count()), one session.
Prints name,seconds sorted desc so any pathological non-bench query is
visible. Usage: python tools/exp_sweep_all.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_sweep_all", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    entrymod._g(spark, sf_dir)[1].count()  # graph-store warmup like bench

    qs = entrymod.queries()
    times = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            times[name] = (round(time.time() - t0, 3), n, "")
        except Exception as e:  # record, keep sweeping
            times[name] = (round(time.time() - t0, 3), -1, str(e)[:80])
        spark.sparkContext.setJobDescription(None)

    total = sum(t for t, _, _ in times.values())
    for name, (t, n, err) in sorted(times.items(), key=lambda kv: -kv[1][0]):
        flag = f"  ERR {err}" if err else ""
        print(f"{t:8.3f}  {name:28s} rows={n}{flag}", flush=True)
    print(f"TOTAL {total:.1f} s over {len(times)} queries", flush=True)


if __name__ == "__main__":
    main()
