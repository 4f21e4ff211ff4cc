"""Capture before/after physical plans for the kg_link_entities LSH chain.

"before" imports the round-start linking module from a git worktree passed
as argv[1] (default /tmp/r5tree); "after" uses the working tree. Both plans
are for the lsh_candidate_pairs DataFrame over the same bench-corpus nodes
(the after plan is captured with the driver cutover disabled so the
DISTRIBUTED join shape is comparable; the cutover itself produces no plan —
that is the point — and is evidenced by the equivalence test +
OPTIMIZATION_r06.md numbers).
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agraph_spark.materialize import build_nodes  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    r5 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5tree"
    plans = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "plans", "r06")
    spark = get_spark(app_name="capture_link", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    build = build_kg(tdf)
    build.triples.count()
    nodes = build_nodes(build.entities)

    spec = importlib.util.spec_from_file_location(
        "linking_r5", os.path.join(r5, "agraph_spark", "operators", "linking.py"))
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)
    with open(os.path.join(plans, "kg_link_lsh_before.txt"), "w") as fh:
        fh.write(explain(old.lsh_candidate_pairs(nodes)))

    import agraph_spark.operators.linking as new
    with open(os.path.join(plans, "kg_link_lsh_after_distributed.txt"), "w") as fh:
        fh.write(explain(new.lsh_candidate_pairs(
            nodes, small_universe_threshold=None)))
    print("captured", flush=True)


if __name__ == "__main__":
    main()
