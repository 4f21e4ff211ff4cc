"""Capture the physical plan of the kg_link_entities LSH candidate join.

Usage: python tools/capture_link_plans.py <repo_root> <out_file> [distributed]

Run once against the round-start worktree (before) and once against the
working tree with the cutover disabled (after, distributed shape — the
driver cutover itself produces no Spark plan; its evidence is the
equivalence test + OPTIMIZATION_r06.md). The repo root goes FIRST on
sys.path so the packaged relative imports resolve against that tree.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    root, out = sys.argv[1], sys.argv[2]
    sys.path.insert(0, root)
    from agraph_spark.materialize import build_nodes
    from agraph_spark.operators.linking import lsh_candidate_pairs
    from agraph_spark.pipeline import build_kg
    from agraph_spark.session import get_spark
    from agraph_spark.synth import transcripts_df

    spark = get_spark(app_name="capture_link", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    build = build_kg(tdf)
    build.triples.count()
    nodes = build_nodes(build.entities)
    kw = {}
    if len(sys.argv) > 3 and sys.argv[3] == "distributed":
        kw["small_universe_threshold"] = None
    df = lsh_candidate_pairs(nodes, **kw)
    with open(out, "w") as fh:
        fh.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print("captured", out, flush=True)


if __name__ == "__main__":
    main()
