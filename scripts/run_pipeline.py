"""spark-submit entry point: end-to-end KG construction job.

Usage (local sanity / cluster alike):
  python scripts/make_pyfiles_zip.py
  spark-submit --master <master> --py-files dist/agraph_spark.zip \\
      scripts/run_pipeline.py --input <transcripts parquet> --output <dir> \\
      [--n-batches 16] [--alias-dict <parquet>] [--synth-convs N]

Reads the transcripts table (conv_id, turn_idx, role, text, tool, ts),
runs the checkpointed batched pipeline (resumable: re-running with the
same --output skips completed batches), finalizes nodes/edges with entity
linking, and writes the graph store.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running as a plain script (no spark-submit --py-files): make the repo
# package importable driver-side; session.py handles worker PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-batches", type=int, default=16)
    ap.add_argument("--alias-dict", default="")
    ap.add_argument("--synth-convs", type=int, default=0,
                    help="generate a synthetic corpus instead of --input")
    ap.add_argument("--no-link", action="store_true")
    args = ap.parse_args()

    from agraph_spark.checkpoint import finalize_graph, run_checkpointed
    from agraph_spark.session import get_spark

    spark = get_spark(app_name="agraph_spark_pipeline")
    if args.synth_convs:
        from agraph_spark.synth import transcripts_df

        transcripts = transcripts_df(spark, n_convs=args.synth_convs, seed=42)
    else:
        transcripts = spark.read.parquet(args.input)

    alias_dict = spark.read.parquet(args.alias_dict) if args.alias_dict else None

    t0 = time.time()
    results = run_checkpointed(spark, transcripts, args.output, n_batches=args.n_batches)
    nodes, edges = finalize_graph(spark, args.output, alias_dict=alias_dict,
                                  link=not args.no_link)
    n_nodes, n_edges = nodes.count(), edges.count()
    print(json.dumps({
        "batches": len(results),
        "skipped": sum(1 for r in results if r.skipped),
        "triples": sum(max(r.n_triples, 0) for r in results),
        "nodes": n_nodes,
        "edges": n_edges,
        "seconds": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
