"""Round-6b A/B: kernel-cache strategy for the bench's kg_build path.

Variants (one per process; run alternating samples A,B,A,B to fight host
noise):
  A  current: track() + eager count (InMemoryRelation; full kernel subtree
     re-analyzed in every consumer branch)
  B  lazy localCheckpoint + eager count on the KERNEL output only (consumer
     branches analyze a shallow Scan ExistingRDD)
  C  B + the relation-stage caches (res/hits) also lineage-cut

Each run: bench-identical warmup, then the timed kg_build (build_kg(tdf)
.triples.count()), then kg_link, printed as JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import agraph_spark.pipeline as pipemod  # noqa: E402
import agraph_spark.operators.relations as relmod  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def ckpt(df):
    return df.localCheckpoint(eager=False)


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "A"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if variant in ("B", "C"):
        pipemod.track = ckpt
    if variant == "C":
        relmod.track = ckpt

    spark = get_spark(app_name="exp_build_ckpt", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    # bench-identical warmup. Variant OLD emulates the round-6 warmup shape
    # (kernel output NOT persisted -> uncached plan shapes, no codegen-cache
    # overlap with the timed run) by nulling pipeline.track for the warmup
    # only; NEW runs the current always-track code as-is.
    if variant == "OLD":
        orig_track = pipemod.track
        pipemod.track = lambda df, **k: df
        build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
        pipemod.track = orig_track
    else:
        build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()

    t0 = time.time()
    build = build_kg(tdf)
    n = build.triples.count()
    t_build = round(time.time() - t0, 3)

    from agraph_spark.materialize import build_nodes
    from agraph_spark.operators.linking import link_entities

    t0 = time.time()
    n_map = link_entities(build_nodes(build.entities)).count()
    t_link = round(time.time() - t0, 3)

    print(json.dumps({"variant": variant, "kg_build": t_build, "kg_link": t_link,
                      "n_triples": n, "n_map": n_map}))


if __name__ == "__main__":
    main()
