"""Kill-and-resume: a run killed mid-way and resumed produces exactly the
triple set of an uninterrupted run (BASELINE.md resumability gate)."""

from __future__ import annotations

import tempfile

import pytest

from agraph_spark.checkpoint import (
    CheckpointManifest,
    finalize_graph,
    read_all_triples,
    run_checkpointed,
)
from agraph_spark.pipeline import build_kg
from agraph_spark.synth import transcripts_df


def triple_set(df):
    return {(r.subj, r.pred, r.obj) for r in df.select("subj", "pred", "obj").distinct().collect()}


def test_kill_and_resume_identical(spark):
    tdf = transcripts_df(spark, n_convs=30, seed=17)
    want = triple_set(build_kg(tdf).triples)

    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(RuntimeError, match="simulated failure"):
            run_checkpointed(spark, tdf, d, n_batches=6, fail_after=2)
        done_before = CheckpointManifest(d).completed("triples")
        assert len(done_before) == 2

        results = run_checkpointed(spark, tdf, d, n_batches=6)
        assert sum(1 for r in results if r.skipped) == 2
        assert CheckpointManifest(d).completed("triples") == set(range(6))

        got = triple_set(read_all_triples(spark, d))
        assert got == want

        nodes, edges = finalize_graph(spark, d, link=False)
        assert nodes.count() > 0
        # referential integrity: every FK resolves
        ids = {r.entity_id for r in nodes.select("entity_id").collect()}
        for r in edges.select("head_id", "tail_id").collect():
            assert r.head_id in ids and r.tail_id in ids


def test_manifest_metrics(spark):
    tdf = transcripts_df(spark, n_convs=10, seed=3)
    with tempfile.TemporaryDirectory() as d:
        run_checkpointed(spark, tdf, d, n_batches=3)
        import json

        recs = [json.loads(l) for l in open(f"{d}/_manifest.jsonl")]
        assert len(recs) == 3
        assert all(r["n_triples"] >= 0 and r["seconds"] > 0 for r in recs)
