"""Streaming incremental build == batch build on the same corpus, and
late-arriving appends are picked up by a second drain."""

from __future__ import annotations

import os
import tempfile

from agraph_spark.pipeline import build_kg
from agraph_spark.streaming.incremental import start_transcript_stream, streamed_triples
from agraph_spark.synth import transcripts_df


def triple_set(df):
    return {(r.conv_id, r.subj, r.pred, r.obj) for r in df.collect()}


def test_stream_equals_batch(spark):
    tdf = transcripts_df(spark, n_convs=16, seed=9).persist()
    want = triple_set(build_kg(tdf).triples)

    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in")
        out = os.path.join(d, "out")
        # two separate appends (files) -> multiple micro-batches
        tdf.where("conv_id < 'conv000008'").write.mode("append").parquet(inp)
        q = start_transcript_stream(spark, inp, out)
        q.awaitTermination(120)

        tdf.where("conv_id >= 'conv000008'").write.mode("append").parquet(inp)
        q2 = start_transcript_stream(spark, inp, out)
        q2.awaitTermination(120)

        got = triple_set(streamed_triples(spark, out))
        assert got == want
