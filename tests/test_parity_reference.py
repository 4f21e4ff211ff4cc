"""Parity gate: Spark pipeline's (subj, pred, obj) set vs the ACTUAL
reference extractors run on the same reassembled conversations.

BASELINE.json: P/R >= 0.95. We target exact parity (1.0) on the
deterministic path; any regex/order/dedup drift fails here.
"""

from __future__ import annotations

import pandas as pd
import pytest

from agraph_spark.operators.reassemble import TURN_SEPARATOR
from agraph_spark.pipeline import build_kg
from agraph_spark.refload import reference_triples
from agraph_spark.synth import make_transcripts, transcripts_df


def golden_triples(pdf: pd.DataFrame) -> set[tuple[str, str, str]]:
    """Reference extractors over per-conversation documents (stable turn order)."""
    out: set[tuple[str, str, str]] = set()
    pdf = pdf.sort_values(["conv_id", "turn_idx", "ts"])
    for _, grp in pdf.groupby("conv_id", sort=True):
        doc = TURN_SEPARATOR.join(grp["text"].tolist())
        out |= reference_triples(doc)
    return out


@pytest.mark.parametrize(
    "seed,n_convs,mode",
    [(7, 25, "fused"), (42, 40, "fused"), (7, 25, "modular"), (42, 40, "modular"),
     (7, 25, "grouped"), (42, 40, "grouped")],
)
def test_triple_parity(spark, seed, n_convs, mode):
    tdf = transcripts_df(spark, n_convs=n_convs, seed=seed)
    build = build_kg(tdf, mode=mode)
    got = {
        (r.subj, r.pred, r.obj)
        for r in build.triples.select("subj", "pred", "obj").distinct().collect()
    }
    want = golden_triples(make_transcripts(n_convs=n_convs, seed=seed))

    tp = len(got & want)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(want) if want else 1.0
    missing = list(want - got)[:10]
    extra = list(got - want)[:10]
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f} got={len(got)} want={len(want)}\n"
        f"missing={missing}\nextra={extra}"
    )


def test_partition_invariance(spark):
    """Triple set must not depend on input partitioning (SURVEY.md §5.3)."""
    tdf = transcripts_df(spark, n_convs=12, seed=3)
    t2 = {
        (r.subj, r.pred, r.obj)
        for r in build_kg(tdf.repartition(2)).triples.collect()
    }
    t16 = {
        (r.subj, r.pred, r.obj)
        for r in build_kg(tdf.repartition(16)).triples.collect()
    }
    assert t2 == t16 and len(t2) > 0


def test_per_turn_text_equality(spark):
    """input_hint invariant: reassembly preserves each turn's text verbatim
    in stable turn order."""
    pdf = make_transcripts(n_convs=8, seed=11)
    tdf = transcripts_df(spark, n_convs=8, seed=11)
    from agraph_spark.operators.reassemble import reassemble_conversations

    docs = {r.conv_id: r.text for r in reassemble_conversations(tdf).collect()}
    for conv_id, grp in pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        expected = TURN_SEPARATOR.join(grp["text"].tolist())
        assert docs[conv_id] == expected, conv_id
