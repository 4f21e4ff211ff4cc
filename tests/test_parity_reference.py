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


def test_grouped_null_turn_parity(spark):
    """ADVICE r3: the grouped kernel must match reassemble_conversations on
    NULLABLE turns — concat_ws SKIPS null texts (no separator emitted) and
    array_sort orders null struct fields FIRST (pandas default is NaN-last).
    c1 exercises the null-text skip, c2 the null-ts NULLS FIRST tiebreak."""
    import datetime as dt

    from agraph_spark.operators.fused import extract_documents_fused_grouped
    from agraph_spark.operators.reassemble import reassemble_conversations
    from agraph_spark.schemas import TRANSCRIPTS

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        ("c1", 0, "user", "Alice works at Acme.", None, t0),
        ("c1", 1, "assistant", None, None, t0),
        ("c1", 2, "user", "Bob lives in Paris.", None, t0),
        ("c2", 0, "user", "late-null-ts sorts first", None, None),
        ("c2", 0, "assistant", "early-real-ts sorts second", None, t0),
        ("c3", 0, "user", None, None, None),
    ]
    tdf = spark.createDataFrame(rows, TRANSCRIPTS).repartition(4)

    want = {r.conv_id: r.text for r in reassemble_conversations(tdf).collect()}
    got = {r.conv_id: r.text for r in extract_documents_fused_grouped(tdf).collect()}
    assert got == want
    assert want["c1"] == "Alice works at Acme.\nBob lives in Paris."
    assert want["c2"] == "late-null-ts sorts first\nearly-real-ts sorts second"

    fused = {
        (r.subj, r.pred, r.obj) for r in build_kg(tdf, mode="fused").triples.collect()
    }
    grouped = {
        (r.subj, r.pred, r.obj) for r in build_kg(tdf, mode="grouped").triples.collect()
    }
    assert fused == grouped


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
