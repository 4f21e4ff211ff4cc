"""Fused per-document extraction kernel: E1 + E2 + E3 + D1 in ONE
mapInPandas pass.

Why fused: mention detection, confidence scoring, keyword extraction and
first-seen-wins dedup are all strictly per-conversation — expressing them
as global shuffles (explode -> groupBy -> window) moves ~10x the input
volume through the shuffle for work that never crosses a document boundary.
At 10^12-turn scale that shuffle volume is the bottleneck; in the kernel the
intermediates never leave the task. Only genuinely cross-row operators
(endpoint resolution joins, sentence co-occurrence self-join, global triple
dedup, entity linking, connected components) remain Spark-side.

Everything inside is vectorized pandas (str.extractall per pattern per
batch, groupby aggregations) — no per-row Python. Semantics are identical
to the modular operators in extraction.py (same reference citations);
tests/test_parity_reference.py holds both paths to exact reference parity.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import patterns as P
from ..schemas import ENTITIES

_ENT_COLS = ["conv_id", "name", "name_norm", "entity_type", "confidence", "entity_order"]


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "name": pd.Series(dtype=object),
            "name_norm": pd.Series(dtype=object),
            "entity_type": pd.Series(dtype=object),
            "confidence": pd.Series(dtype=float),
            "entity_order": pd.Series(dtype="int64"),
        }
    )


def _mentions_frame(texts: pd.Series, conv: pd.Series) -> pd.DataFrame:
    """E1: all pattern mentions with emission-order seq
    (entity_extractor.py:202-240)."""
    outs = []
    for ti, etype, pi, rx in P.compiled_entity_patterns():
        m = texts.str.extractall(rx)
        if m.empty:
            continue
        names = m[0].str.strip()
        keep = names.str.len() >= 2
        if not keep.any():
            continue
        names = names[keep]
        idx = names.index
        base = (ti * 100 + pi) * 1_000_000
        outs.append(
            pd.DataFrame(
                {
                    "conv_id": conv.loc[idx.get_level_values(0)].to_numpy(),
                    "name": names.to_numpy(),
                    "entity_type": etype,
                    "seq": base + idx.get_level_values(1).to_numpy(),
                }
            )
        )
    if not outs:
        return pd.DataFrame(columns=["conv_id", "name", "entity_type", "seq"])
    return pd.concat(outs, ignore_index=True)


def _confidence(names: pd.Series) -> pd.Series:
    """E2 vectorized (entity_extractor.py:127-154); str[0].str.isupper()
    matches Python's isupper exactly."""
    conf = (
        0.5
        + (names.str.len() > 1) * 0.1
        + (names.str.len() > 3) * 0.1
        + names.str[0].str.isupper().fillna(False).astype(float) * 0.1
        - names.str.lower().isin(P.STOPWORDS) * 0.3
    )
    return conf.clip(0.0, 1.0)


def _keywords_frame(texts: pd.Series, conv: pd.Series) -> pd.DataFrame:
    """E3 vectorized: freq>=2 non-stopword words, top-10 by first occurrence
    (entity_extractor.py:328-351)."""
    w = texts.str.lower().str.extractall(P._KEYWORD_RX)
    if w.empty:
        return pd.DataFrame(columns=["conv_id", "name", "entity_type", "seq", "confidence"])
    words = w[0]
    words = words[~words.isin(P.STOPWORDS)]
    if words.empty:
        return pd.DataFrame(columns=["conv_id", "name", "entity_type", "seq", "confidence"])
    df = pd.DataFrame(
        {
            "row": words.index.get_level_values(0),
            "pos": words.index.get_level_values(1),
            "word": words.to_numpy(),
        }
    )
    g = df.groupby(["row", "word"], sort=False).agg(
        cnt=("pos", "size"), first_pos=("pos", "min")
    )
    g = g[g["cnt"] >= P.KEYWORD_MIN_FREQ].reset_index()
    g = g.sort_values(["row", "first_pos"], kind="stable")
    g["rk"] = g.groupby("row").cumcount() + 1
    g = g[g["rk"] <= P.KEYWORD_TOP_K]
    return pd.DataFrame(
        {
            "conv_id": conv.loc[g["row"]].to_numpy(),
            "name": g["word"].to_numpy(),
            "entity_type": "concept",
            "seq": P.KEYWORD_SEQ_BASE + g["rk"].to_numpy(),
            "confidence": P.KEYWORD_CONFIDENCE,
        }
    )


def extract_entities_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One batch: documents(conv_id, text) -> deduplicated entities."""
    if len(pdf) == 0:
        return _empty()
    texts = pdf["text"].fillna("")
    conv = pdf["conv_id"]

    m = _mentions_frame(texts, conv)
    if len(m):
        m["confidence"] = _confidence(m["name"])
        m = m[m["confidence"] >= P.CONFIDENCE_THRESHOLD]
    else:
        m = m.assign(confidence=pd.Series(dtype=float))
    k = _keywords_frame(texts, conv)
    allm = pd.concat([m, k], ignore_index=True) if len(k) else m
    if not len(allm):
        return _empty()

    # D1 first-seen-wins (entity_extractor.py:93-125): sort by emission
    # order; first row per (conv, lower(name)) keeps name/type; conf = max.
    allm["name_norm"] = allm["name"].str.lower()
    allm = allm.sort_values("seq", kind="stable")
    g = allm.groupby(["conv_id", "name_norm"], sort=False)
    out = g.agg(
        name=("name", "first"),
        entity_type=("entity_type", "first"),
        confidence=("confidence", "max"),
        entity_order=("seq", "min"),
    ).reset_index()
    return out[_ENT_COLS]


def _entities_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = extract_entities_batch(pdf)
        if len(out):
            yield out


def extract_entities_fused(documents: DataFrame) -> DataFrame:
    """(conv_id, text) -> per-conversation entity set, one kernel pass."""
    return documents.select("conv_id", "text").mapInPandas(
        _entities_kernel, schema=ENTITIES
    )


# --------------------------------------------------------------------------
# Document-extract kernel: one pass emitting per-conversation ARRAYS so the
# downstream relation operators run as codegen array expressions with NO
# joins and NO shuffles (see relations_fused.py). The entire per-document
# dataflow is then: reassemble shuffle -> this kernel -> narrow array ops ->
# global triple dedup shuffle. Two shuffles end-to-end.
# --------------------------------------------------------------------------

_DOC_EXTRACT_SCHEMA = (
    "conv_id string, text string, "
    "ents array<struct<entity_order:bigint, name_norm:string, name:string, "
    "entity_type:string, confidence:double>>, "
    "cands array<struct<pred:string, head_text:string, tail_text:string>>, "
    "cand_texts array<string>"
)


def _candidates_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """E5 per-line anchored extraction (same as relations._candidates_kernel,
    sans Spark plumbing): (row, pred, head_text, tail_text)."""
    lines = pdf["text"].fillna("").str.split("\n").explode()
    rows = lines.index
    lines = lines.fillna("").reset_index(drop=True)
    row_of_line = pd.Series(rows, index=lines.index)
    outs = []
    for pred, rx, anchor in P.compiled_relation_patterns():
        mask = lines.str.contains(anchor, regex=True, na=False)
        if not mask.any():
            continue
        m = lines[mask].str.extractall(rx)
        if m.empty:
            continue
        outs.append(
            pd.DataFrame(
                {
                    "row": row_of_line.loc[m.index.get_level_values(0)].to_numpy(),
                    "pred": pred,
                    "head_text": m[0].str.strip().str.lower().to_numpy(),
                    "tail_text": m[1].str.strip().str.lower().to_numpy(),
                }
            )
        )
    if not outs:
        return pd.DataFrame(columns=["row", "pred", "head_text", "tail_text"])
    return pd.concat(outs, ignore_index=True).drop_duplicates()


def _doc_extract_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        pdf = pdf.reset_index(drop=True)
        ents = extract_entities_batch(pdf)
        # entity arrays sorted by emission order (dict-insertion order of the
        # reference dedup) — downstream "first match wins" = first array hit
        ents = ents.sort_values(["conv_id", "entity_order"], kind="stable")
        conv_to_row = pd.Series(pdf.index, index=pdf["conv_id"])
        ents["row"] = conv_to_row.loc[ents["conv_id"]].to_numpy()
        ent_records = pd.Series(
            ents[["entity_order", "name_norm", "name", "entity_type", "confidence"]]
            .to_dict("records"),
            index=ents["row"],
        )
        ents_by_row = ent_records.groupby(level=0).agg(list)

        cands = _candidates_batch(pdf)
        if len(cands):
            cand_records = pd.Series(
                cands[["pred", "head_text", "tail_text"]].to_dict("records"),
                index=cands["row"],
            )
            cands_by_row = cand_records.groupby(level=0).agg(list)
            texts = pd.concat(
                [
                    cands[["row", "head_text"]].rename(columns={"head_text": "t"}),
                    cands[["row", "tail_text"]].rename(columns={"tail_text": "t"}),
                ]
            ).drop_duplicates()
            texts_by_row = texts.groupby("row")["t"].agg(list)
        else:
            cands_by_row = pd.Series(dtype=object)
            texts_by_row = pd.Series(dtype=object)

        out = pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "text": pdf["text"].fillna(""),
                "ents": ents_by_row.reindex(pdf.index).apply(
                    lambda v: v if isinstance(v, list) else []
                ),
                "cands": cands_by_row.reindex(pdf.index).apply(
                    lambda v: v if isinstance(v, list) else []
                ),
                "cand_texts": texts_by_row.reindex(pdf.index).apply(
                    lambda v: v if isinstance(v, list) else []
                ),
            }
        )
        yield out


def extract_documents_fused(documents: DataFrame) -> DataFrame:
    """(conv_id, text) -> (conv_id, text, ents[], cands[], cand_texts[]):
    the single-pass extraction surface consumed by relations_fused."""
    return documents.select("conv_id", "text").mapInPandas(
        _doc_extract_kernel, schema=_DOC_EXTRACT_SCHEMA
    )


def _grouped_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas body for one conv_id hash bucket: pandas reassembly
    (same (turn_idx, ts, text) struct order as reassemble_conversations'
    array_sort) followed by the extraction batch — raw turns reach Python
    once and the per-document intermediates never exist JVM-side."""
    # Null semantics must match reassemble_conversations exactly:
    # array_sort compares struct fields NULLS FIRST (pandas default is
    # NaN-last), and concat_ws SKIPS null elements (no separator emitted),
    # so null-text turns contribute nothing — dropna, never fillna("").
    # Spark's groupBy also keeps a null conv_id group (dropna=False).
    pdf = pdf.sort_values(
        ["conv_id", "turn_idx", "ts", "text"], kind="stable", na_position="first"
    )
    docs = (
        pdf.groupby("conv_id", sort=False, dropna=False)["text"]
        .agg(lambda s: "\n".join(s.dropna()))
        .reset_index()
    )
    out = next(iter(_doc_extract_kernel(iter([docs]))), None)
    if out is None:
        out = pd.DataFrame(columns=["conv_id", "text", "ents", "cands", "cand_texts"])
    return out


def extract_documents_fused_grouped(
    transcripts: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """Reassembly + extraction fused into ONE exchange: shuffle raw turns on
    a conv_id hash bucket, then a single applyInPandas does pandas
    reassembly and extraction per bucket.

    Candidate alternative to reassemble_conversations -> mapInPandas (which
    pays a JVM collect_list/array_sort/concat_ws aggregation before the
    Arrow transfer). Grouping by pmod(xxhash64(conv_id), n_buckets) rather
    than conv_id keeps applyInPandas calls to one per TASK-sized bucket
    instead of one tiny pandas frame per conversation. Exact-parity-tested
    against the default path; see PLANS.md for the measured comparison."""
    spark = transcripts.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucketed = transcripts.select("conv_id", "turn_idx", "ts", "text").withColumn(
        "_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )
    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(
            lambda _key, pdf: _grouped_kernel(pdf), schema=_DOC_EXTRACT_SCHEMA
        )
    )
