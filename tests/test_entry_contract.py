"""Driver-contract smoke: entry() runs, and a representative subset of
queries() agrees with oracle_sql() via DuckDB at sf0.001 (the full sf0.01
sweep lives in tools/check_oracle.py and the driver itself)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, rows_to_multiset

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "g_degree",
    "g_components",
    "g_bfs",
    "g_transitive",
    "kg_keywords",
    "kg_cooccur",
    "txt_quality",
    "dd_ngram_jaccard",
    "v_cosine",
    "ev_sessionize",
    "ev_window",
    "tpch_q1",
    "tpch_join3",
    "dd_exact_dup",
    "d9_upsert",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"pred", "n_triples", "n_subjects"} == set(df.columns)


def test_queries_have_oracles_or_docstring():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_agreement(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entrymod.oracle_sql()[name])
    dcols, drows = rel.columns, rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    assert rows_to_multiset(scols, srows) == rows_to_multiset(dcols, drows)


def test_display_topk_knife_edge(spark):
    """r6c: the top-k cut must rank at DISPLAY precision with the id
    tie-break (the retrieval oracles' ORDER BY binds to the rounded output
    alias). Two scores that differ at full precision but tie at 3dp
    straddle the k boundary: the full-precision cut would keep 'z9'
    (higher raw score); the certified cut keeps 'a1' (smaller id)."""
    df = spark.createDataFrame(
        [("top", 0.9), ("z9", 0.4606), ("a1", 0.4605)],
        "vec_id string, score double",
    )
    got = [(r.vec_id, r.score) for r in entrymod._display_topk(df, 2).collect()]
    assert got == [("top", 0.9), ("a1", 0.461)]
