"""Plan-shape regression suite (round 6): pin the load-bearing physical-plan
facts the optimization round established, so refactors can't silently
regress them between rounds. These assert plan STRUCTURE, not timings —
each fact corresponds to a measured win documented in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def entrymod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_plans", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_no_cartesian_product_in_bench_queries(spark, entrymod):
    """No bench-suite query may plan a CartesianProduct (the broadcast
    1-row query vectors appear as BroadcastNestedLoopJoin, which is the
    intended shape for a 1-row side)."""
    qs = entrymod.queries()
    for name in ("g_degree", "g_components", "g_bfs", "dd_ngram_jaccard",
                 "dd_minhash", "v_cosine", "ev_sessionize", "tpch_q1"):
        assert "CartesianProduct" not in plan_of(qs[name](spark, SF)), name


def test_tpch_q1_pushdown_and_pruning(spark, entrymod):
    """Predicate pushdown and column pruning must reach the parquet scan
    (guide §6)."""
    p = plan_of(entrymod.queries()["tpch_q1"](spark, SF))
    assert "l_shipdate" in p.split("PushedFilters:")[1].splitlines()[0]
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_orderkey" not in read


def test_g_degree_bucketed_out_degree_is_exchange_free(spark, entrymod):
    """The out-degree aggregation runs on the bucketed edge store WITHOUT
    an exchange between partial and final agg (the store's whole point);
    the scan says Bucketed: true."""
    p = plan_of(entrymod.queries()["g_degree"](spark, SF))
    assert "Bucketed: true" in p
    # head_id-keyed agg: no Exchange between the two HashAggregates over
    # the bucketed scan. The tail_id agg pays its one necessary exchange,
    # so the plan as a whole has EXACTLY one non-broadcast Exchange.
    tree = p.split("\n\n")[0]
    n_plain_exchange = tree.count("+- Exchange")
    assert n_plain_exchange == 1, tree


def test_graph_mirrors_return_arrow_local_tables(spark, entrymod):
    """The small-graph driver mirrors must return Arrow-backed local
    tables (LocalTableScan), not the pickled-list python-conversion RDD
    (Scan ExistingRDD / applySchemaToPythonRDD) whose python tasks are
    exposed to worker stalls (OPTIMIZATION_r06.md §2)."""
    qs = entrymod.queries()
    p_bfs = plan_of(qs["g_bfs"](spark, SF))
    assert "LocalTableScan" in p_bfs and "applySchemaToPythonRDD" not in p_bfs
    p_cc = plan_of(qs["g_components"](spark, SF))
    assert "LocalTableScan" in p_cc and "applySchemaToPythonRDD" not in p_cc


def test_lsh_join_input_is_slim_and_cached(spark):
    """The distributed LSH candidate join must consume a PERSISTED feature
    table projected to exactly the join's columns — padded/grams must not
    flow into the self-join (they doubled the pair-distinct exchange)."""
    from agraph_spark.caching import release_caches
    from agraph_spark.operators.linking import lsh_candidate_pairs

    nodes = spark.createDataFrame(
        [(f"e{i}", f"name {i}", f"name {i}", "t", 0.9) for i in range(30)],
        "entity_id string, name string, name_norm string, entity_type string,"
        " confidence double")
    p = plan_of(lsh_candidate_pairs(nodes, small_universe_threshold=None))
    release_caches(spark)
    assert "InMemoryRelation" in p  # cached: both sides scan one build
    tree = p.split("\n\n")[0]
    assert "padded" not in tree and "grams" not in tree.split("InMemoryRelation")[0]


def test_broadcast_on_small_side_of_alias_join(spark):
    """alias_link's dictionary side must stay broadcast."""
    from agraph_spark.operators.linking import alias_link

    nodes = spark.createDataFrame(
        [("e1", "Acme", "acme", "organization", 0.9)],
        "entity_id string, name string, name_norm string, entity_type string,"
        " confidence double")
    alias = spark.createDataFrame(
        [("acme", "acme corp", "organization")],
        "alias string, canonical_name string, entity_type string")
    assert "BroadcastHashJoin" in plan_of(alias_link(nodes, alias))


def test_plan_shape_suite_detects_regressions(spark, entrymod):
    """The suite must actually FAIL on an injected regression: a
    plain-list createDataFrame result (the python-conversion RDD shape)
    must be distinguishable from the Arrow shape the mirrors assert."""
    plain = spark.createDataFrame([("x", 1)], "entity_id string, dist int")
    p = plan_of(plain)
    assert "LocalTableScan" not in p  # the injected bad shape
    import pandas as pd

    arrow = spark.createDataFrame(pd.DataFrame([("x", 1)],
                                               columns=["entity_id", "dist"]))
    assert "LocalTableScan" in plan_of(arrow)


def test_empty_mirror_results_stay_on_local_table_scan(spark):
    """session.local_df must keep EMPTY driver-mirror results on the
    LocalTableScan path: PySpark silently routes an empty pandas input to
    the pickled-RDD fallback (Scan ExistingRDD), whose python conversion
    tasks re-expose the worker-stall class — measured 3.8 s PER downstream
    action on q_d7_chain's zero-pair LSH leg (OPTIMIZATION_r06.md, round
    6b)."""
    from agraph_spark.session import local_df

    empty = local_df(spark, [], "id_a string, lsh_distance double")
    p = plan_of(empty)
    assert "LocalTableScan" in p and "ExistingRDD" not in p
    assert empty.count() == 0
    # array-typed empties (the path-query mirrors) must convert too
    empty_paths = local_df(spark, [], "path array<string>, depth int")
    assert "LocalTableScan" in plan_of(empty_paths)
    assert empty_paths.schema.simpleString() == "struct<path:array<string>,depth:int>"
    # non-empty stays on the Arrow local path with values intact
    one = local_df(spark, [(["a", "b"], 1)], "path array<string>, depth int")
    assert "LocalTableScan" in plan_of(one)
    assert one.collect()[0].path == ["a", "b"]


def test_zero_pair_lsh_mirror_is_local_and_cheap(spark):
    """The LSH driver cutover with ZERO surviving pairs (the d7_chain
    corpus shape: mutually distant names) must produce an empty
    LocalTableScan, not an empty python-conversion RDD."""
    from agraph_spark.caching import release_caches
    from agraph_spark.operators.linking import lsh_candidate_pairs

    import hashlib

    names = [hashlib.md5(str(i).encode()).hexdigest() for i in range(8)]
    nodes = spark.createDataFrame(
        [(f"e{i}", n, n, "t", 0.9) for i, n in enumerate(names)],
        "entity_id string, name string, name_norm string, entity_type string,"
        " confidence double")
    out = lsh_candidate_pairs(nodes)
    p = plan_of(out)
    release_caches(spark)
    assert out.count() == 0
    assert "LocalTableScan" in p and "ExistingRDD" not in p
