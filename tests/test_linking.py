"""Entity linking: LSH blocking recall, verification, canonicalization,
edge repoint, and the alias dictionary path."""

from __future__ import annotations

from pyspark.sql import functions as F

from agraph_spark.operators.linking import (
    alias_link,
    canonical_mapping,
    link_entities,
    lsh_candidate_pairs,
    merge_nodes,
    repoint_edges,
    score_candidates,
)


def _nodes(spark, rows):
    return spark.createDataFrame(
        [
            (f"e{i}", name, name.lower(), etype, 0.8, None, 1)
            for i, (name, etype) in enumerate(rows)
        ],
        "entity_id string, name string, name_norm string, entity_type string, "
        "confidence double, aliases array<string>, n_mentions long",
    )


def test_lsh_blocking_finds_near_duplicates(spark):
    nodes = _nodes(
        spark,
        [
            ("Acme Corp", "organization"),
            ("Acme Corp.", "organization"),
            ("Acme Corporation", "organization"),
            ("Globex Inc", "organization"),
            ("Paris", "location"),
            ("Paris City", "location"),
            ("zebra", "concept"),
        ],
    )
    pairs = lsh_candidate_pairs(nodes, max_jaccard_distance=0.7)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert ("e0", "e1") in got  # Acme Corp ~ Acme Corp.
    assert ("e0", "e2") in got  # Acme Corp ~ Acme Corporation
    # different types never pair
    assert all(not (a.startswith("e4") and b == "e6") for a, b in got)


def test_score_and_canonicalize(spark):
    nodes = _nodes(
        spark,
        [
            ("Acme Corp", "organization"),
            ("Acme Corp.", "organization"),
            ("Acme Corporation", "organization"),
            ("Globex Inc", "organization"),
        ],
    )
    mapping = link_entities(nodes)
    m = {r.entity_id: r.canonical_id for r in mapping.collect()}
    # transitive merge into one canonical id (min id = e0)
    assert m.get("e1") == "e0" and m.get("e2") == "e0"
    assert "e3" not in m  # Globex untouched


def test_repoint_and_merge(spark):
    nodes = _nodes(spark, [("A B", "concept"), ("A  B", "concept"), ("C", "concept")])
    mapping = spark.createDataFrame([("e1", "e0")], "entity_id string, canonical_id string")
    edges = spark.createDataFrame(
        [("x1", "e1", "e2", "related_to", 0.5), ("x2", "e2", "e1", "related_to", 0.5)],
        "edge_id string, head_id string, tail_id string, pred string, confidence double",
    )
    re = repoint_edges(edges, mapping).collect()
    assert {(r.head_id, r.tail_id) for r in re} == {("e0", "e2"), ("e2", "e0")}
    merged = merge_nodes(nodes, mapping)
    assert merged.count() == 2
    row = merged.where(F.col("entity_id") == "e0").first()
    assert row.n_mentions == 2


def test_alias_dict_path(spark):
    nodes = _nodes(spark, [("Big Blue", "organization"), ("IBM Corp", "organization")])
    alias = spark.createDataFrame(
        [("big blue", "ibm corp", "organization"), ("ibm corp", "ibm corp", "organization")],
        "alias string, canonical_name string, entity_type string",
    )
    hits = alias_link(nodes, alias)
    assert hits.count() == 2
    mapping = link_entities(nodes, alias_dict=alias)
    m = {r.entity_id: r.canonical_id for r in mapping.collect()}
    assert m.get("e1") == "e0"


def test_canonical_mapping_transitive_chain(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string"
    )
    m = {r.entity_id: r.canonical_id for r in canonical_mapping(pairs).collect()}
    assert m == {"b": "a", "c": "a", "d": "a", "y": "x"}


def test_linkable_universe_bound_is_visible(spark, caplog):
    """Entities with names beyond max_name_len/max_name_words are
    INTENTIONALLY never merge candidates (LSH bucket-flood guard); the
    exclusion is parameterized and logged, not silent."""
    import logging

    from agraph_spark.operators.linking import link_entities

    long_name = "the quick brown fox jumps over the lazy dog entirely"
    nodes = spark.createDataFrame(
        [("e1", "Acme Corp", "acme corp", "organization", 0.9),
         ("e2", "Acme Corp.", "acme corp.", "organization", 0.8),
         ("e3", long_name, long_name, "organization", 0.9),
         ("e4", long_name + " x", long_name + " x", "organization", 0.9)],
        "entity_id string, name string, name_norm string, entity_type string, confidence double")
    with caplog.at_level(logging.WARNING):
        mapping = link_entities(nodes, log_excluded=True)
        got = {(r.entity_id, r.canonical_id) for r in mapping.collect()}
    # short near-dup pair merges; the two long-named near-dups do NOT
    assert got == {("e2", "e1")}
    assert any("excluded from the linkable universe" in r.message for r in caplog.records)
    # widening the bound brings them back into scope
    wide = link_entities(nodes, max_name_len=64, max_name_words=12)
    got_wide = {(r.entity_id, r.canonical_id) for r in wide.collect()}
    assert ("e4", "e3") in got_wide
