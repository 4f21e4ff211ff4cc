"""Derived-edge generators (SURVEY.md §2.4, I1-I4).

Reference: BaseRelationExtractor.infer_implicit_relations
(/root/reference/agraph/extractors/relation_extractor.py:80-282) and
Relation.reverse (agraph/relations.py:127-162). All are single self-joins /
projections — no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# relations.py:146-162 — types not in the map reverse to themselves
REVERSE_TYPE_MAP = {
    "contains": "belongs_to",
    "belongs_to": "contains",
    "references": "references",
    "similar_to": "similar_to",
    "synonyms": "synonyms",
}

SYMMETRIC_TYPES = ["similar_to", "synonyms"]  # relation_extractor.py:195


def transitive_contains(edges: DataFrame) -> DataFrame:
    """I1: A contains B, B contains C => A contains C, conf = min * 0.8
    (relation_extractor.py:147-181). One self-join on the shared node."""
    c = edges.where(F.col("pred") == "contains")
    r1 = c.alias("r1")
    r2 = c.alias("r2")
    return (
        r1.join(r2, F.col("r1.tail_id") == F.col("r2.head_id"))
        .select(
            F.col("r1.head_id").alias("head_id"),
            F.col("r2.tail_id").alias("tail_id"),
            F.lit("contains").alias("pred"),
            F.round(
                F.least(F.col("r1.confidence"), F.col("r2.confidence")) * 0.8, 9
            ).alias("confidence"),
            F.lit("transitive_inference").alias("source"),
        )
    )


def symmetric_closure(edges: DataFrame) -> DataFrame:
    """I2: reversed edge for similar_to/synonyms, conf * 0.9
    (relation_extractor.py:183-210)."""
    return edges.where(F.col("pred").isin(SYMMETRIC_TYPES)).select(
        F.col("tail_id").alias("head_id"),
        F.col("head_id").alias("tail_id"),
        "pred",
        F.round(F.col("confidence") * 0.9, 9).alias("confidence"),
        F.lit("symmetric_inference").alias("source"),
    )


def reverse_edges(edges: DataFrame) -> DataFrame:
    """I4: swap head/tail applying the reverse-type map
    (relations.py:127-162); unmapped types keep their type."""
    mapping = F.create_map(
        *[F.lit(x) for kv in REVERSE_TYPE_MAP.items() for x in kv]
    )
    return edges.select(
        F.col("tail_id").alias("head_id"),
        F.col("head_id").alias("tail_id"),
        F.coalesce(mapping[F.col("pred")], F.col("pred")).alias("pred"),
        "confidence",
    )


def hierarchical_inference(nodes: DataFrame) -> DataFrame:
    """I3: type-hierarchy pairs where lower(parent.name) is contained in
    lower(child.name) => CONTAINS conf 0.6 (relation_extractor.py:212-282).

    Join is blocked by the type-pair whitelist (tiny broadcast side of
    allowed pairs), then a containment predicate — never all-pairs across
    unrelated types."""
    hierarchy = [
        ("database", "table"),
        ("table", "column"),
        ("organization", "person"),
        ("document", "concept"),
        ("document", "keyword"),
    ]
    spark = nodes.sparkSession
    from ..session import local_df

    hdf = local_df(spark, hierarchy, "parent_type string, child_type string")
    p = nodes.select(
        F.col("entity_id").alias("parent_id"),
        F.lower(F.col("name")).alias("parent_name"),
        F.col("entity_type").alias("parent_type"),
    )
    c = nodes.select(
        F.col("entity_id").alias("child_id"),
        F.lower(F.col("name")).alias("child_name"),
        F.col("entity_type").alias("child_type"),
    )
    return (
        p.join(F.broadcast(hdf), "parent_type")
        .join(c, "child_type")
        .where(
            (F.col("parent_id") != F.col("child_id"))
            & (F.instr(F.col("child_name"), F.col("parent_name")) > 0)
        )
        .select(
            F.col("parent_id").alias("head_id"),
            F.col("child_id").alias("tail_id"),
            F.lit("contains").alias("pred"),
            F.lit(0.6).alias("confidence"),
            F.lit("hierarchical_inference").alias("source"),
        )
    )
