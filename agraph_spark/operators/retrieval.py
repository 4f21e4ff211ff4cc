"""Retrieval over the materialized graph (SURVEY.md §2.8 V5-V9).

Reference: KnowledgeRetriever (/root/reference/agraph/retrieval/
knowledge_retriever.py) runs three parallel brute-force vector searches
(entities/relations/chunks) and optionally expands to connected chunks.
Spark restatement: one scored scan per namespace (or a single union-table
pass), window top-k, and the expansion as a join over chunk link arrays.
The final RAG answer-generation call stays driver-side by design (single
query, network-bound) — out of engine scope (SURVEY.md V10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .vectors import cosine


def _scored(df: DataFrame, query: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.crossJoin(F.broadcast(query)).withColumn(
        "score",
        cosine(F.col(vec_col).cast("array<double>"), F.col("query_vec").cast("array<double>")),
    ).drop("query_vec")


def search_namespace(
    df: DataFrame, query: DataFrame, k: int, threshold: float, id_col: str
) -> DataFrame:
    """V4/V5: score-all, threshold, top-k with id tiebreak
    (vector_storage.py:310-332 + filter variants json_storage.py:716-748)."""
    return (
        _scored(df, query)
        .where(F.col("score") >= threshold)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def search_knowledge(
    nodes: DataFrame,
    edges_rendered: DataFrame,
    chunks: DataFrame,
    query: DataFrame,
    k: int = 10,
    threshold: float = 0.0,
) -> DataFrame:
    """V8: entity+relation+chunk retrieval as ONE union-table pass — each
    input carries (item_id, namespace, embedding); per-namespace top-k via a
    window (the reference's three asyncio-parallel scans,
    knowledge_retriever.py:264-313, become one scan of a union)."""
    from pyspark.sql import Window

    u = (
        nodes.select(F.col("entity_id").alias("item_id"), F.lit("entity").alias("namespace"), "embedding")
        .unionByName(edges_rendered.select(F.col("edge_id").alias("item_id"), F.lit("relation").alias("namespace"), "embedding"))
        .unionByName(chunks.select(F.col("chunk_id").alias("item_id"), F.lit("text_chunk").alias("namespace"), "embedding"))
    )
    scored = _scored(u, query).where(F.col("score") >= threshold)
    w = Window.partitionBy("namespace").orderBy(F.desc("score"), F.asc("item_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).drop("rk")


def hybrid_search_chunks(
    chunks: DataFrame,
    query_text: str,
    query: DataFrame,
    k: int = 10,
    text_weight: float = 0.3,
    vector_weight: float = 0.7,
) -> DataFrame:
    """V6 (json_storage.py:750-814): text score = 0.8 exact-substring /
    0.6 title hit / word-overlap ratio, combined with cosine at the
    normalized weights."""
    ql = query_text.lower()
    q_words = F.array(*[F.lit(w) for w in sorted(set(ql.split()))])
    content_l = F.lower(F.col("content"))
    overlap = F.size(F.array_intersect(F.split(content_l, r"\s+"), q_words)) / F.greatest(
        F.size(q_words), F.lit(1)
    )
    text_score = (
        F.when(F.instr(content_l, ql) > 0, 0.8)
        .when(F.instr(F.lower(F.coalesce(F.col("title"), F.lit(""))), ql) > 0, 0.6)
        .otherwise(overlap)
    )
    tw = text_weight / (text_weight + vector_weight)
    vw = vector_weight / (text_weight + vector_weight)
    return (
        _scored(chunks, query)
        .withColumn("text_score", text_score)
        .withColumn("hybrid_score", F.round(tw * text_score + vw * F.col("score"), 9))
        .orderBy(F.desc("hybrid_score"), F.asc("chunk_id"))
        .limit(k)
    )


def expand_connected_chunks(
    retrieved: DataFrame,
    chunk_entity_links: DataFrame,
    k_extra: int = 10,
) -> DataFrame:
    """V9 (knowledge_retriever.py:315-453): chunks linked to retrieved
    entities, relevance = connection-count-boosted mean of the retrieval
    scores of the entities linking to them."""
    hits = retrieved.where(F.col("namespace") == "entity").select(
        F.col("item_id").alias("entity_id"), "score"
    )
    linked = chunk_entity_links.select("chunk_id", "entity_id").join(hits, "entity_id")
    return (
        linked.groupBy("chunk_id")
        .agg(
            F.round(F.avg("score") * (1 + F.log1p(F.count("*")) / 10.0), 9).alias("relevance"),
            F.count("*").alias("n_connections"),
        )
        .orderBy(F.desc("relevance"), F.asc("chunk_id"))
        .limit(k_extra)
    )
