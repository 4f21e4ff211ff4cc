"""Chunking (SURVEY.md §2.2, C1-C4) — fully JVM-side, no UDF.

The reference TokenChunker (/root/reference/agraph/chunker.py:63-234)
recursively splits on separators to <= chunk_size tiktoken tokens with
overlap; SimpleTokenChunker (chunker.py:287-360) approximates 1 token ~
0.75 words. tiktoken is not available here, so the engine implements the
word-approximation semantics (C2): fixed-size sliding word windows with
overlap, expressed as sequence/transform/slice column operations that stay
inside whole-stage codegen — at 100 TB the chunker is a pure map stage with
zero Python and zero shuffle.

Chunk typing follows LLMGraphUtils.create_text_chunks
(llm_builders.py:720-768): a document that fits one window is a single
"document" chunk; larger ones become "chunk" rows with start/end word
offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 512  # tokens (config.py:122-127 settings default)
DEFAULT_OVERLAP = 100
WORDS_PER_TOKEN = 0.75  # chunker.py:299 approximation


def chunk_documents(
    documents: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """(conv_id, text) -> chunk rows (chunk_id, conv_id, chunk_idx, content,
    chunk_type, start_index, end_index, token_count).

    Window size in words = chunk_size * 0.75; stride = size - overlap*0.75.
    """
    size_w = max(1, int(chunk_size * WORDS_PER_TOKEN))
    step_w = max(1, size_w - int(overlap * WORDS_PER_TOKEN))

    from .textstats import pystrip

    stripped = pystrip(F.col("text"))
    words = F.split(stripped, r"(?U)\s+")
    n_words = F.when(F.length(stripped) == 0, 0).otherwise(F.size(words))
    n_chunks = F.when(n_words <= size_w, F.lit(1)).otherwise(
        F.ceil((n_words - size_w) / F.lit(step_w)) + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(words, i * step_w + 1, size_w)).alias("content"),
            (i * step_w).cast("int").alias("start_index"),
            F.least(i * step_w + size_w, n_words).cast("int").alias("end_index"),
            F.size(F.slice(words, i * step_w + 1, size_w)).alias("n_chunk_words"),
        ),
    )
    out = (
        documents.where(n_words > 0)
        .select("conv_id", n_chunks.alias("n_chunks"), F.explode(chunks).alias("c"))
        .select(
            F.md5(F.concat_ws("|", "conv_id", F.col("c.chunk_idx"))).alias("chunk_id"),
            "conv_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.content").alias("content"),
            F.when(F.col("n_chunks") == 1, "document").otherwise("chunk").alias("chunk_type"),
            F.col("c.start_index").alias("start_index"),
            F.col("c.end_index").alias("end_index"),
            F.ceil(F.col("c.n_chunk_words") / WORDS_PER_TOKEN).cast("int").alias("token_count"),
        )
    )
    return out


def link_chunks_to_entities(chunks: DataFrame, entities: DataFrame) -> DataFrame:
    """G3: chunk links to an entity when the entity name (or alias) is a
    substring of lower(content) (llm_builders.py:770-812). Per-conversation
    equi-join + containment predicate."""
    return (
        chunks.select("chunk_id", "conv_id", F.lower(F.col("content")).alias("content_l"))
        .join(entities.select("conv_id", "name_norm"), "conv_id")
        .where(F.instr(F.col("content_l"), F.col("name_norm")) > 0)
        .select("chunk_id", "conv_id", "name_norm")
    )


def link_chunks_to_relations(chunk_entity_links: DataFrame, triples: DataFrame) -> DataFrame:
    """G3 relation side: chunk links to a relation when BOTH endpoint names
    are contained in the chunk (llm_builders.py:795-806) — two semi-joins
    against the chunk-entity link table."""
    heads = chunk_entity_links.select("chunk_id", F.col("name_norm").alias("subj"))
    tails = chunk_entity_links.select("chunk_id", F.col("name_norm").alias("obj"))
    return (
        triples.select("conv_id", "subj", "pred", "obj")
        .join(heads, "subj")
        .join(tails, ["chunk_id", "obj"])
        .select("chunk_id", "conv_id", "subj", "pred", "obj")
    )
