"""End-to-end KG construction pipeline: transcripts -> triples/entities/docs.

Mirrors the reference flagship path ``builder.build_graph(texts)``
(/root/reference/agraph/builders/llm_builders.py:1035-1097) restated as one
declarative DataFrame plan (SURVEY.md §3.1):

  transcripts --window reassemble--> documents --mapInPandas--> mentions
  --column exprs--> scored entities --joins--> relations --filter--> triples

Every stage is a DataFrame; Catalyst handles pushdown/pruning, AQE handles
skew. The only Python code runs vectorized per Arrow batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.extraction import extract_entities
from .operators.reassemble import reassemble_conversations
from .operators.relations import extract_relations, to_triples


@dataclass
class KGBuild:
    documents: DataFrame
    entities: DataFrame
    relations: DataFrame
    triples: DataFrame


def build_kg(transcripts: DataFrame, cache_documents: bool = True) -> KGBuild:
    """Run the deterministic extraction pipeline over a transcripts table.

    ``documents`` and ``entities`` feed two downstream consumers each
    (pattern relations + co-occurrence), so they are cached to avoid
    recomputing the extraction kernels.
    """
    documents = reassemble_conversations(transcripts)
    if cache_documents:
        documents = documents.persist()
    entities = extract_entities(documents)
    if cache_documents:
        entities = entities.persist()
    relations = extract_relations(documents, entities)
    triples = to_triples(relations)
    return KGBuild(documents, entities, relations, triples)


def build_triples_from_texts(documents: DataFrame) -> DataFrame:
    """Same pipeline for inputs that are already one-document-per-row
    (e.g. the driver's ``documents`` parquet): expects (conv_id, text)."""
    documents = documents.persist()
    entities = extract_entities(documents).persist()
    relations = extract_relations(documents, entities)
    return to_triples(relations)
