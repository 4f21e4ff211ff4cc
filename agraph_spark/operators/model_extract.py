"""Model-backed (LLM-path) extraction: E4 entities + E8 relations through a
pluggable BATCHED inference interface.

north_star requirement: "model inference batched per Arrow record-batch,
never per-row Python". The contract here is exactly that: a BatchedModel is
called ONCE per Arrow batch with a pandas Series of prompts/texts and
returns a Series of JSON responses (the reference calls OpenAI once per
text under an asyncio semaphore, llm_builders.py:207-296; the Spark
restatement turns concurrency into executor parallelism and the unit of
invocation into the record batch).

JSON parsing happens Spark-side with ``from_json`` (schema-checked, JVM),
reproducing the reference's response shapes
(llm_entity_extractor.py:154-186: {"entities": [{name, type, description,
aliases}]}; llm_relation_extractor.py:138-171: {"relations": [{head_entity,
tail_entity, relation_type, confidence}]}). Type normalization reproduces
the reference tables (llm_entity_extractor.py:297-344,
llm_relation_extractor.py:205-260). Ids are content hashes
("entity_" + md5(name)[:8], llm_entity_extractor.py:346-350).

The default model is a deterministic seeded stub (same text -> same JSON,
any partitioning) so tests and parity runs need no network; a real endpoint
drops in by swapping the callable.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BatchedModel = Callable[[pd.Series], pd.Series]

# ------------------------------------------------------------- stub model

_CAP_RX = re.compile(r"(\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b)")


def stub_entity_model(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for the E4 LLM: multi-word capitalized spans
    become PERSON/ORGANIZATION entities (suffix heuristic). Vectorized:
    one extractall per batch."""
    m = texts.str.extractall(_CAP_RX)
    per_row: dict[int, list[dict]] = {}
    if not m.empty:
        names = m[0]
        is_org = names.str.endswith(("Corp", "Inc", "Ltd", "Company", "Organization"))
        frame = pd.DataFrame(
            {
                "row": names.index.get_level_values(0),
                "name": names.to_numpy(),
                "type": is_org.map({True: "ORG", False: "PERSON"}).to_numpy(),
            }
        ).drop_duplicates(["row", "name"])
        for row, grp in frame.groupby("row"):
            per_row[row] = [
                {"name": n, "type": t, "description": "", "aliases": []}
                for n, t in zip(grp["name"], grp["type"])
            ]
    return pd.Series(
        [json.dumps({"entities": per_row.get(i, [])}) for i in texts.index],
        index=texts.index,
    )


def stub_relation_model(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for the E8 LLM: 'X works for Y' shapes become
    WORKS_FOR relations (the stub exercises normalization: WORKS_FOR and
    EMPLOYED_BY map to works_for)."""
    rx = re.compile(r"([A-Z][a-z]+ [A-Z][a-z]+) works for ([A-Z][\w ]*?(?:Corp|Inc|Ltd))")
    m = texts.str.extractall(rx)
    per_row: dict[int, list[dict]] = {}
    if not m.empty:
        frame = pd.DataFrame(
            {
                "row": m.index.get_level_values(0),
                "h": m[0].to_numpy(),
                "t": m[1].to_numpy(),
            }
        ).drop_duplicates()
        for row, grp in frame.groupby("row"):
            per_row[row] = [
                {"head_entity": h, "tail_entity": t,
                 "relation_type": "EMPLOYED_BY", "confidence": 0.9}
                for h, t in zip(grp["h"], grp["t"])
            ]
    return pd.Series(
        [json.dumps({"relations": per_row.get(i, [])}) for i in texts.index],
        index=texts.index,
    )


# -------------------------------------------------------- batched kernels

def _infer_kernel(model: BatchedModel, out_col: str):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            resp = model(pdf["text"].fillna(""))  # ONE call per Arrow batch
            yield pd.DataFrame({"conv_id": pdf["conv_id"], out_col: resp})

    return kernel


_ENTITY_RESP = T.StructType(
    [
        T.StructField(
            "entities",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("description", T.StringType()),
                        T.StructField("aliases", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        )
    ]
)

_RELATION_RESP = T.StructType(
    [
        T.StructField(
            "relations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("head_entity", T.StringType()),
                        T.StructField("tail_entity", T.StringType()),
                        T.StructField("relation_type", T.StringType()),
                        T.StructField("confidence", T.DoubleType()),
                    ]
                )
            ),
        )
    ]
)

# llm_entity_extractor.py:297-344 (variations only; exact enum values pass
# through via the lowercase fallback)
ENTITY_TYPE_SYNONYMS = {
    "PEOPLE": "person", "ORG": "organization", "COMPANY": "organization",
    "PLACE": "location", "MISC": "other",
}
# llm_relation_extractor.py:205-260 variations
RELATION_TYPE_SYNONYMS = {
    "HAS": "contains", "INCLUDES": "contains", "MEMBER_OF": "belongs_to",
    "EMPLOYED_BY": "works_for", "BASED_IN": "located_in",
    "SAME_AS": "similar_to", "ASSOCIATED_WITH": "related_to",
}

_ENTITY_ENUM = ["person", "organization", "location", "concept", "event", "other",
                "table", "column", "database", "document", "keyword", "product",
                "software", "unknown"]
_RELATION_ENUM = ["contains", "belongs_to", "located_in", "works_for", "causes",
                  "part_of", "is_a", "references", "similar_to", "related_to",
                  "depends_on", "foreign_key", "mentions", "describes", "synonyms",
                  "develops", "creates", "founded_by", "other"]


def _normalize_type_col(col: F.Column, synonyms: dict[str, str], enum: list[str], fallback: str) -> F.Column:
    up = F.upper(F.trim(col))
    syn = F.create_map(*[F.lit(x) for kv in synonyms.items() for x in kv])
    direct = syn[up]
    enum_hit = F.when(F.lower(up).isin(enum), F.lower(up))
    return F.coalesce(direct, enum_hit, F.lit(fallback))


def extract_entities_model(
    documents: DataFrame, model: BatchedModel = stub_entity_model
) -> DataFrame:
    """E4: batched inference -> from_json -> explode -> normalize types ->
    content-hash ids."""
    raw = documents.select("conv_id", "text").mapInPandas(
        _infer_kernel(model, "response"), schema="conv_id string, response string"
    )
    parsed = raw.select(
        "conv_id", F.from_json("response", _ENTITY_RESP).alias("r")
    ).select("conv_id", F.explode_outer("r.entities").alias("e")).where(
        F.col("e.name").isNotNull() & (F.length(F.trim("e.name")) >= 2)
    )
    return parsed.select(
        "conv_id",
        F.trim("e.name").alias("name"),
        F.lower(F.trim("e.name")).alias("name_norm"),
        _normalize_type_col(F.col("e.type"), ENTITY_TYPE_SYNONYMS, _ENTITY_ENUM, "unknown").alias("entity_type"),
        F.coalesce("e.description", F.lit("")).alias("description"),
        F.coalesce("e.aliases", F.array()).alias("aliases"),
        F.concat(F.lit("entity_"), F.substring(F.md5(F.trim("e.name")), 1, 8)).alias("entity_id"),
    ).dropDuplicates(["conv_id", "name_norm"])


def extract_relations_model(
    documents: DataFrame, model: BatchedModel = stub_relation_model
) -> DataFrame:
    """E8: batched inference -> from_json -> normalize relation types ->
    md5 triple ids (llm_relation_extractor.py:262-267)."""
    raw = documents.select("conv_id", "text").mapInPandas(
        _infer_kernel(model, "response"), schema="conv_id string, response string"
    )
    parsed = raw.select(
        "conv_id", F.from_json("response", _RELATION_RESP).alias("r")
    ).select("conv_id", F.explode_outer("r.relations").alias("rel")).where(
        F.col("rel.head_entity").isNotNull() & F.col("rel.tail_entity").isNotNull()
    )
    out = parsed.select(
        "conv_id",
        F.lower(F.trim("rel.head_entity")).alias("subj"),
        _normalize_type_col(F.col("rel.relation_type"), RELATION_TYPE_SYNONYMS, _RELATION_ENUM, "other").alias("pred"),
        F.lower(F.trim("rel.tail_entity")).alias("obj"),
        F.coalesce("rel.confidence", F.lit(0.5)).alias("conf"),
    ).where(F.col("subj") != F.col("obj"))
    return out.withColumn(
        "relation_id",
        F.concat(
            F.lit("relation_"),
            F.substring(F.md5(F.concat_ws("_", "subj", "pred", "obj")), 1, 8),
        ),
    ).dropDuplicates(["conv_id", "subj", "pred", "obj"])
