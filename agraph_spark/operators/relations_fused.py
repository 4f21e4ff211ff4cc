"""Relation extraction over the fused document-extract rows: E6 + E7 as
pure codegen array expressions — zero joins, zero shuffles.

Each input row carries everything its conversation needs (text, ordered
entity array, relation candidates, unique candidate texts), so:

- E7 endpoint resolution = a ``transform``/``filter`` scan of the entity
  array per candidate text (exact hit first, else first entity in emission
  order passing substring-either-direction — array is emission-ordered, so
  "first array hit" reproduces the reference's dict-iteration semantics,
  relation_extractor.py:420-445).
- E6 co-occurrence = sentence explode, per-sentence ``filter`` of the
  entity array by containment, ordered pairs via nested ``transform`` +
  ``slice`` (i < j pairing, relation_extractor.py:447-487).

Compared to the join formulation (operators/relations.py) this never
materializes the sentence x entity or text x entity pair space into rows —
the scans happen inside whole-stage codegen over array values. At
10^12-turn scale the only shuffles left in the build are conversation
reassembly and final triple dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import patterns as P
from .relations import _TRIM


def _resolve(ents: Column, text: Column) -> Column:
    """First exact entity (unique by construction), else first
    emission-ordered entity with text ⊆ name or name ⊆ text (empty text
    matches everything, as '' in s is True in Python)."""
    exact = F.get(F.filter(ents, lambda e: e["name_norm"] == text), 0)
    fuzzy = F.get(
        F.filter(
            ents,
            lambda e: (F.instr(e["name_norm"], text) > 0)
            | (F.instr(text, e["name_norm"]) > 0)
            | (F.length(text) == 0),
        ),
        0,
    )
    return F.coalesce(exact, fuzzy)


def pattern_relations_fused(extracted: DataFrame) -> DataFrame:
    """E5+E7: resolve each candidate's endpoints against the row's entity
    array; drop unresolved; conf 0.7."""
    resolved = F.transform(
        F.col("cand_texts"),
        lambda t: F.struct(t.alias("t"), _resolve(F.col("ents"), t).alias("ent")),
    )
    df = extracted.where(F.size("cands") > 0).select(
        "conv_id", "cands", resolved.alias("resolved")
    )
    lookup = lambda txt: F.get(  # noqa: E731
        F.filter(F.col("resolved"), lambda r: r["t"] == txt), 0
    )["ent"]
    rel = df.select(
        "conv_id",
        F.explode(
            F.transform(
                F.col("cands"),
                lambda c: F.struct(
                    lookup(c["head_text"]).alias("h"),
                    c["pred"].alias("pred"),
                    lookup(c["tail_text"]).alias("t"),
                ),
            )
        ).alias("r"),
    )
    return rel.where(
        F.col("r.h").isNotNull() & F.col("r.t").isNotNull()
    ).select(
        "conv_id",
        F.col("r.h.name_norm").alias("head_norm"),
        F.col("r.h.entity_type").alias("head_type"),
        F.col("r.pred").alias("pred"),
        F.col("r.t.name_norm").alias("tail_norm"),
        F.col("r.t.entity_type").alias("tail_type"),
        F.lit(P.PATTERN_RELATION_CONFIDENCE).alias("conf"),
    )


def cooccurrence_relations_fused(extracted: DataFrame) -> DataFrame:
    """E6: per-sentence entity containment scan + ordered pairs, all
    array-expression-side."""
    sents = extracted.where(F.size("ents") >= 2).select(
        "conv_id",
        "ents",
        F.explode(F.split(F.col("text"), P.SENTENCE_SPLIT_REGEX)).alias("sent_raw"),
    ).select(
        "conv_id",
        "ents",
        F.lower(F.regexp_replace(F.col("sent_raw"), _TRIM, "")).alias("sent"),
    ).where(F.length("sent") > 0)

    matched = F.filter(
        F.col("ents"), lambda e: F.instr(F.col("sent"), e["name_norm"]) > 0
    )
    pairs = F.flatten(
        F.transform(
            matched,
            lambda x, i: F.transform(
                F.slice(matched, i + 2, F.greatest(F.size(matched) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    out = sents.select("conv_id", F.explode(pairs).alias("p"))
    return out.select(
        "conv_id",
        F.col("p.a.name_norm").alias("head_norm"),
        F.col("p.a.entity_type").alias("head_type"),
        F.lit("related_to").alias("pred"),
        F.col("p.b.name_norm").alias("tail_norm"),
        F.col("p.b.entity_type").alias("tail_type"),
        F.lit(P.COOCCURRENCE_CONFIDENCE).alias("conf"),
    )


def extract_relations_fused(extracted: DataFrame) -> DataFrame:
    from .relations import validate_relations

    pat = pattern_relations_fused(extracted)
    coo = cooccurrence_relations_fused(extracted)
    return validate_relations(pat.unionByName(coo))
