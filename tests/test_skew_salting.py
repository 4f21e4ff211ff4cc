"""Skew stress: one monster conversation must not pin the conv_id-keyed
entity joins to a single task.

AQE skew-join splitting (session default) is the first line of defense;
``n_salts`` is the explicit guard. Correctness: salted output == unsalted
output exactly. Balance: with salting, the monster conversation's join rows
spread across partitions instead of landing in one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from agraph_spark.operators.relations import (
    cooccurrence_relations,
    resolve_mentions,
    split_sentences,
)


def _skewed_corpus(spark, giant_sents=1500, small_convs=40):
    ents = ["spark", "table", "query", "join", "index", "column"]
    giant = ". ".join(
        f"the {ents[i % 6]} meets the {ents[(i + 1) % 6]} number {i}"
        for i in range(giant_sents)
    )
    rows = [("giant", giant)]
    rows += [(f"c{i}", f"the {ents[i % 6]} meets the {ents[(i + 2) % 6]}.")
             for i in range(small_convs)]
    docs = spark.createDataFrame(rows, "conv_id string, text string")
    entities = spark.createDataFrame(
        [(cid, e, e, "concept", i) for cid, _ in rows for i, e in enumerate(ents)],
        "conv_id string, name string, name_norm string, entity_type string, entity_order int")
    return docs, entities


def test_salted_cooccurrence_matches_unsalted(spark):
    docs, entities = _skewed_corpus(spark)
    plain = cooccurrence_relations(docs, entities)
    salted = cooccurrence_relations(docs, entities, n_salts=8)
    key = ["conv_id", "head_norm", "pred", "tail_norm"]
    a = {tuple(r) for r in plain.select(*key).distinct().collect()}
    b = {tuple(r) for r in salted.select(*key).distinct().collect()}
    assert a == b and len(a) > 0


def test_salted_resolution_matches_unsalted(spark):
    docs, entities = _skewed_corpus(spark)
    texts = split_sentences(docs).select(
        "conv_id", F.substring("sent", 5, 5).alias("text")).distinct()
    key = ["conv_id", "text", "ent_norm", "ent_order"]
    a = {tuple(r) for r in resolve_mentions(texts, entities).select(*key).collect()}
    b = {tuple(r) for r in resolve_mentions(texts, entities, n_salts=8).select(*key).collect()}
    assert a == b and len(a) > 0


def test_salting_spreads_the_monster_conversation(spark):
    """Join-output rows of the giant conversation occupy ONE shuffle
    partition unsalted; salting spreads them across >= 4. Broadcast and AQE
    coalescing are disabled for the measurement: at 100 TB the entity side
    is not broadcastable and this shuffle-join path is exactly what the
    salt guards (locally the tiny side would broadcast and hide it)."""
    docs, entities = _skewed_corpus(spark)
    sents = split_sentences(docs)
    saved = {k: spark.conf.get(k) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.coalescePartitions.enabled")}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        def giant_partitions(n_salts):
            from agraph_spark.operators.relations import _conv_join

            j = _conv_join(sents, entities, n_salts).where(F.col("conv_id") == "giant")
            return j.select(F.spark_partition_id().alias("pid")).distinct().count()

        assert giant_partitions(None) == 1
        assert giant_partitions(8) >= 4
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_auto_salting_decision_and_equality(spark):
    """n_salts="auto"/AutoSalt measures the key distribution: balanced data
    -> no salt (plan unchanged); one monster conversation -> salts chosen,
    output exactly equal to the unsalted run."""
    from agraph_spark.operators.salting import AutoSalt, decide_salts

    docs, entities = _skewed_corpus(spark)
    sents = split_sentences(docs)

    # balanced input: heuristic declines
    balanced = sents.where(F.col("conv_id") != "giant")
    assert decide_salts(balanced, "conv_id", AutoSalt(min_rows=2, ratio_k=5.0)) is None
    # default floor: the giant conv here is far below 100k rows -> declines
    assert decide_salts(sents, "conv_id") is None
    # skewed input with test-scale thresholds: picks >= 2 salts
    cfg = AutoSalt(min_rows=100, ratio_k=5.0, max_salts=16)
    n = decide_salts(sents, "conv_id", cfg)
    assert n is not None and 2 <= n <= 16

    # exact output equality through the auto path
    key = ["conv_id", "head_norm", "pred", "tail_norm"]
    plain = {tuple(r) for r in
             cooccurrence_relations(docs, entities).select(*key).distinct().collect()}
    auto = {tuple(r) for r in
            cooccurrence_relations(docs, entities, n_salts=cfg).select(*key).distinct().collect()}
    assert plain == auto and len(plain) > 0


def test_auto_salting_sampled_counts(spark):
    """sample_fraction trades exactness for cost: scaled counts still detect
    the monster conversation."""
    from agraph_spark.operators.salting import AutoSalt, decide_salts

    docs, _ = _skewed_corpus(spark, giant_sents=3000)
    sents = split_sentences(docs)
    cfg = AutoSalt(min_rows=100, ratio_k=5.0, max_salts=16, sample_fraction=0.5)
    n = decide_salts(sents, "conv_id", cfg)
    assert n is not None and n >= 2
