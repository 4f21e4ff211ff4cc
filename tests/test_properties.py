"""Property-based invariants (hypothesis) for the pure column-expression
operators — driven through one Spark job per property by collecting
generated examples into a single DataFrame."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from agraph_spark.operators.chunking import chunk_documents
from agraph_spark.operators.textstats import fingerprint, lang_id, token_count

TEXTS = st.text(
    alphabet=st.sampled_from(list("abc ABC.!?\n\t你好 0189'-")), min_size=0, max_size=400
)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_token_count_matches_python(spark, texts):
    df = spark.createDataFrame([(str(i), t) for i, t in enumerate(texts)], "id string, text string")
    got = {r.id: r.n for r in df.select("id", token_count(F.col("text")).alias("n")).collect()}
    for i, t in enumerate(texts):
        want = len(re.split(r"\s+", t.strip())) if t.strip() else 0
        assert got[str(i)] == want, repr(t)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=6))
def test_fingerprint_whitespace_invariant(spark, texts):
    rows = []
    for i, t in enumerate(texts):
        rows.append((f"a{i}", t))
        rows.append((f"b{i}", "  " + t.replace(" ", "   ") + "\n"))  # same after normalization
    df = spark.createDataFrame(rows, "id string, text string")
    fp = {r.id: r.fp for r in df.select("id", fingerprint(F.col("text")).alias("fp")).collect()}
    for i, t in enumerate(texts):
        if t.strip():  # blank docs all collapse anyway
            assert fp[f"a{i}"] == fp[f"b{i}"], repr(t)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.text(alphabet=st.sampled_from(list("ab cd ")), min_size=1, max_size=2000), min_size=1, max_size=4),
    st.integers(min_value=20, max_value=200),
)
def test_chunker_reconstruction_property(spark, texts, chunk_size):
    overlap = chunk_size // 5
    size_w = max(1, int(chunk_size * 0.75))
    step_w = max(1, size_w - int(overlap * 0.75))
    df = spark.createDataFrame([(str(i), t) for i, t in enumerate(texts)], "conv_id string, text string")
    chunks = chunk_documents(df, chunk_size=chunk_size, overlap=overlap).collect()
    by_conv = {}
    for r in chunks:
        by_conv.setdefault(r.conv_id, []).append(r)
    for i, t in enumerate(texts):
        words = t.split()
        got = by_conv.get(str(i))
        if not words:
            assert got is None
            continue
        got = sorted(got, key=lambda r: r.chunk_idx)
        # every chunk within size bound; strides tile; dedup-concat == original
        assert all(len(r.content.split()) <= size_w for r in got)
        rebuilt = got[0].content.split()
        for r in got[1:]:
            rebuilt += r.content.split()[size_w - step_w:]
        assert rebuilt == words


def test_lang_id_basic(spark):
    df = spark.createDataFrame(
        [("en", "the quick brown fox jumps over the lazy dog"),
         ("zh", "苹果公司位于北京，开发人工智能技术。"),
         ("other", "1234 5678 !!! ???")],
        "expect string, text string",
    )
    rows = df.select("expect", lang_id(F.col("text")).alias("got")).collect()
    assert all(r.expect == r.got for r in rows)


def test_spread_guard(spark):
    """spread(): repartitions a 1-partition source up to defaultParallelism;
    leaves an already-parallel source untouched (the 100 TB no-op path)."""
    from agraph_spark.session import spread

    one = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    assert spread(one).rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    many = spark.range(1000).repartition(spark.sparkContext.defaultParallelism + 2)
    assert spread(many) is many


def test_cosine_hoisted_bitwise_equals_cosine(spark):
    """cosine_hoisted (per-vector norms precomputed, r6c) must reproduce
    cosine's doubles BITWISE on every pair, including zero-norm vectors —
    the hoist only moves the sqrt(fold), it must not change its result."""
    import random

    from agraph_spark.operators import vectors as V

    rng = random.Random(42)
    vecs = [[rng.uniform(-1, 1) for _ in range(17)] for _ in range(40)]
    vecs[3] = [0.0] * 17  # zero norm -> score 0.0 branch
    vecs[7] = [0.0] * 17
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, v array<double>"
    ).withColumn("nrm", V.norm(F.col("v")))
    a, b = df.alias("a"), df.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        V.cosine(F.col("a.v"), F.col("b.v")).alias("s_old"),
        V.cosine_hoisted(
            F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")
        ).alias("s_new"),
    )
    assert pairs.count() == 40 * 39 // 2
    assert pairs.where(F.col("s_old") != F.col("s_new")).count() == 0
    assert pairs.where(F.col("s_old").isNull() | F.col("s_new").isNull()).count() == 0
