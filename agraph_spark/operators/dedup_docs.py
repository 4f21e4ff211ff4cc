"""Document-level deduplication for training-data pipelines: exact,
n-gram Jaccard (inverted-index join), MinHash+LSH, SimHash.

Scale notes (the whole point of these):
- Exact: one groupBy on a fingerprint hash — the cheapest pass, run first.
- N-gram Jaccard: NEVER all-pairs. Explode distinct shingles, drop shingles
  that occur in too many docs (stop-shingle cap — they only produce junk
  pairs and are the skew source), self-join the inverted index, count
  intersections, compute |A∩B|/(|A|+|B|-|A∩B|).
- MinHash: k independent permutations approximated by k salted xxhash64
  mins — computed in one explode+groupBy; LSH bands group signatures into
  buckets so candidate pairs come from bucket joins, not comparisons.
- SimHash: 64-bit majority-of-token-hash-bits fingerprint; near-dup = low
  Hamming distance within same band buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import track
from .textstats import fingerprint


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (whitespace-normalized) documents."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("cnt"), F.min(id_col).alias("keeper_id"))
        .where(F.col("cnt") > 1)
    )


def word_shingles(text: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of lower(text)."""
    from .textstats import pystrip

    words = F.split(F.lower(pystrip(text)), r"(?U)\s+")
    return F.array_distinct(
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    from ..session import spread

    df = spread(df)
    return df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_docs: int = 200,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard >= threshold.

    Inverted-index join: pairs only share-a-shingle docs are compared.
    ``max_shingle_docs`` drops shingles present in more than that many docs
    (hot-key/skew guard; such shingles are boilerplate and only inflate the
    candidate pair space quadratically)."""
    # Round-6 note: this operator is intentionally UNCHANGED from round 5.
    # Two restructures were tried and reverted with sf1 A/B evidence:
    # (1) the hot-shingle cap as a window count (exchange reuse with the
    # self-join) full-sorts the 15M-row sf1 shingle table — 29.5 s -> 142 s;
    # the cap must stay aggregation-shaped (map-side partial agg) at scale.
    # (2) eager sh materialization + tracked sizes/hot (the racing-cache
    # fix that helps minhash) costs an extra full pass over the shingle
    # table at sf1 (~15-25% slower, A/B/A 42.4/31.6/35.9 vs r5) while
    # buying nothing at sf0.1 — the duplicated aggregate subtrees are
    # cheap partial aggregations, and the inverted-index self-join
    # dominates at every scale.
    sh = track(shingle_table(df, id_col, text_col, n))
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    hot = (
        sh.groupBy("shingle").agg(F.count("*").alias("df_cnt"))
        .where(F.col("df_cnt") > max_shingle_docs)
        .select("shingle")
    )
    filtered = sh.join(hot, "shingle", "left_anti")
    a = filtered.alias("a")
    b = filtered.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def md5_hash60(col: F.Column, seed: int) -> F.Column:
    """Deterministic 60-bit integer hash both Spark and DuckDB can compute
    bit-identically: top 15 hex chars of md5(seed || '#' || value). Slower
    than seeded xxhash64 (string md5 per (shingle, seed)) — used by the
    oracle-twinnable hash_mode, not the default path."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("#", F.lit(str(seed)), col)), 1, 15), 16, 10
    ).cast("bigint")


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(doc, sig: array<bigint>) — k seeded-hash min values over the
    shingle set. One explode + one groupBy; no UDF.

    hash_mode "xxhash64" (default): each shingle string is hashed ONCE
    (variable-length input); the k per-permutation hashes re-hash that
    8-byte long with a seed column — k cheap fixed-width hashes instead of
    k string hashes (measured ~2x on the signature stage).
    hash_mode "md5": md5-derived 60-bit hashes a SQL oracle can reproduce
    exactly (DuckDB has no xxhash64) — the correctness-twin mode."""
    sh = shingle_table(df, id_col, text_col, n)
    if hash_mode == "md5":
        mins = [
            F.min(md5_hash60(F.col("shingle"), i)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        sh = sh.withColumn("h", F.xxhash64(F.col("shingle")))
        mins = [
            F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    sig = sh.groupBy("doc").agg(*mins)
    return sig.select("doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def _cap_buckets(
    band_rows: DataFrame, keys: list[str], max_bucket_size: int | None, log_dropped: bool
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` before the
    within-bucket self-join. A boilerplate-heavy corpus (the normal case for
    web/training data) puts millions of near-identical docs in one band
    bucket; the self-join then explodes quadratically on a single shuffle
    key. Same skew guard as ngram_jaccard_pairs' hot-shingle cap. Dropped
    buckets mean dropped candidates only when a pair collides in NO other
    band — the standard LSH recall/cost trade, made explicit and loggable."""
    if max_bucket_size is None:
        return band_rows
    if log_dropped:
        import logging

        n_hot = (
            band_rows.groupBy(*keys)
            .agg(F.count("*").alias("bucket_size"))
            .where(F.col("bucket_size") > max_bucket_size)
            .count()
        )
        if n_hot:
            logging.getLogger(__name__).warning(
                "LSH: dropping %d band buckets larger than %d docs", n_hot, max_bucket_size
            )
    # window, not groupBy+anti-join: one shuffle on the SAME keys the
    # downstream self-join uses (exchange reuse), and no second subtree
    # racing to materialize the signature cache
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(k) for k in keys])
    return (
        band_rows.withColumn("_bucket_size", F.count("*").over(w))
        .where(F.col("_bucket_size") <= max_bucket_size)
        .drop("_bucket_size")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 5000,
    log_dropped: bool = True,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash-LSH near-dup candidates verified by estimated Jaccard.

    Band buckets: docs agreeing on all rows of any band collide; candidate
    pairs come from within-bucket joins (shuffle keyed by (band, bucket
    hash) — bounded by bucket sizes, not corpus size). Estimated Jaccard =
    fraction of agreeing minhash components. Buckets above
    ``max_bucket_size`` are dropped before the self-join (skew guard; see
    _cap_buckets) — exact-duplicate floods should be removed first by the
    cheaper exact_dup_groups pass.

    hash_mode "md5" swaps in SQL-reproducible signature hashes (md5_hash60)
    and keeps the band bucket as the raw comma-joined band values (string)
    so a DuckDB oracle can match the output bit-for-bit
    (__spark_entry__ dd_minhash_md5)."""
    rows = num_hashes // bands
    sig = track(minhash_signatures(df, num_hashes, n, id_col, text_col, hash_mode))
    band_vals = [
        F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string") for r in range(rows)])
        for b in range(bands)
    ]
    if hash_mode != "md5":
        # hash the band string to a cheap fixed-width join key (the string
        # form stays only in the oracle-twin mode, where DuckDB must agree)
        band_vals = [F.xxhash64(c) for c in band_vals]
    band_rows = sig.select(
        "doc", F.posexplode(F.array(*band_vals)).alias("band", "bucket")
    )
    # persist the capped band rows: the self-join below consumes them twice,
    # and uncached each side re-ran the explode + window-cap subtree (one
    # extra exchange + sort per side, plan-audited r6)
    band_rows = track(
        _cap_buckets(band_rows, ["band", "bucket"], max_bucket_size, log_dropped)
    )
    # eager materialization (see ngram_jaccard_pairs): builds the signature
    # and capped-band caches ONCE before the self-join + verify branches
    # would race them; measured 5.7 -> 3.5 s cold at sf0.1
    band_rows.count()
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    lambda v: v == 1,
                )
            )
            / F.lit(num_hashes),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )
    return est


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """SimHash over word tokens: per-bit majority of token hashes.

    Explode tokens, hash each, aggregate per-bit +1/-1 sums, assemble bits
    — one groupBy, JVM-side bit arithmetic. hash_mode "xxhash64" (default)
    uses bits 0..62 of xxhash64; "md5" uses the 60-bit md5-derived hash a
    DuckDB oracle reproduces exactly (__spark_entry__ dd_simhash_md5)."""
    from ..session import spread

    toks = spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+"), 0)).alias("tok"),
    )
    if hash_mode == "md5":
        # SQL-reproducible: 60-bit md5-derived token hash (md5_hash60, seed
        # 0), fingerprint over bits 0..59 — the oracle-twin mode
        toks = toks.withColumn("h", md5_hash60(F.col("tok"), 0))
        n_bits = 60
    else:
        toks = toks.withColumn("h", F.xxhash64("tok"))
        n_bits = 63  # bit 63 kept zero to stay in signed range
    bit_sums = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(n_bits)
        ]
    )
    sim = bit_sums.select(
        "doc",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i)).otherwise(F.lit(0).cast("long"))
                for i in range(n_bits)
            ]
        ).alias("simhash"),
    )
    return sim


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    band_bits: int = 16,
    max_bucket_size: int | None = 5000,
    log_dropped: bool = True,
    **kw,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit bands
    (a pair within Hamming<=3 of 64 bits must agree on >=1 of 4 bands).
    Band buckets above ``max_bucket_size`` are dropped before the self-join
    (skew guard, see _cap_buckets)."""
    sim = track(simhash64(df, **kw))
    bands = sim.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1))
                    for i in range(64 // band_bits)
                ]
            )
        ).alias("band", "key"),
    )
    # persist the capped band rows (consumed by both self-join sides; see
    # minhash_lsh_pairs)
    bands = track(_cap_buckets(bands, ["band", "key"], max_bucket_size, log_dropped))
    # eager materialization (see minhash_lsh_pairs)
    bands.count()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
