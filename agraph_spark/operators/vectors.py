"""Embedding / vector retrieval operators (SURVEY.md §2.8, V1-V7) plus the
scale-path ANN variants a 100 TB training-data pipeline needs.

All similarity math is JVM-side column expressions over ``array<float>``
(``zip_with`` + ``aggregate``) — whole-stage-codegen'd, no Python in the hot
path. Reference: brute force over a dict of np arrays
(/root/reference/agraph/storage/vector_storage.py:310-353).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """V3: dot/(|a||b|), 0.0 on zero norm (vector_storage.py:334-353)."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def cosine_hoisted(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the per-vector norms precomputed by the caller
    (``norm`` over each side's vector column, hoisted out of the pairwise
    expression). Bitwise-identical to ``cosine``: the same ``sqrt(fold)``
    runs on the same array either way, so hoisting only changes WHERE the
    fold executes, not its float result (asserted pairwise in
    test_properties). Use for pairwise self-joins — higher-order functions
    are CodegenFallback (interpreted), so dropping 2 of the 3 folds per
    pair measured 6.1 -> 2.2 s on the 200k-pair v_label_pairs (r6c)."""
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def cosine_scores(
    embeddings: DataFrame,
    query: DataFrame,
    vec_col: str = "embedding",
    query_col: str = "query_vec",
) -> DataFrame:
    """Score every row against a single query vector (1-row DataFrame,
    broadcast by Catalyst). V4 minus the top-k cut. r6c: norms hoisted
    (see cosine_hoisted) — query norm once in the broadcast frame, row
    norm once per row; scores bitwise-identical to the inline cosine."""
    q = F.broadcast(
        query.withColumn("_nq", norm(F.col(query_col).cast("array<double>")))
    )
    return (
        embeddings.withColumn("_na", norm(F.col(vec_col).cast("array<double>")))
        .crossJoin(q)
        .withColumn(
            "score",
            cosine_hoisted(
                F.col(vec_col).cast("array<double>"),
                F.col(query_col).cast("array<double>"),
                F.col("_na"),
                F.col("_nq"),
            ),
        )
        .drop(query_col, "_na", "_nq")
    )


def topk_similar(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    threshold: float = 0.0,
    id_col: str = "vec_id",
) -> DataFrame:
    """V4: brute-force top-k (vector_storage.py:310-332): score all, filter
    >= threshold, sort desc (id tiebreak), take k. One scan + one small
    sort — the right plan for a single query at any scale."""
    scored = cosine_scores(embeddings, query)
    return (
        scored.where(F.col("score") >= threshold)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_lsh_bucket(
    vec_col: Column, planes: list[list[float]]
) -> Column:
    """Scale path: sign-random-projection bucket id (one bit per plane).
    ``planes`` is a small driver-side list (seeded), compiled into column
    expressions — JVM-side, no UDF."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(vec_col.cast("array<double>"), lit) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_topk_lsh(
    embeddings: DataFrame,
    query: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: restrict the exact rerank to the query's LSH bucket.
    At 100 TB the bucket column is a partition/cluster key so the scan
    prunes to 1/2^p of the data; here it is computed on the fly."""
    bucketed = embeddings.withColumn("bucket", hyperplane_lsh_bucket(F.col("embedding"), planes))
    qb = query.withColumn("bucket", hyperplane_lsh_bucket(F.col("query_vec"), planes))
    cand = bucketed.join(F.broadcast(qb.select("bucket", "query_vec")), "bucket")
    scored = cand.withColumn(
        "score",
        cosine(F.col("embedding").cast("array<double>"), F.col("query_vec").cast("array<double>")),
    ).drop("query_vec")
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF scale path: coarse k-means centroids (fit on the data via
    pyspark.ml, sample-friendly), every vector assigned to its nearest
    centroid. At 100 TB the centroid id is the partition key: a query
    probes 1-few partitions instead of the corpus. Returns (assigned_df
    with 'centroid' column, centroid list)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = embeddings.withColumn("_v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_centroids, seed=seed, featuresCol="_v", predictionCol="centroid")
    model = km.fit(feat)
    assigned = model.transform(feat).drop("_v")
    centroids = [
        (c.toArray() if hasattr(c, "toArray") else c).tolist()
        for c in model.clusterCenters()
    ]
    _ = vector_to_array  # imported for parity with the write path
    return assigned, centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assignment-only IVF: nearest centroid (squared L2, lowest index on
    ties) as pure column expressions — the deterministic, oracle-
    certifiable half of the IVF path (v_ann_ivf/v_ann_ivf_hist twin it in
    DuckDB). ``ivf_index`` remains the production fit (KMeans); this
    function is what a pipeline runs when centroids are already trained
    and shipped as a literal/broadcast — the common serving shape at
    100 TB, where assignment is a map-only pass."""
    cs = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.array(*[F.lit(float(x)) for x in c]).alias("v"),
        )
        for i, c in enumerate(centroids)
    ])
    v = F.col(vec_col).cast("array<double>")

    def d2(c):
        return F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # one distance per centroid, then array_min over (d, i) structs —
    # struct ordering breaks ties on the lower index, matching a stable
    # argmin (and computing each distance once, unlike a fold with the
    # distance in the predicate)
    best = F.array_min(
        F.transform(cs, lambda c: F.struct(d2(c["v"]).alias("d"), c["i"].alias("i")))
    )
    return embeddings.withColumn("centroid", best["i"])


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest centroids' partitions, exact cosine rerank
    inside them. Driver picks probe ids (centroid count is tiny); the scan
    prunes on the centroid column."""
    import numpy as np

    c = np.asarray(centroids, dtype=float)
    q = np.asarray(query_vec, dtype=float)
    dists = ((c - q) ** 2).sum(axis=1)
    # stable sort: equidistant centroids tie-break on the LOWER index,
    # matching the v_ann_ivf oracle's (distance, cid) ordering
    probes = [int(i) for i in np.argsort(dists, kind="stable")[:n_probe]]
    spark = assigned.sparkSession
    from ..session import local_df

    qdf = local_df(spark, [(query_vec,)], "query_vec array<double>")
    cand = assigned.where(F.col("centroid").isin(probes))
    scored = cand.crossJoin(F.broadcast(qdf)).withColumn(
        "score", cosine(F.col(vec_col).cast("array<double>"), F.col("query_vec"))
    ).drop("query_vec")
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def render_entity_text(nodes: DataFrame) -> DataFrame:
    """V1: text rendering for embedding — name + description + aliases
    (OpenAIEmbedding._entity_to_text, graph_embedding.py:529-537) as one
    concat_ws expression. Empty description contributes nothing (the
    reference's truthiness check)."""
    return nodes.withColumn(
        "render_text",
        F.concat_ws(
            " ",
            F.col("name"),
            F.when(F.length(F.coalesce("description", F.lit(""))) > 0, F.col("description")),
            F.when(
                F.size(F.coalesce(F.col("aliases"), F.array())) > 0,
                F.concat(F.lit("别名: "), F.concat_ws(", ", F.col("aliases"))),
            ),
        ),
    )


def render_relation_text(edges: DataFrame) -> DataFrame:
    """V1 relation side (OpenAIEmbedding._relation_to_text,
    graph_embedding.py:539-548): "head pred tail" + optional description;
    bare pred when endpoints are missing."""
    base = F.when(
        F.col("head_name").isNotNull() & F.col("tail_name").isNotNull(),
        F.concat_ws(" ", "head_name", "pred", "tail_name"),
    )
    desc = F.when(
        F.length(F.coalesce("description", F.lit(""))) > 0, F.col("description")
    )
    joined = F.concat_ws(" ", base, desc)
    return edges.withColumn(
        "render_text", F.when(F.length(joined) > 0, joined).otherwise(F.col("pred"))
    )


def render_chunk_text(chunks: DataFrame) -> DataFrame:
    """V1 chunk side (base GraphEmbedding._text_chunk_to_text,
    graph_embedding.py:345-370): Title/Content/Source/Type/Metadata labeled
    parts joined with " | ". chunk_type defaults to "paragraph" in the
    reference TextChunk, so the Type part is always present there — a
    missing chunk_type column here takes the same default. Metadata renders
    as "k: v" pairs comma-joined from a map column when one exists."""
    cols = chunks.columns
    part = lambda label, col: F.when(
        F.length(F.coalesce(col, F.lit(""))) > 0, F.concat(F.lit(label), col)
    )
    chunk_type = (
        F.coalesce(F.col("chunk_type"), F.lit("paragraph"))
        if "chunk_type" in cols
        else F.lit("paragraph")
    )
    meta = (
        F.when(
            F.size(F.coalesce(F.col("metadata"), F.create_map())) > 0,
            F.concat(
                F.lit("Metadata: "),
                F.concat_ws(
                    ", ",
                    F.transform(
                        F.map_entries("metadata"),
                        lambda e: F.concat_ws(": ", e["key"], e["value"]),
                    ),
                ),
            ),
        )
        if "metadata" in cols
        else F.lit(None)
    )
    return chunks.withColumn(
        "render_text",
        F.concat_ws(
            " | ",
            part("Title: ", F.col("title") if "title" in cols else F.lit(None)),
            part("Content: ", F.col("content")),
            part("Source: ", F.col("source") if "source" in cols else F.lit(None)),
            part("Type: ", chunk_type),
            meta,
        ),
    )


def embed_hash_stub(df: DataFrame, text_col: str = "render_text", dim: int = 16) -> DataFrame:
    """V2 stand-in encoder: deterministic hash-derived embedding, computed
    JVM-side (xxhash64 over salted text), unit-scale-ish. The production
    encoder swaps in a batched-inference mapInPandas kernel (one model call
    per Arrow batch, graph_embedding.py:549-598 semantics); tests use this
    stub so results are reproducible with zero network."""
    comps = [
        (
            (F.pmod(F.xxhash64(F.concat(F.col(text_col), F.lit(f"#{i}"))), F.lit(2000)) - 1000)
            / 1000.0
        ).cast("float")
        for i in range(dim)
    ]
    return df.withColumn("embedding", F.array(*comps))


def embed_md5_stub(df: DataFrame, text_col: str = "render_text", dim: int = 8) -> DataFrame:
    """embed_hash_stub's oracle-twinnable sibling: components are
    md5-derived doubles ((md5_hash60 % 2000 - 1000)/1000) that a DuckDB
    oracle reproduces bit-for-bit (__spark_entry__ kg_search_multi_md5).
    Costs dim string md5s per row — the xxhash64 stub stays the default."""
    from .dedup_docs import md5_hash60

    comps = [
        ((F.pmod(md5_hash60(F.col(text_col), i), F.lit(2000)) - 1000) / 1000.0).cast("double")
        for i in range(dim)
    ]
    return df.withColumn("embedding", F.array(*comps))
