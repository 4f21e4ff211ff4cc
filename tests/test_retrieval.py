"""Retrieval: union-pass multi-index search, hybrid scoring, connected-chunk
expansion, cosine top-k vs NumPy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from agraph_spark.operators.retrieval import (
    expand_connected_chunks,
    hybrid_search_chunks,
    search_knowledge,
    search_namespace,
)
from agraph_spark.operators.vectors import embed_hash_stub, topk_similar


def test_topk_vs_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = spark.createDataFrame([(vecs[7].tolist(),)], "query_vec array<float>")
    got = [(r.vec_id, r.score) for r in topk_similar(df, q, k=5).collect()]
    sims = (vecs @ vecs[7]) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[7]))
    want_ids = np.argsort(-sims)[:5].tolist()
    assert [g[0] for g in got] == want_ids
    assert got[0][0] == 7 and abs(got[0][1] - 1.0) < 1e-6


def test_search_knowledge_union_pass(spark):
    nodes = embed_hash_stub(
        spark.createDataFrame([("e1", "apple"), ("e2", "pear")], "entity_id string, render_text string")
    )
    edges = embed_hash_stub(
        spark.createDataFrame([("r1", "apple grows")], "edge_id string, render_text string")
    )
    chunks = embed_hash_stub(
        spark.createDataFrame([("c1", "apple text"), ("c2", "other")], "chunk_id string, render_text string")
    )
    q = embed_hash_stub(
        spark.createDataFrame([("q", "apple")], "qid string, render_text string")
    ).select(F.col("embedding").alias("query_vec"))
    out = search_knowledge(nodes, edges, chunks, q, k=2, threshold=-1.0)
    by_ns = {}
    for r in out.collect():
        by_ns.setdefault(r.namespace, []).append(r.item_id)
    assert set(by_ns) == {"entity", "relation", "text_chunk"}
    assert len(by_ns["entity"]) == 2 and len(by_ns["text_chunk"]) == 2


def test_hybrid_search_prefers_exact_substring(spark):
    chunks = embed_hash_stub(
        spark.createDataFrame(
            [("c1", "the apple pie recipe", None), ("c2", "unrelated words here", None)],
            "chunk_id string, content string, title string",
        ).withColumn("render_text", F.col("content"))
    )
    q = embed_hash_stub(
        spark.createDataFrame([("apple pie",)], "render_text string")
    ).select(F.col("embedding").alias("query_vec"))
    top = hybrid_search_chunks(chunks, "apple pie", q, k=1).first()
    assert top.chunk_id == "c1" and top.text_score == 0.8


def test_expand_connected_chunks(spark):
    retrieved = spark.createDataFrame(
        [("e1", "entity", 0.9), ("e2", "entity", 0.5), ("r1", "relation", 0.7)],
        "item_id string, namespace string, score double",
    )
    links = spark.createDataFrame(
        [("c1", "e1"), ("c1", "e2"), ("c2", "e2"), ("c3", "zzz")],
        "chunk_id string, entity_id string",
    )
    out = {r.chunk_id: r.n_connections for r in expand_connected_chunks(retrieved, links).collect()}
    assert out == {"c1": 2, "c2": 1}


def test_search_namespace_threshold(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([([1.0, 0.0],)], "query_vec array<float>")
    got = [r.vec_id for r in search_namespace(df, q, k=10, threshold=0.5, id_col="vec_id").collect()]
    assert got == [1, 3]


def test_chat_context_assembly(spark):
    """V10: per-namespace top-k respects distinct k's; kg_context is valid
    JSON in retrieval-rank order; text_content numbers the chunk prefixes."""
    import json

    from agraph_spark.operators.retrieval import chat, chat_context
    from agraph_spark.operators.vectors import embed_hash_stub
    from pyspark.sql import functions as F

    mk = lambda rows, idc: embed_hash_stub(
        spark.createDataFrame(rows, f"{idc} string, render_text string"))
    nodes = mk([(f"e{i}", f"entity topic {i}") for i in range(10)], "entity_id")
    edges = mk([(f"r{i}", f"rel {i} connects") for i in range(8)], "edge_id")
    chunks = mk([(f"c{i}", f"chunk body {i} join query") for i in range(12)], "chunk_id")
    q = embed_hash_stub(spark.createDataFrame([("join query",)], "render_text string")) \
        .select(F.col("embedding").alias("query_vec"))
    r = chat_context(nodes, edges, chunks, q, k_entities=3, k_relations=2,
                     k_chunks=4, threshold=-1.0).collect()[0]
    assert (r.n_entities, r.n_relations, r.n_chunks) == (3, 2, 4)
    ctx = json.loads(r.kg_context)
    assert sorted(ctx) == ["entities", "relations", "text_chunks"]
    assert len(ctx["entities"]) == 3 and len(ctx["text_chunks"]) == 4
    scores = [e["score"] for e in ctx["entities"]]
    assert scores == sorted(scores, reverse=True)
    lines = r.text_content.splitlines()
    assert len(lines) == 4 and lines[0].startswith("文本片段 1: ")
    # driver-side wrapper: deterministic stub answer, same context
    resp = chat(nodes, edges, chunks, q, "join query", k_entities=3,
                k_relations=2, k_chunks=4, threshold=-1.0)
    assert resp["answer"].startswith("[stub-answer ")
    assert resp["n_chunks"] == 4


def test_chat_context_enhanced_connected_chunks(spark):
    """Enhanced V10 (achat_enhanced): chunks linked to retrieved entities
    join the text_chunk set, deduplicated against direct hits, ranked after
    them by V9 relevance."""
    import json

    from agraph_spark.operators.retrieval import chat_context
    from agraph_spark.operators.vectors import embed_hash_stub
    from pyspark.sql import functions as F

    mk = lambda rows, idc: embed_hash_stub(
        spark.createDataFrame(rows, f"{idc} string, render_text string"))
    nodes = mk([(f"e{i}", f"entity topic {i}") for i in range(6)], "entity_id")
    edges = mk([(f"r{i}", f"rel {i}") for i in range(4)], "edge_id")
    chunks = mk([(f"c{i}", f"chunk body {i}") for i in range(10)], "chunk_id")
    q = embed_hash_stub(spark.createDataFrame([("topic",)], "render_text string")) \
        .select(F.col("embedding").alias("query_vec"))
    # every entity links to chunk c9 (and e0 also to c0)
    links = spark.createDataFrame(
        [(f"e{i}", "c9") for i in range(6)] + [("e0", "c0")],
        "entity_id string, chunk_id string")
    base = chat_context(nodes, edges, chunks, q, k_entities=3, k_relations=2,
                        k_chunks=2, threshold=-1.0).collect()[0]
    enh = chat_context(nodes, edges, chunks, q, k_entities=3, k_relations=2,
                       k_chunks=2, threshold=-1.0,
                       chunk_entity_links=links, k_connected=5).collect()[0]
    assert enh.n_chunks > base.n_chunks
    ctx = json.loads(enh.kg_context)
    chunk_ids = [c["id"] for c in ctx["text_chunks"]]
    assert "c9" in chunk_ids                      # connected chunk included
    assert len(chunk_ids) == len(set(chunk_ids))  # deduped vs direct hits
    assert chunk_ids[:base.n_chunks] == [c["id"] for c in json.loads(base.kg_context)["text_chunks"]]


def test_render_text_reference_forms(spark):
    """V1 renderers match the reference's string forms
    (graph_embedding.py:345-366, 529-548)."""
    from agraph_spark.operators.vectors import (
        render_chunk_text,
        render_entity_text,
        render_relation_text,
    )

    nodes = spark.createDataFrame(
        [("e1", "Acme", "corp desc", ["AC", "acme inc"]),
         ("e2", "Bare", "", [])],
        "entity_id string, name string, description string, aliases array<string>")
    got = {r.entity_id: r.render_text for r in render_entity_text(nodes).collect()}
    assert got["e1"] == "Acme corp desc 别名: AC, acme inc"
    assert got["e2"] == "Bare"

    edges = spark.createDataFrame(
        [("r1", "Acme", "contains", "Paris", "geo note"),
         ("r2", None, "related_to", None, "")],
        "edge_id string, head_name string, pred string, tail_name string, description string")
    got = {r.edge_id: r.render_text for r in render_relation_text(edges).collect()}
    assert got["r1"] == "Acme contains Paris geo note"
    assert got["r2"] == "related_to"

    # reference TextChunk.chunk_type defaults to "paragraph", so the Type
    # part is ALWAYS present in _text_chunk_to_text output (ADVICE r2)
    chunks = spark.createDataFrame(
        [("c1", "T", "body text", "web")],
        "chunk_id string, title string, content string, source string")
    assert render_chunk_text(chunks).collect()[0].render_text == \
        "Title: T | Content: body text | Source: web | Type: paragraph"

    typed = spark.createDataFrame(
        [("c2", None, "body", None, "code", {"lang": "py", "n": "3"})],
        "chunk_id string, title string, content string, source string, "
        "chunk_type string, metadata map<string,string>")
    assert render_chunk_text(typed).collect()[0].render_text == \
        "Content: body | Type: code | Metadata: lang: py, n: 3"


def test_search_graph_modes(spark):
    """Native naive/local/global/hybrid search over a planted graph: each
    mode seeds from its namespace and expands along the declared joins."""
    from agraph_spark.operators.retrieval import search_graph_modes

    # query vector aligned with E1 (entities), R9 (relations), C7 (chunks)
    q = spark.createDataFrame([([1.0, 0.0],)], "query_vec array<double>")
    nodes = spark.createDataFrame(
        [("E1", [1.0, 0.0]), ("E2", [0.9, 0.1]), ("E3", [0.0, 1.0])],
        "entity_id string, embedding array<double>")
    edges = spark.createDataFrame(
        [("R9", "E3", "E4", [1.0, 0.0]),   # best relation, endpoints E3/E4
         ("R1", "E1", "E3", [0.0, 1.0]),   # incident to seed entity E1
         ("R2", "E5", "E6", [0.1, 0.9])],  # disconnected from seeds
        "edge_id string, head_id string, tail_id string, embedding array<double>")
    chunks = spark.createDataFrame(
        [("C7", [1.0, 0.0]), ("C8", [0.0, 1.0])],
        "chunk_id string, embedding array<double>")
    links = spark.createDataFrame(
        [("C8", "E1"), ("C7", "E4")], "chunk_id string, entity_id string")

    def got(mode, k=2):
        return {(r.namespace, r.item_id, r.origin) for r in search_graph_modes(
            nodes, edges, chunks, q, mode=mode, k=k,
            chunk_entity_links=links, threshold=-1.0).collect()}

    assert got("naive") == {("text_chunk", "C7", "naive"),
                            ("text_chunk", "C8", "naive")}

    # local: seeds E1,E2 -> incident relation R1 -> E1's chunk C8
    assert got("local") == {("entity", "E1", "local"), ("entity", "E2", "local"),
                            ("relation", "R1", "local"),
                            ("text_chunk", "C8", "local")}

    # global: seeds R9,R2 -> endpoints E3,E4,E5,E6 -> E4's chunk C7
    g = got("global")
    assert ("relation", "R9", "global") in g and ("relation", "R2", "global") in g
    assert {("entity", e, "global") for e in ["E3", "E4", "E5", "E6"]} <= g
    assert ("text_chunk", "C7", "global") in g

    # hybrid = union, deduped per (namespace, item_id)
    h = got("hybrid")
    ids = {(ns, i) for ns, i, _ in h}
    assert ids == {(ns, i) for ns, i, _ in got("local") | got("global")}
    assert len(ids) == len(h)  # no duplicate (namespace, item_id)

    import pytest as _pt
    with _pt.raises(ValueError):
        search_graph_modes(nodes, edges, chunks, q, mode="bogus")
