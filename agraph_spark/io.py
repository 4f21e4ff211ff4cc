"""Sources & sinks (SURVEY.md §2.1).

- S5/S8: graph store — nodes/edges/chunks/triples as parquet directories
  (one table each, the layout Iceberg would use; writers take an optional
  ``fmt="iceberg"`` that engages ``saveAsTable`` when an Iceberg catalog is
  configured — this container has none, so parquet is the tested path and
  the layout is identical).
- S7: GraphML / Cytoscape.js / D3 exports — display-format serializers,
  driver-side over collected rows BY DESIGN (visualization output is
  human-scale; anything big enough to need distribution shouldn't be
  rendered). Reference: mixins.py:187-283, utils.py:32-147.
- S2: document-file sources — extension-dispatched readers; text-family
  formats use native Spark readers; PDF/Word/image-OCR require codec
  libraries absent here and raise NotImplementedError with the dispatch
  plumbing in place (factory semantics of processer/factory.py:24-157).
"""

from __future__ import annotations

import json
import os
import xml.sax.saxutils as sx

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ------------------------------------------------------------- graph store

def write_graph(nodes: DataFrame, edges: DataFrame, out_dir: str,
                triples: DataFrame | None = None, chunks: DataFrame | None = None,
                fmt: str = "parquet") -> None:
    tables = {"nodes": nodes, "edges": edges}
    if triples is not None:
        tables["triples"] = triples
    if chunks is not None:
        tables["chunks"] = chunks
    for name, df in tables.items():
        if fmt == "iceberg":
            df.writeTo(f"{out_dir}.{name}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(os.path.join(out_dir, name))


def read_graph(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    out = {}
    for name in ("nodes", "edges", "triples", "chunks"):
        path = os.path.join(out_dir, name)
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def write_graph_json(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """S8: JSON-lines export per table (the reference's graph.json nested
    dict becomes two json-lines tables; to_dict/from_dict round-trip,
    graph.py:483-535)."""
    nodes.write.mode("overwrite").json(os.path.join(out_dir, "nodes_json"))
    edges.write.mode("overwrite").json(os.path.join(out_dir, "edges_json"))


# ------------------------------------------------------- display exporters

def export_graphml(nodes: DataFrame, edges: DataFrame, max_rows: int = 100_000) -> str:
    """S7: GraphML document (lightrag_builder.py:589-697 key layout d0..)."""
    n = nodes.limit(max_rows).collect()
    e = edges.limit(max_rows).collect()
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '<key id="d0" for="node" attr.name="name" attr.type="string"/>',
        '<key id="d1" for="node" attr.name="entity_type" attr.type="string"/>',
        '<key id="d2" for="edge" attr.name="pred" attr.type="string"/>',
        '<key id="d3" for="edge" attr.name="confidence" attr.type="double"/>',
        '<graph edgedefault="directed">',
    ]
    for r in n:
        parts.append(
            f'<node id="{sx.escape(r.entity_id)}">'
            f'<data key="d0">{sx.escape(r.name or "")}</data>'
            f'<data key="d1">{sx.escape(r.entity_type or "")}</data></node>'
        )
    for r in e:
        parts.append(
            f'<edge source="{sx.escape(r.head_id)}" target="{sx.escape(r.tail_id)}">'
            f'<data key="d2">{sx.escape(r.pred or "")}</data>'
            f'<data key="d3">{r.confidence if r.confidence is not None else 0.0}</data></edge>'
        )
    parts += ["</graph>", "</graphml>"]
    return "\n".join(parts)


def import_graphml(spark: SparkSession, xml_text: str) -> tuple[DataFrame, DataFrame]:
    """S4: GraphML -> (nodes, edges) DataFrames (driver-side ElementTree
    parse; GraphML files are interchange-scale)."""
    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.fromstring(xml_text)
    nodes, edges = [], []
    for nd in root.iterfind(".//g:node", ns):
        data = {d.get("key"): (d.text or "") for d in nd.iterfind("g:data", ns)}
        nodes.append((nd.get("id"), data.get("d0", ""), data.get("d1", "unknown")))
    for ed in root.iterfind(".//g:edge", ns):
        data = {d.get("key"): (d.text or "") for d in ed.iterfind("g:data", ns)}
        edges.append(
            (ed.get("source"), ed.get("target"), data.get("d2", "related_to"),
             float(data.get("d3", "0") or 0))
        )
    ndf = spark.createDataFrame(nodes, "entity_id string, name string, entity_type string")
    edf = spark.createDataFrame(edges, "head_id string, tail_id string, pred string, confidence double")
    return ndf, edf


def export_cytoscape(nodes: DataFrame, edges: DataFrame, max_rows: int = 100_000) -> str:
    """S7: Cytoscape.js elements JSON (utils.py:79-114)."""
    elements = [
        {"data": {"id": r.entity_id, "label": r.name, "type": r.entity_type}}
        for r in nodes.limit(max_rows).collect()
    ] + [
        {"data": {"source": r.head_id, "target": r.tail_id, "label": r.pred}}
        for r in edges.limit(max_rows).collect()
    ]
    return json.dumps({"elements": elements})


def export_d3(nodes: DataFrame, edges: DataFrame, max_rows: int = 100_000) -> str:
    """S7: D3 force-layout JSON (utils.py:117-147)."""
    return json.dumps(
        {
            "nodes": [
                {"id": r.entity_id, "name": r.name, "group": r.entity_type}
                for r in nodes.limit(max_rows).collect()
            ],
            "links": [
                {"source": r.head_id, "target": r.tail_id, "type": r.pred,
                 "value": r.confidence}
                for r in edges.limit(max_rows).collect()
            ],
        }
    )


# ---------------------------------------------------- document-file source

TEXT_EXTS = {".txt", ".md", ".markdown", ".log"}
JSON_EXTS = {".json", ".jsonl"}
CSV_EXTS = {".csv", ".tsv"}
STUB_EXTS = {".pdf": "pdf", ".docx": "word", ".doc": "word",
             ".png": "image-ocr", ".jpg": "image-ocr", ".jpeg": "image-ocr"}


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """S2: extension-dispatched document reader -> (conv_id, text).

    Text/markdown via wholeTextFiles-equivalent, JSON/CSV via native
    readers (all columns stringified and joined). PDF/Word/OCR formats
    raise NotImplementedError (codec libraries not in this container) —
    the dispatch mirrors DocumentProcessorFactory (processer/factory.py)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in STUB_EXTS:
        raise NotImplementedError(
            f"{STUB_EXTS[ext]} extraction requires codec libraries not present "
            "in this environment; convert to text/json/csv upstream"
        )
    if ext in JSON_EXTS:
        df = spark.read.json(path)
        return df.select(
            F.monotonically_increasing_id().cast("string").alias("conv_id"),
            F.to_json(F.struct(*df.columns)).alias("text"),
        )
    if ext in CSV_EXTS:
        sep = "\t" if ext == ".tsv" else ","
        df = spark.read.option("header", True).option("sep", sep).csv(path)
        return df.select(
            F.monotonically_increasing_id().cast("string").alias("conv_id"),
            F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in df.columns]).alias("text"),
        )
    # text family: one document per file
    return (
        spark.read.format("text").option("wholetext", True).load(path)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("conv_id"),
            F.col("value").alias("text"),
        )
    )
