"""agraph_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the query/data-processing semantics of JasonDZS/agraph
(reference at /root/reference, v0.1.2) as idiomatic Spark DataFrame
pipelines: conversation reassembly, chunking, vectorized mention/triple
extraction, entity linking (broadcast alias dict + MinHash-LSH blocking),
iterative connected-components canonicalization, and graph materialization
with per-partition lineage and checkpointed resumability.

Nothing here is a port: the reference is a single-process asyncio Python
toolkit (see SURVEY.md); every operator is re-derived as a DataFrame plan.
"""

__version__ = "0.1.0"
