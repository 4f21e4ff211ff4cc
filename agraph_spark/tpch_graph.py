"""Deterministic KG derived from the driver's TPC-H-ish tables.

Used by the driver contract (__spark_entry__.py): graph operators need a
(nodes, edges) input that both Spark and the DuckDB oracle can construct
identically, so the construction lives here ONCE as (a) Spark DataFrames
and (b) a SQL CTE string — they must stay in sync (tests check it).

The graph intentionally contains defects the integrity operators must
find: dangling edges (suppliers with s_suppkey % 10 == 0 are referenced by
edges but excluded from nodes), duplicate (head, tail, pred) signatures
(second supplier->nation belongs_to for s_suppkey % 5 == 0), and
self-loops (nation similar_to itself for n_nationkey % 7 == 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def build_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges) DataFrames. Must match GRAPH_SQL_CTE row-for-row."""
    t = load_tables(spark, sf_dir, ["region", "nation", "customer", "supplier"])

    def sid(prefix: str, col: str):
        return F.concat(F.lit(prefix), F.col(col).cast("string"))

    nodes = (
        t["region"].select(sid("R", "r_regionkey").alias("entity_id"),
                           F.col("r_name").alias("name"),
                           F.lit("region").alias("entity_type"),
                           F.lit(1.0).alias("confidence"))
        .unionByName(t["nation"].select(sid("N", "n_nationkey").alias("entity_id"),
                                        F.col("n_name").alias("name"),
                                        F.lit("nation").alias("entity_type"),
                                        F.lit(1.0).alias("confidence")))
        .unionByName(t["supplier"].where(F.col("s_suppkey") % 10 != 0)
                     .select(sid("S", "s_suppkey").alias("entity_id"),
                             F.col("s_name").alias("name"),
                             F.lit("supplier").alias("entity_type"),
                             F.lit(0.9).alias("confidence")))
        .unionByName(t["customer"].select(sid("C", "c_custkey").alias("entity_id"),
                                          F.col("c_name").alias("name"),
                                          F.lit("customer").alias("entity_type"),
                                          F.lit(0.8).alias("confidence")))
    )

    nation_region = t["nation"].join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
    nat_a = t["nation"].alias("a")
    nat_b = t["nation"].alias("b")
    edges = (
        nation_region.select(sid("R", "r_regionkey").alias("head_id"),
                             sid("N", "n_nationkey").alias("tail_id"),
                             F.lit("contains").alias("pred"),
                             F.lit(1.0).alias("confidence"),
                             F.lit("geo").alias("source"))
        .unionByName(t["supplier"].select(sid("N", "s_nationkey").alias("head_id"),
                                          sid("S", "s_suppkey").alias("tail_id"),
                                          F.lit("contains").alias("pred"),
                                          F.lit(0.9).alias("confidence"),
                                          F.lit("supp").alias("source")))
        .unionByName(t["customer"].select(sid("C", "c_custkey").alias("head_id"),
                                          sid("N", "c_nationkey").alias("tail_id"),
                                          F.lit("belongs_to").alias("pred"),
                                          F.lit(0.8).alias("confidence"),
                                          F.lit("cust").alias("source")))
        .unionByName(t["supplier"].select(sid("S", "s_suppkey").alias("head_id"),
                                          sid("N", "s_nationkey").alias("tail_id"),
                                          F.lit("belongs_to").alias("pred"),
                                          F.lit(0.9).alias("confidence"),
                                          F.lit("supp_loc").alias("source")))
        .unionByName(t["supplier"].where(F.col("s_suppkey") % 5 == 0)
                     .select(sid("S", "s_suppkey").alias("head_id"),
                             sid("N", "s_nationkey").alias("tail_id"),
                             F.lit("belongs_to").alias("pred"),
                             F.lit(0.85).alias("confidence"),
                             F.lit("supp_loc2").alias("source")))
        .unionByName(
            nat_a.join(nat_b,
                       (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
                       & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
            .select(F.concat(F.lit("N"), F.col("a.n_nationkey").cast("string")).alias("head_id"),
                    F.concat(F.lit("N"), F.col("b.n_nationkey").cast("string")).alias("tail_id"),
                    F.lit("similar_to").alias("pred"),
                    F.lit(0.7).alias("confidence"),
                    F.lit("nat_sim").alias("source")))
        .unionByName(t["nation"].where(F.col("n_nationkey") % 7 == 0)
                     .select(sid("N", "n_nationkey").alias("head_id"),
                             sid("N", "n_nationkey").alias("tail_id"),
                             F.lit("similar_to").alias("pred"),
                             F.lit(0.6).alias("confidence"),
                             F.lit("self").alias("source")))
    )
    edges = edges.withColumn(
        "edge_id", F.concat_ws("|", "pred", "head_id", "tail_id", "source")
    )
    return nodes, edges


# DuckDB twin of build_graph — prepend to oracle queries that need the graph.
GRAPH_SQL_CTE = """
WITH RECURSIVE nodes AS (
  SELECT 'R' || r_regionkey AS entity_id, r_name AS name, 'region' AS entity_type, 1.0 AS confidence FROM region
  UNION ALL SELECT 'N' || n_nationkey, n_name, 'nation', 1.0 FROM nation
  UNION ALL SELECT 'S' || s_suppkey, s_name, 'supplier', 0.9 FROM supplier WHERE s_suppkey % 10 <> 0
  UNION ALL SELECT 'C' || c_custkey, c_name, 'customer', 0.8 FROM customer
),
edges AS (
  SELECT 'R' || r_regionkey AS head_id, 'N' || n_nationkey AS tail_id,
         'contains' AS pred, 1.0 AS confidence, 'geo' AS source
    FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL SELECT 'N' || s_nationkey, 'S' || s_suppkey, 'contains', 0.9, 'supp' FROM supplier
  UNION ALL SELECT 'C' || c_custkey, 'N' || c_nationkey, 'belongs_to', 0.8, 'cust' FROM customer
  UNION ALL SELECT 'S' || s_suppkey, 'N' || s_nationkey, 'belongs_to', 0.9, 'supp_loc' FROM supplier
  UNION ALL SELECT 'S' || s_suppkey, 'N' || s_nationkey, 'belongs_to', 0.85, 'supp_loc2'
    FROM supplier WHERE s_suppkey % 5 = 0
  UNION ALL SELECT 'N' || a.n_nationkey, 'N' || b.n_nationkey, 'similar_to', 0.7, 'nat_sim'
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
  UNION ALL SELECT 'N' || n_nationkey, 'N' || n_nationkey, 'similar_to', 0.6, 'self'
    FROM nation WHERE n_nationkey % 7 = 0
)
"""
