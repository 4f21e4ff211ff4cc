"""Round-6b A/B: resolve_mentions winner-pick as window row_number (OLD)
vs min(struct(...)) hash aggregate (NEW, current code).

Usage: python tools/exp_resolve.py [NEW|OLD]
Runs the bench-identical warmup, then times kg_build_transcripts and
kg_triples_docs the way the frozen bench does.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import agraph_spark.operators.relations as relmod  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def resolve_mentions_old(mention_texts, entities, n_salts=None):
    j = relmod._conv_join(mention_texts, entities, n_salts)
    text, name = F.col("text"), F.col("name_norm")
    is_exact = text == name
    is_fuzzy = (
        (F.instr(name, text) > 0)
        | (F.instr(text, name) > 0)
        | (F.length(text) == 0)
    )
    j = j.where(is_exact | is_fuzzy).withColumn(
        "rank_exact", F.when(is_exact, 0).otherwise(1)
    )
    w = Window.partitionBy("conv_id", "text").orderBy("rank_exact", "entity_order")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "conv_id",
            "text",
            F.col("name_norm").alias("ent_norm"),
            F.col("entity_type").alias("ent_type"),
            F.col("entity_order").alias("ent_order"),
        )
    )


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "NEW"
    if variant == "OLD":
        relmod.resolve_mentions = resolve_mentions_old
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_resolve", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    entrymod._g(spark, sf_dir)[1].count()

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()

    t0 = time.time()
    build = build_kg(tdf)
    n = build.triples.count()
    t_build = round(time.time() - t0, 3)
    build.documents.unpersist()
    build.entities.unpersist()

    qs = entrymod.queries()
    t0 = time.time()
    n_doc = qs["kg_triples_docs"](spark, sf_dir).count()
    t_docs = round(time.time() - t0, 3)

    print(json.dumps({"variant": variant, "kg_build": t_build,
                      "kg_triples_docs": t_docs, "n_triples": n,
                      "n_doc_triples": n_doc}))


if __name__ == "__main__":
    main()
