"""Incremental / streaming KG construction.

The reference's "streaming" builders are batch-incremental appends with
simple dedup (StreamingLLMGraphBuilder, llm_builders.py:1331-1533;
IncrementalBuilderMixin, mixins.py:286-383). The Spark-native restatement
is Structured Streaming over transcript appends with ``foreachBatch``
reusing the EXACT batch pipeline per micro-batch, then an idempotent merge
into the triple store:

- content-hash ids (materialize.py) make merges idempotent: re-processing a
  conversation yields the same rows, so "merge" degrades to
  append + downstream dropDuplicates on content keys;
- per-batch lineage column = the micro-batch id (F6's doc_id registry
  becomes a plain column; removing a conversation = DELETE WHERE conv_id,
  which parquet expresses as partition rewrite and Iceberg as DELETE).

Watermarking note: extraction is per-conversation and conversations arrive
whole in this design (the driver contract's input is an at-rest table); for
turn-level trickle ingestion, group with ``session_window(ts, gap)`` per
conv_id and a watermark on ts before reassembly — left as the documented
extension point since the reference has no late-data semantics to match.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import build_kg
from ..schemas import TRANSCRIPTS


def process_microbatch(batch_df: DataFrame, batch_id: int, out_dir: str) -> None:
    """foreachBatch body: run the batch pipeline on the micro-batch and
    append triples with lineage = micro-batch id."""
    if batch_df.isEmpty():
        return
    build = build_kg(batch_df, cache_documents=True)
    (
        build.triples.withColumn("lineage", F.lit(f"stream_batch={batch_id}"))
        .write.mode("append")
        .parquet(os.path.join(out_dir, "triples_stream"))
    )
    build.documents.unpersist()
    build.entities.unpersist()


def start_transcript_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    trigger_once: bool = True,
):
    """File-source stream over transcript parquet appends -> foreachBatch
    incremental extraction. ``trigger_once`` drains available input and
    stops (the testing/backfill mode); continuous mode just drops the
    trigger."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: process_microbatch(df, bid, out_dir)
        )
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streamed_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    """Global view over all streamed micro-batches, deduplicated on the
    content key (D8/D11 semantics: same triple from any batch collapses)."""
    df = spark.read.parquet(os.path.join(out_dir, "triples_stream"))
    return df.groupBy("conv_id", "subj", "pred", "obj").agg(
        F.max("conf").alias("conf"), F.min("lineage").alias("lineage")
    )
