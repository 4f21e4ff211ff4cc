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


def _store_exists(spark: SparkSession, store_dir: str) -> bool:
    """Store-existence via the Hadoop FileSystem API so HDFS/S3 paths work
    (os.path.exists only sees the driver-local filesystem); falls back to
    os.path for sessions without a JVM (e.g. Spark Connect)."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(store_dir)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))
    except Exception:
        return os.path.exists(store_dir)


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


def merge_triples_into_store(
    spark: SparkSession,
    new_triples: DataFrame,
    store_dir: str,
    n_buckets: int = 64,
) -> None:
    """MERGE a batch of triples into a bucket-partitioned parquet store:
    the parquet expression of Iceberg ``MERGE INTO`` (SURVEY §1.2 / F6).

    The store is hash-partitioned on conv_id into ``n_buckets`` directory
    partitions; a merge reads ONLY the buckets the new batch touches,
    combines on the content key (conv, subj, pred, obj — content-hash ids
    make re-processing idempotent), and dynamically overwrites just those
    partitions. At 100 TB the rewrite cost is proportional to the touched
    buckets, not the store; with an Iceberg catalog the same call becomes a
    single MERGE INTO and this function is the documented fallback."""
    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    new = new_triples.withColumn("bucket", bucket)
    merged = new
    if _store_exists(spark, store_dir):
        affected = [r.bucket for r in new.select("bucket").distinct().collect()]
        cur = spark.read.parquet(store_dir).where(F.col("bucket").isin(affected))
        merged = cur.unionByName(new.where(F.col("bucket").isin(affected)))
    # first-seen lineage = smallest NUMERIC batch id, not lexicographic min
    # ('stream_batch=10' < 'stream_batch=2' as strings); non-numeric lineage
    # tags sort after every numbered batch.
    lineage_ord = F.coalesce(
        F.regexp_extract("lineage", r"(\d+)\s*$", 1).cast("long"),
        F.lit(2**62),
    )
    merged = merged.groupBy("conv_id", "subj", "pred", "obj", "bucket").agg(
        F.max("conf").alias("conf"),
        F.min_by("lineage", lineage_ord).alias("lineage"),
    )
    # sever lineage from the store files before overwriting them (parquet
    # has no transactional swap; Iceberg MERGE INTO makes this atomic)
    merged = merged.localCheckpoint()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(store_dir)
    )


def process_microbatch_merge(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    n_buckets: int = 64,
    triples_fn=None,
) -> None:
    """foreachBatch body with write-time MERGE: batch pipeline on the
    micro-batch, then upsert into the bucket-partitioned store — the
    reference's StreamingLLMGraphBuilder update loop
    (llm_builders.py:1406-1533) with Spark's exactly-once foreachBatch.

    ``triples_fn`` (transcripts batch -> (conv_id, subj, pred, obj, conf)
    frame) swaps the extraction step while keeping the whole MERGE
    machinery; the default is the full batch pipeline. An SQL-expressible
    triples_fn makes the stream's final state oracle-certifiable
    (f6_stream_merge_md5) — the regex pipeline itself is not."""
    if batch_df.isEmpty():
        return
    if triples_fn is not None:
        new = triples_fn(batch_df).withColumn(
            "lineage", F.lit(f"stream_batch={batch_id}")
        )
        merge_triples_into_store(batch_df.sparkSession, new, store_dir, n_buckets)
        return
    build = build_kg(batch_df, cache_documents=True)
    new = build.triples.withColumn("lineage", F.lit(f"stream_batch={batch_id}"))
    merge_triples_into_store(batch_df.sparkSession, new, store_dir, n_buckets)
    build.documents.unpersist()
    build.entities.unpersist()


def start_transcript_merge_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    trigger_once: bool = True,
    n_buckets: int = 64,
    triples_fn=None,
):
    """readStream -> foreachBatch(batch pipeline) -> MERGE loop. The store
    at out_dir/triples_store is directly readable (no read-time dedup
    needed — merges keep it unique on the content key). ``triples_fn``
    forwards to process_microbatch_merge (swap the extraction step,
    keep the MERGE machinery)."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    store = os.path.join(out_dir, "triples_store")
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: process_microbatch_merge(
                df, bid, store, n_buckets, triples_fn=triples_fn
            )
        )
        .option("checkpointLocation", os.path.join(out_dir, "_merge_checkpoint"))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
