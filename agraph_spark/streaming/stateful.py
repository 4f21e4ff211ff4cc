"""Custom stateful streaming operator via applyInPandasWithState.

First-seen dedup across the STREAM'S LIFETIME: the watermark/session
operators (windows.py) bound state by event time, but incremental KG
construction also needs "emit an entity/triple only the first time this
conversation produces it" — state that lives as long as the conversation,
across micro-batches and query restarts (checkpointed). That is exactly
Spark's arbitrary-stateful-processing slot: per-group state updated one
Arrow batch at a time (never per-row Python).

Reference counterpart: the incremental builder's seen-set
(/root/reference/agraph/builders/llm_builders.py:616-649 upsert semantics);
here the set is per-key distributed state, bounded by ``max_state`` per key
(a monster conversation cannot grow one executor's state without limit —
beyond the cap new values are emitted at most once per micro-batch with
``truncated=true``; consumers must dedup truncated rows across batches)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def stateful_first_seen(
    grouped_stream: DataFrame,
    key_col: str = "conv_id",
    value_col: str = "name_norm",
    max_state: int = 100_000,
) -> DataFrame:
    """(key, value) rows -> only first-ever occurrence of each value per
    key, across micro-batches. State: the per-key seen-set (array<string>),
    checkpoint-recovered on restart."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, {value_col} string, truncated boolean"
    state_schema = "seen array<string>"

    def fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        # Past the cap the persistent set stops growing, so first-seen
        # degrades to "first seen per MICRO-BATCH" for overflow values: the
        # batch-local set below dedups within the batch, and each emitted
        # overflow row carries truncated=true so downstream consumers know
        # those rows need a batch-spanning dedup of their own. (Silently
        # re-emitting every occurrence — the round-2 behavior — inverted the
        # contract to pass-through; ADVICE r2.)
        batch_seen: set[str] = set()
        new_vals: list[str] = []
        flags: list[bool] = []  # per-ROW: only overflow rows carry true
        for pdf in pdfs:
            for v in pdf[value_col].dropna():
                if v in seen or v in batch_seen:
                    continue
                if len(seen) >= max_state:
                    batch_seen.add(v)
                    new_vals.append(v)
                    flags.append(True)
                    continue
                seen.add(v)
                new_vals.append(v)
                flags.append(False)
        state.update((sorted(seen),))
        if new_vals:
            yield pd.DataFrame(
                {key_col: key[0], value_col: new_vals, "truncated": flags}
            )

    return grouped_stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_first_seen_stream(
    spark,
    input_dir: str,
    out_dir: str,
    schema: str = "conv_id string, name_norm string",
    key_col: str = "conv_id",
    value_col: str = "name_norm",
    max_state: int = 100_000,
):
    """File-source wiring: appends under input_dir -> first-seen rows
    appended to out_dir/rows, state under out_dir/_checkpoint (restart
    resumes the seen-sets from the checkpoint)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = stateful_first_seen(stream, key_col, value_col, max_state)
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/rows")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
