"""Conversation reassembly: transcripts -> per-conversation documents.

north_star requirement: "reassembles conversations via window-ordered turn
grouping (stable sort on turn_idx with per-turn text equality preserved)".

Implemented fully with built-in expressions (no UDF): collect per-conv
structs, ``array_sort`` on (turn_idx, ts) — a stable total order because
turn_idx is unique within a conversation — then project turn texts and join
with a newline. The reference consumes ``texts: List[str]`` where each text
is one document (agraph/builders/interfaces.py:23-40); we define one
document per conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SEPARATOR = "\n"


def reassemble_conversations(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts) -> (conv_id, text, n_turns).

    Shuffles once on conv_id (the pipeline's partitioning key); every
    downstream per-conversation op reuses this partitioning.
    """
    return (
        transcripts
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                TURN_SEPARATOR,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "ts", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("text"),
            F.count("*").cast("int").alias("n_turns"),
        )
    )
