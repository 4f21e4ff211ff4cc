"""Round-6b: time each eager job inside the bench's kg_build path
(kernel cache count, pattern res count, cooccurrence hits count, final
triples count), cold and warm, in one session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agraph_spark.caching import release_caches, track  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exp_build_stages", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    release_caches(spark)

    tdf = transcripts_df(spark, n_convs=3000, seed=42).persist()
    tdf.count()

    from agraph_spark.operators.fused import extract_documents_fused
    from agraph_spark.operators.reassemble import reassemble_conversations
    from agraph_spark.operators.relations import (
        cooccurrence_relations,
        pattern_relations,
        split_sentences,
        to_triples,
        validate_relations,
        resolve_mentions,
        _conv_join,
    )

    def t(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        print(f"  {name:34s} {time.time()-t0:8.3f}", flush=True)
        sc.setJobDescription(None)
        return out

    for i in range(2):
        print(f"--- pass {i} ---", flush=True)
        extracted = track(extract_documents_fused(reassemble_conversations(tdf)))
        t("kernel cache count", extracted.count)
        documents = extracted.select("conv_id", "text")
        entities = extracted.select("conv_id", F.explode("ents").alias("e")).select(
            "conv_id", "e.name", "e.name_norm", "e.entity_type", "e.confidence",
            "e.entity_order")
        candidates = extracted.select("conv_id", F.explode("cands").alias("c")).select(
            "conv_id", "c.pred", "c.head_text", "c.tail_text")

        # pattern_relations internals
        texts = (candidates.select("conv_id", F.col("head_text").alias("text"))
                 .unionByName(candidates.select("conv_id", F.col("tail_text").alias("text")))
                 .distinct())
        res = track(resolve_mentions(texts, entities, None))
        t("pattern res cache count", res.count)

        # cooccurrence internals
        sents = split_sentences(documents)
        hits = _conv_join(sents, entities, None).where(
            F.instr(F.col("sent"), F.col("name_norm")) > 0
        ).select("conv_id", "sent_idx", "name_norm", "entity_type", "entity_order")
        hits = track(hits)
        t("cooccur hits cache count", hits.count)

        pat = pattern_relations(candidates, entities)   # re-runs res internally (tracked fresh)
        coo = cooccurrence_relations(documents, entities)
        tr = to_triples(validate_relations(pat.unionByName(coo)))
        t("triples count (all warm)", tr.count)
        release_caches(spark)


if __name__ == "__main__":
    main()
