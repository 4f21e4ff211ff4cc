"""Round-6 measurement harness (guide §1): per-query isolation for the
bench.py suite WITHOUT touching the frozen bench.py.

- times each query with the noop sink (computes every column, guide §1.4)
  and with .count() (the frozen bench's methodology), min/median of N;
- writes .explain("formatted") for each query to plans/r06/<name>_<tag>.txt;
- labels jobs via setJobDescription so any future UI/eventlog read maps
  stages to queries.

Usage:
  python bench_extra.py [--repeats 2] [--tag before] [--only q1,q2] \
      [--mode both|count|noop] [--skip-build]

Prints one JSON line per query plus a final summary line; stdout noise from
Spark is filtered by the caller (grep -vE "WARN|^\\[Stage").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from agraph_spark.pipeline import build_kg  # noqa: E402
from agraph_spark.session import get_spark  # noqa: E402
from agraph_spark.synth import transcripts_df  # noqa: E402

QUERY_NAMES = [
    "kg_triples_docs",
    "g_degree",
    "g_components",
    "g_bfs",
    "dd_ngram_jaccard",
    "dd_minhash",
    "v_cosine",
    "ev_sessionize",
    "tpch_q1",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--mode", default="count", choices=["both", "count", "noop"])
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--no-explain", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(args.only.split(",")) if args.only else None

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(
        app_name="agraph_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # identical warmup to bench.py
    build_kg(transcripts_df(spark, n_convs=200, seed=1), cache_documents=False).triples.count()
    entrymod._g(spark, sf_dir)[1].count()

    results: dict[str, dict] = {}

    def record(name, build_df):
        if only is not None and name not in only:
            return
        times: dict[str, list[float]] = {"count": [], "noop": []}
        if not args.no_explain:
            df = build_df()
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        for i in range(args.repeats):
            for mode in ("count", "noop"):
                if args.mode != "both" and mode != args.mode:
                    continue
                sc.setJobDescription(f"{name}[{mode}#{i}]")
                t0 = time.time()
                df = build_df()
                if mode == "count":
                    df.count()
                else:
                    noop(df)
                times[mode].append(round(time.time() - t0, 3))
                sc.setJobDescription(None)
        entry = {k: v for k, v in times.items() if v}
        for k, v in list(entry.items()):
            entry[k + "_min"] = min(v)
        results[name] = entry
        print(json.dumps({"q": name, **entry}), flush=True)

    n_convs = max(200, int(30000 * 0.1))
    if not args.skip_build and (only is None or {"kg_build_transcripts", "kg_link_entities"} & only):
        tdf = transcripts_df(spark, n_convs=n_convs, seed=42).persist()
        tdf.count()
        from agraph_spark.materialize import build_nodes
        from agraph_spark.operators.linking import link_entities

        for i in range(args.repeats):
            sc.setJobDescription(f"kg_build_transcripts[#{i}]")
            t0 = time.time()
            build = build_kg(tdf)
            n = build.triples.count()
            tb = round(time.time() - t0, 3)
            results.setdefault("kg_build_transcripts", {"count": []})["count"].append(tb)
            sc.setJobDescription(f"kg_link_entities[#{i}]")
            t0 = time.time()
            nmap = link_entities(build_nodes(build.entities)).count()
            tl = round(time.time() - t0, 3)
            results.setdefault("kg_link_entities", {"count": []})["count"].append(tl)
            build.documents.unpersist()
            build.entities.unpersist()
            sc.setJobDescription(None)
            print(json.dumps({"i": i, "kg_build": tb, "kg_link": tl,
                              "n_triples": n, "n_mappings": nmap}), flush=True)
        for k in ("kg_build_transcripts", "kg_link_entities"):
            if k in results:
                results[k]["count_min"] = min(results[k]["count"])

    qs = entrymod.queries()
    for name in QUERY_NAMES:
        record(name, lambda n=name: qs[n](spark, sf_dir))

    print(json.dumps({"summary": {
        k: v.get("count_min", v.get("noop_min")) for k, v in results.items()
    }}), flush=True)


if __name__ == "__main__":
    main()
