"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the same KG-construction job is
run at two parallelism levels — local[N] and local[4N] — on the SAME input
(deterministic synthetic transcripts, fixed seed), and we report throughput
at both plus scaling efficiency:

    eff = throughput(4N) / (4 * throughput(N)) = T_N / (4 * T_4N)

Each level runs in its own subprocess (one JVM per master). The timed
section covers the pipeline actions only (input synthesis is driver-side
and identical at both levels). Results are appended to BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_convs] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(cpus: int, n_convs: int) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cpus), str(n_convs)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def child(cpus: int, n_convs: int) -> None:
    sys.path.insert(0, REPO)
    from agraph_spark.pipeline import build_kg
    from agraph_spark.session import get_spark
    from agraph_spark.synth import transcripts_df

    # shuffle partitions = cores: at this corpus size partitions are ~1MB,
    # far below the 128MB-class sizing a production run would use; extra
    # partitions only add per-task overhead (measured: 128 partitions is
    # 2x slower than 32 at local[32] on the same input)
    spark = get_spark(
        app_name=f"agraph_scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from agraph_spark.caching import release_caches

    tdf = transcripts_df(spark, n_convs=n_convs, seed=42).persist()
    n_turns = tdf.count()  # materialize input before the timed section
    # steady-state warmup: spin up python workers / JIT on a small slice so
    # the timed section measures throughput, not process cold-start
    warm = transcripts_df(spark, n_convs=200, seed=1)
    build_kg(warm, cache_documents=False).triples.count()
    # min-of-k: shared-host noise swings a single wall measurement ~20%
    # (measured 54-70 s for identical local[8] runs); the minimum estimates
    # the code's capability rather than the host's worst hiccup
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    times = []
    for _ in range(repeats):
        release_caches(spark)
        t0 = time.time()
        build = build_kg(tdf)
        n_triples = build.triples.count()
        times.append(time.time() - t0)
    dt = min(times)
    print(json.dumps({
        "cpus": cpus,
        "n_convs": n_convs,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "sec": round(dt, 3),
        "all_secs": [round(t, 3) for t in times],
        "triples_per_sec": round(n_triples / dt, 1),
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    # default N=2 (so 4N=8): both levels stay far below the 32-core host's
    # saturation point — see BENCH/BASELINE.md for the full curve & analysis
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    r_n = run_child(n, n_convs)
    r_4n = run_child(4 * n, n_convs)
    assert r_n["n_triples"] == r_4n["n_triples"], "parallelism changed the result!"
    eff = r_n["sec"] / (4.0 * r_4n["sec"])
    report = {
        "job": "kg_build_transcripts",
        "n_convs": n_convs,
        "n_turns": r_n["n_turns"],
        "n_triples": r_n["n_triples"],
        f"local[{n}]": {"sec": r_n["sec"], "triples_per_sec": r_n["triples_per_sec"]},
        f"local[{4*n}]": {"sec": r_4n["sec"], "triples_per_sec": r_4n["triples_per_sec"]},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    md = (
        f"\n## Scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
        f"Same job (full KG build over {n_convs} synthetic conversations, "
        f"{r_n['n_turns']} turns, seed 42), same input, two parallelism levels:\n\n"
        f"| level | wall sec | triples/sec |\n|---|---|---|\n"
        f"| local[{n}] | {r_n['sec']} | {r_n['triples_per_sec']} |\n"
        f"| local[{4*n}] | {r_4n['sec']} | {r_4n['triples_per_sec']} |\n\n"
        f"triples emitted (identical at both levels): {r_n['n_triples']}\n\n"
        f"**scaling efficiency = T_N / (4 x T_4N) = {round(eff, 3)}**\n"
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
