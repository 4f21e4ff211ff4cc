"""Kill-and-resume evidence at bench scale (VERDICT r4 #7).

test_checkpoint.py proves resume correctness on small fixtures; this tool
proves it at the bench corpus scale with a REAL process kill (SIGKILL, not
a simulated raise): a clean run and a killed+resumed run over the same
3,000-conversation corpus must produce identical triple sets, and the
resume must actually skip completed batches (manifest-driven).

Usage:
  python tools/kill_resume_bench.py            # orchestrate both runs
  python tools/kill_resume_bench.py child OUT N_CONVS   # (internal)

Prints a summary table; paste the numbers into PLANS.md. Run on a quiet
host (load < ~2) if the wall-time overhead number matters.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("KR_N_CONVS", "3000"))
N_BATCHES = 8


def child(out_dir: str, n_convs: int) -> None:
    from agraph_spark.checkpoint import read_all_triples, run_checkpointed
    from agraph_spark.session import get_spark
    from agraph_spark.synth import transcripts_df

    spark = get_spark(app_name="kill_resume", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tdf = transcripts_df(spark, n_convs=n_convs, seed=42)
    results = run_checkpointed(spark, tdf, out_dir, n_batches=N_BATCHES)
    n_skipped = sum(1 for r in results if r.skipped)
    print(f"BATCHES: ran={N_BATCHES - n_skipped} skipped={n_skipped}", flush=True)
    rows = read_all_triples(spark, out_dir).select(
        "conv_id", "subj", "pred", "obj", "conf", "lineage").collect()
    digest = hashlib.md5(
        "\n".join(sorted(f"{r.conv_id}|{r.subj}|{r.pred}|{r.obj}|{r.conf}|{r.lineage}"
                         for r in rows)).encode()
    ).hexdigest()
    print(f"HASH: {digest} ROWS: {len(rows)}", flush=True)


def run_child(out_dir: str, kill_after: float | None = None):
    """Run the child; optionally SIGKILL it after ``kill_after`` seconds.
    Returns (wall_seconds, stdout_text, was_killed)."""
    t0 = time.time()
    # start_new_session so the child leads its own process group: the kill
    # must take down python AND its Spark JVM together, otherwise the
    # orphaned JVM keeps committing batches to out_dir concurrently with
    # the resume session (conflicting writes + contended timing).
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "child", out_dir, str(N_CONVS)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        start_new_session=True,
    )
    if kill_after is not None:
        time.sleep(kill_after)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        time.sleep(2.0)  # let the OS reap the group before the resume run
        return time.time() - t0, "", True
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}:\n{out}")
    return time.time() - t0, out, False


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], int(sys.argv[3]))
        return

    base = tempfile.mkdtemp(prefix="kill_resume_")
    clean_dir = os.path.join(base, "clean")
    kr_dir = os.path.join(base, "killed")
    try:
        t_clean, out_clean, _ = run_child(clean_dir)
        h_clean = [ln for ln in out_clean.splitlines() if ln.startswith("HASH")][0]
        print(f"clean run:  {t_clean:.1f}s  {h_clean}")

        # kill mid-run at ~45% of the clean wall time (several batches done,
        # several not), then resume in a brand-new process/session
        kill_at = max(10.0, 0.45 * t_clean)
        t_killed, _, _ = run_child(kr_dir, kill_after=kill_at)
        print(f"killed run: SIGKILL at {t_killed:.1f}s")
        t_resume, out_resume, _ = run_child(kr_dir)
        h_resume = [ln for ln in out_resume.splitlines() if ln.startswith("HASH")][0]
        batches = [ln for ln in out_resume.splitlines() if ln.startswith("BATCHES")][0]
        print(f"resume run: {t_resume:.1f}s  {batches}  {h_resume}")

        total_kr = t_killed + t_resume
        print(f"\nclean={t_clean:.1f}s  kill+resume={total_kr:.1f}s "
              f"overhead={(total_kr / t_clean - 1) * 100:.0f}%")
        ident = h_clean.split()[1] == h_resume.split()[1]
        print(f"triples identical: {ident}")
        if not ident:
            sys.exit(1)
        skipped = int(batches.split("skipped=")[1])
        if skipped == 0:
            print("WARNING: resume skipped 0 batches — kill landed before "
                  "any batch completed; rerun with a later kill point")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
