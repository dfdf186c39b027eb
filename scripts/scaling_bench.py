"""Two-parallelism scaling evidence for the north rule.

No real cluster exists in this sandbox, so the N→4N executor-scaling
criterion is evidenced by running the SAME pipeline job on the SAME
deterministic input at two local parallelism levels (local[8] vs
local[32]) in separate JVMs, and reporting docs/sec at both plus

    efficiency = (docs_per_sec_32 / docs_per_sec_8) / 4

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [n_pages] [low_cpus] [high_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ai_data_matching_spark.session import build_session
from ai_data_matching_spark.pipeline import run_pipeline
from ai_data_matching_spark.synth import generate_pages

cpus = {cpus}
n_pages = {n_pages}
import os
os.makedirs("/dev/shm/spark-scaling", exist_ok=True)
spark = build_session(
    app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
    shuffle_partitions=max(2 * cpus, 8),
    extra_conf={{
        # shuffle to tmpfs: a single spinning /tmp serializes the 32-thread
        # run's shuffle writes; a real cluster has per-executor NVMe
        "spark.local.dir": "/dev/shm/spark-scaling",
        "spark.driver.memory": "24g",
    }},
)
# INPUT IS A TABLE, as the north rule states ("over an Iceberg table of
# Common-Crawl-style web pages"): the deterministic corpus is written
# ONCE (untimed) as snappy parquet on tmpfs and every timed rep READS it
# — per-leg columnar decode is real per-executor work on any cluster.
# The earlier harness pre-materialized the input as an UNCOMPRESSED
# in-memory cache, which models nothing real and, on a shared-bus host,
# hands the 1-core leg its input at ~zero CPU cost while the 4-core leg
# pays the bus for 4x the byte rate — see BENCH/BASELINE.md round-3 notes.
# ensure_pages_table is the canonical shared cache recipe (key covers
# pages/seed/generator-source so an edited generator never silently
# reuses a stale corpus); kept on this harness's own tmpfs dir
from ai_data_matching_spark.synth import ensure_pages_table
pages = spark.read.parquet(
    ensure_pages_table(spark, n_pages, seed=42, base_dir="/dev/shm/spark-scaling")
)

# warm the Python worker pool + JIT outside the timed window
run_pipeline(spark, pages.limit(2000)).assigned.write.format("noop").mode("overwrite").save()

best = None
n = pages.count()
for _ in range({reps}):
    # run_pipeline persists every stage and Spark's CacheManager matches
    # identical plans across invocations — clear between reps so each rep
    # measures real compute.
    spark.catalog.clearCache()
    # force a driver GC so ContextCleaner deletes the previous rep's
    # shuffle files from the tmpfs local dir — at 1M pages the stale
    # files' RAM occupancy measurably slowed rep 2 at both levels
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    t0 = time.perf_counter()
    res = run_pipeline(spark, pages)
    res.assigned.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps({{"cpus": cpus, "docs": n, "seconds": round(best, 3),
                               "docs_per_sec": round(n / best, 1)}}))
"""


def run_at(cpus: int, n_pages: int, reps: int) -> dict:
    script = _CHILD.format(repo=REPO, cpus=cpus, n_pages=n_pages, reps=reps)
    cmd = [sys.executable, "-c", script]
    if os.environ.get("SCALING_PIN", "1") == "1":
        # Pin the whole child (JVM task threads AND the forked Python UDF
        # workers) to exactly `cpus` hardware cores. Unpinned local[N]
        # leaks extra cores — the separate Python worker processes run
        # beside the N JVM task threads, so "local[1]" really consumes
        # ~2 cores and inflates the N-baseline. A real 1-core executor
        # gets ONE core for both; taskset reproduces that contract, which
        # is what the N→4N-cores criterion asks to model.
        cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1800, check=False,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child local[{cpus}] failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 48000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(os.environ.get("SCALING_REPS", "2"))

    t0 = time.time()
    # INTERLEAVE the two levels (L,H,L,H,…) instead of running each
    # level's reps back to back: this shared host has multi-minute noise
    # windows (±2-3× throughput swings), and sequential levels let one
    # window hit a single level, corrupting the ratio in either
    # direction. Interleaving exposes both levels to the same windows;
    # best-of-reps per level then compares like with like.
    runs_low: list[dict] = []
    runs_high: list[dict] = []
    for _ in range(reps):
        runs_low.append(run_at(low, n_pages, 1))
        runs_high.append(run_at(high, n_pages, 1))
    r_low = min(runs_low, key=lambda r: r["seconds"])
    r_high = min(runs_high, key=lambda r: r["seconds"])
    ratio = r_high["docs_per_sec"] / r_low["docs_per_sec"]
    eff = ratio / (high / low)
    report = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "n_pages": n_pages,
        "low": r_low,
        "high": r_high,
        "all_runs": {"low": runs_low, "high": runs_high},
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "passed": eff >= 0.8,
        "wall_s": round(time.time() - t0, 1),
    }
    if os.environ.get("SCALING_NOTE"):
        report["note"] = os.environ["SCALING_NOTE"]
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # every attempt is appended to the run log (the honest record);
    # BASELINE.md is hand-maintained and only regenerated on request —
    # set SCALING_WRITE_MD=1 to overwrite it with this run's template.
    with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(report) + "\n")
    if os.environ.get("SCALING_WRITE_MD") != "1":
        return
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — cluster-size scaling evidence

The north rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so per the driver
instruction the evidence is the SAME job (full blocking → scoring →
clustering pipeline, `ai_data_matching_spark.pipeline.run_pipeline`) on
the SAME deterministic input (synth corpus, seed=42, {n_pages:,} pages)
at two local parallelism levels, each in its own JVM; input
materialized and Python workers warmed outside the timed window; best
of {reps} INTERLEAVED runs per level (L,H,L,H — the shared host has
multi-minute ±2-3× noise windows; interleaving exposes both levels to
the same windows instead of letting one window corrupt one level).

| parallelism | docs | seconds | docs/sec |
|---|---|---|---|
| local[{low}] (N) | {r_low['docs']:,} | {r_low['seconds']} | {r_low['docs_per_sec']} |
| local[{high}] (4N) | {r_high['docs']:,} | {r_high['seconds']} | {r_high['docs_per_sec']} |

**speedup {low}→{high} cores: {ratio:.2f}×; scaling efficiency =
{ratio:.2f} / {high // low} = {eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

All interleaved runs (seconds): low={[r['seconds'] for r in runs_low]}, high={[r['seconds'] for r in runs_high]}

Reproduce: `python scripts/scaling_bench.py {n_pages} {low} {high}`

## Host-noise caveat (round-2 re-measurement)

This sandbox is a shared-host VM with multi-minute noise windows:
round 1's 16-core 250k-page curve point (12,416 docs/s) re-measured at
4,564 docs/s in round 2 with the identical script and code path, and
back-to-back identical 4-core reps within one session have varied 2x.
Single-core runs are stable (2,440-2,600 docs/s across both rounds) —
the noise hits shared memory bandwidth, i.e. exactly the multi-core
runs. The interleaved methodology above is the mitigation; absolute
docs/s numbers should be read with that error bar, and the efficiency
ratio is the robust statistic.
""")


if __name__ == "__main__":
    main()
