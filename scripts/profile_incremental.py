"""Per-phase profile of the incremental fold at bench scale.

Mirrors bench.py's _incremental_section (same corpus, same 10% batch,
same tmpfs snapshot root) but wraps every TableIO storage touch with a
wall-clock timer and prints a breakdown, so "where do the fold's seconds
go" is measured instead of guessed. Diagnostic only — never part of the
recorded bench artifact.

Usage: python scripts/profile_incremental.py [n_pages] [cpus] [split_denom]

``split_denom`` (default 10) sets the corpus:batch ratio — 1/denom of
the pages form the fold's batch, the rest the committed base. The bench
measures the 10%-batch floor; larger denominators evidence the delta
design's structural claim that speedup vs recompute GROWS with the
corpus:batch ratio (fold cost is O(batch)+floor, recompute is
O(corpus)).

Set SPARK_GRAFT_PROFILE_FOLD=1 to additionally force timed counts on the
edge stage's sub-frames (blocked view scan / touched-exact / candidate
pairs / scored pairs) — attribution INSIDE commit[edges_delta]. The
forced actions inflate the fold total, so never combine that flag with a
recorded measurement. Finding at 100k/16 (2026-08-19): the O(history)
blocked-view scan is ~0.35 s; candidate-generation joins ~2.2 s and the
touched-exact groupBy ~1.4 s dominate; the vectorized pair-scoring UDF
on ~17k pairs is ~0.3-0.5 s — the Python boundary is NOT the fold's
bottleneck, the candidate topology joins are.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SPLIT_DENOM = int(sys.argv[3]) if len(sys.argv) > 3 else 10

PHASES: list[tuple[str, float]] = []
MARKS: list[tuple[str, float, float]] = []  # (label, start, end) absolute


def timed(label: str, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    t1 = time.perf_counter()
    PHASES.append((label, t1 - t0))
    MARKS.append((label, t0, t1))
    return out


def main() -> None:
    from ai_data_matching_spark.cache import release_persisted
    from ai_data_matching_spark.operators.incremental import run_incremental
    from ai_data_matching_spark.pipeline import run_pipeline
    from ai_data_matching_spark.session import build_session
    from ai_data_matching_spark.sources.tables import TableIO
    from ai_data_matching_spark.synth import generate_pages
    from pyspark.sql import functions as F

    spark = build_session(
        app_name="profile-inc",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    shm = "/dev/shm/spark-bench"
    root = tempfile.mkdtemp(prefix="prof-inc-", dir=shm if os.path.isdir(shm) else None)
    io = TableIO(root)

    # instrument every storage touch
    # read_snapshot is lazy (returns an unexecuted scan) so timing it is
    # meaningless — its cost lands in whichever commit/action consumes it
    orig_commit, orig_metric = io.commit, io.write_metric

    def commit(df, stage, fingerprint, extra=None):
        return timed(f"commit[{stage}]", orig_commit, df, stage, fingerprint, extra=extra)

    def write_metric(df, stage, name):
        return timed(f"metric[{stage}/{name.rsplit('_', 1)[0]}]", orig_metric, df, stage, name)

    io.commit = commit
    io.write_metric = write_metric

    all_pages = generate_pages(spark, N_PAGES, seed=42).drop("entity_id")
    is_batch = F.pmod(F.xxhash64("url"), F.lit(SPLIT_DENOM)) == 0
    base = all_pages.filter(~is_batch).persist()
    n_base = base.count()
    # warm python workers
    run_pipeline(spark, all_pages.limit(2000), io=None).assigned.count()
    release_persisted()
    spark.catalog.clearCache()
    # clearCache deregistered base's persist — re-register and refill so
    # the timed anchor reads cached pages instead of regenerating synth
    base.persist().count()

    t0 = time.perf_counter()
    run_pipeline(spark, base, io=io)
    t_base = time.perf_counter() - t0
    base.unpersist()
    release_persisted()
    spark.catalog.clearCache()
    PHASES.clear()  # only profile the fold
    MARKS.clear()

    batch = all_pages.filter(is_batch).persist()
    n_batch = batch.count()
    t0 = time.perf_counter()
    inc = run_incremental(spark, batch, io, "prof-b1")
    t_mid = time.perf_counter()
    n_assigned = inc.assigned.count()
    t_tail = time.perf_counter() - t_mid
    dt = time.perf_counter() - t0
    batch.unpersist()

    print(f"\nbase: {n_base} docs in {t_base:.2f}s | fold: {n_batch} docs in {dt:.2f}s")
    print(f"assigned materialize (post-return): {t_tail:.2f}s ({n_assigned} rows)")
    acc = 0.0
    prev_end = t0
    for (label, secs), (_, s, e) in zip(PHASES, MARKS):
        acc += secs
        print(f"  {label:<40s} {secs:7.2f}s   (+{s - prev_end:5.2f}s gap before)")
        prev_end = e
    print(f"  {'(tail gap to return)':<40s} {t_mid - prev_end:7.2f}s")
    print(f"  {'(storage-touch total)':<40s} {acc:7.2f}s")
    print(f"  {'(untimed remainder: joins/metrics/CC)':<40s} {dt - t_tail - acc:7.2f}s")
    anchor = t_base * ((n_base + n_batch) / n_base)
    print(f"speedup vs recompute anchor: {anchor / dt:.2f}x (anchor {anchor:.2f}s)")

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
