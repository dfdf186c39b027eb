"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline workload: the full record-linkage pipeline (synth corpus →
extract → block → score → cluster) measured as docs/sec, plus
representative operator queries over the driver tables at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Env knobs:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     parallelism (default 32)
  BENCH_PAGES          synth corpus size for the pipeline (default 24000)
  BENCH_ONLY           comma-separated subset of query names
"""

from __future__ import annotations

import json
import os
import sys
import time


def _materialize(df) -> int:
    """Force full execution; noop sink avoids collect/driver cost."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "100000"))
    only = os.environ.get("BENCH_ONLY")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ai_data_matching_spark.session import build_session

    import __spark_entry__ as entry_mod

    extra = {"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-bench", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-bench"
    spark = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf=extra,
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        if only and name not in only.split(","):
            return
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # -- headline: full ER pipeline over a deterministic synth corpus -----
    def run_pipeline_bench() -> None:
        from ai_data_matching_spark.pipeline import run_pipeline
        from ai_data_matching_spark.synth import generate_pages

        pages = generate_pages(spark, n_pages, seed=42).drop("entity_id")
        pages = pages.repartition(cpus * 2).persist()
        n = pages.count()  # materialize input outside the timed window
        t0 = time.perf_counter()
        res = run_pipeline(spark, pages)
        _materialize(res.assigned)
        dt = time.perf_counter() - t0
        timings["er_pipeline"] = round(dt, 3)
        extras["er_pipeline_docs_per_sec"] = round(n / dt, 1)
        extras["er_pipeline_docs"] = n
        pages.unpersist()

    if not only or "er_pipeline" in only.split(","):
        run_pipeline_bench()

    # -- operator queries over the driver tables --------------------------
    qs = entry_mod.queries()
    for name in [
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "j3_fuzzy_scored_pairs",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "dedup_exact",
        "text_quality",
        "lang_id_heuristic",
        "ann_cosine_topk",
        "p7_currency_convert",
        "o2_top_event_per_user",
    ]:
        timed(name, lambda n=name: _materialize(qs[n](spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
