"""One-off scale smoke for the round-4 text-family training-data passes
— PII scrub and the composite Gopher quality filter — over the synth web
corpus read as a parquet table (the cli.py --input contract), mirroring
the span-family smoke methodology in BENCH/BASELINE.md.

Usage: python scripts/textops_scale_bench.py [n_pages] [cpus]
Prints one JSON line with per-pass wall seconds, docs/sec, and the
gopher filter's reason distribution (untimed) as a sanity check that the
rule chain discriminates at scale rather than collapsing to one branch.
(The filename deliberately matches the quiet-window supervisor's
foreground-busy pattern so a capture never fires into this run.)
"""

from __future__ import annotations



import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_data_matching_spark import synth
from ai_data_matching_spark.functions import pii
from ai_data_matching_spark.functions.text import gopher_quality_filter
from ai_data_matching_spark.session import build_session


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    extra = {"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")}
    pq_dir = "/dev/shm/spark-bench" if os.path.isdir("/dev/shm") else "/tmp/spark-bench"
    os.makedirs(pq_dir, exist_ok=True)
    extra["spark.local.dir"] = pq_dir
    spark = build_session(
        app_name="textops_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
        extra_conf=extra,
    )

    # canonical shared corpus cache (same path + layout as bench.py)
    path = synth.ensure_pages_table(spark, n_pages, seed=42, base_dir=pq_dir)
    pages = spark.read.parquet(path).select("url", "text")
    n = pages.count()
    out: dict = {"n_pages": n, "cpus": cpus}

    pii_df = pages.select(
        "url",
        pii.email_count(F.col("text")).alias("n_emails"),
        pii.ipv4_count(F.col("text")).alias("n_ipv4"),
        pii.phone_count(F.col("text")).alias("n_phones"),
        pii.scrub_pii(F.col("text")).alias("redacted"),
    )
    # explode-over-singleton barrier, same as the contract query: the
    # struct is computed once per row, field extraction is O(1)
    gq = pages.select(
        "url", F.explode(F.array(gopher_quality_filter(F.col("text")))).alias("g")
    ).select("url", "g.*")

    for name, df in [("pii_scrub", pii_df), ("gopher_filter", gq)]:
        _noop(df.limit(5000))  # warm the scan + JIT outside the window
        t0 = time.perf_counter()
        _noop(df)
        dt = time.perf_counter() - t0
        out[f"{name}_seconds"] = round(dt, 2)
        out[f"{name}_docs_per_sec"] = round(n / dt, 1)

    out["gopher_reasons"] = {
        r["reason"]: r["count"]
        for r in gq.groupBy("reason").count().collect()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
