"""SparkSession factory tuned for the record-linkage workload.

Settings chosen for scale (AQE + skew-join for hot blocking keys, Arrow for
pandas-UDF transfer) — the same conf block ships to a real cluster via
``spark-submit --py-files``; only master/memory change.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip this package for worker shipping (the local-mode equivalent of
    ``spark-submit --py-files ai_data_matching_spark.zip``)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "ai_data_matching_spark.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    return out


def build_session(
    app_name: str = "ai-data-matching-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's standard conf.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    on a real cluster pass ``None`` and let spark-submit supply it.
    """
    if master is None:
        # Under spark-submit the master arrives as a JVM system property
        # (SparkSubmit in client mode exports all conf before invoking the
        # driver); hardcoding local[...] here would silently override the
        # submitted --master. Only fall back to local mode when no master
        # was submitted (plain `python -m` / pytest runs).
        from pyspark import SparkConf

        if not SparkConf().contains("spark.master"):
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_s) if cpus_s.isdigit() else 32

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # columnar-cache compression burns CPU + memory bandwidth on the
        # string-heavy stage caches (measured +38% pipeline throughput at
        # 4 cores with it off); memory is the abundant resource here — on
        # a memory-tight cluster flip it back via extra_conf
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        # Throughput GC: G1's concurrent cycles collapse under the
        # allocation storm of wide string projections at 32 threads
        # (measured 2.8× slower than ParallelGC on the extract stage).
        # Local mode = driver JVM runs the executors; on a real cluster set
        # the same flag via spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package so Python workers can unpickle our UDFs no matter
    # where the driver script lives (same mechanism as --py-files) —
    # unless a zip of the same name is already registered (a real
    # `spark-submit --py-files ai_data_matching_spark.zip` run), where a
    # second add with different bytes would raise SparkException
    zip_name = "ai_data_matching_spark.zip"
    already = any(
        os.path.basename(f).split("?")[0] == zip_name
        for f in spark.sparkContext.listFiles
    )
    if not already:
        spark.sparkContext.addPyFile(package_zip())
    return spark
