"""Real ``spark-submit --py-files`` packaging run (north rule: the job
"ships as spark-submit --py-files"). The in-process CLI tests can't catch
packaging faults — a module missing from the zip, a UDF that unpickles
against a path only the repo checkout provides, a hardcoded master that
tramples the submitted one. This test builds the zip, writes a two-line
driver shim into a temp dir, strips PYTHONPATH, and runs the actual
``spark-submit`` binary from that dir — so the ONLY way any
``ai_data_matching_spark`` module reaches the driver or a Python worker
is through ``--py-files``, exactly as on a real cluster."""

import json
import os
import shutil
import subprocess
import sys

import pytest


def _find_spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    home = os.environ.get("SPARK_HOME")
    if home and os.path.exists(os.path.join(home, "bin", "spark-submit")):
        return os.path.join(home, "bin", "spark-submit")
    return None


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    spark_submit = _find_spark_submit()
    if spark_submit is None:
        pytest.skip("no spark-submit binary on this host")

    from ai_data_matching_spark.session import package_zip

    zip_path = tmp_path / "ai_data_matching_spark.zip"
    shutil.copy(package_zip(), zip_path)

    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        "from ai_data_matching_spark.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )

    ckpt, out = tmp_path / "ckpt", tmp_path / "out"
    env = dict(os.environ)
    # the package must be reachable ONLY via --py-files
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"

    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(driver),
            # no --master CLI flag: build_session must pick up the
            # SUBMITTED master from the JVM system properties
            "--synth-pages", "200", "--seed", "7",
            "--shuffle-partitions", "8",
            "--checkpoint-root", str(ckpt),
            "--output-prefix", str(out),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"

    summaries = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert summaries, f"no JSON summary in stdout:\n{proc.stdout[-2000:]}"
    summary = json.loads(summaries[-1])
    assert summary["fingerprint"]
    assert summary["resumed_stages"] == []

    # the submitted job's outputs are real parquet the engine can read back
    assigned = spark.read.parquet(str(out / "assigned.parquet"))
    n_assigned = assigned.count()
    assert 0 < n_assigned <= 200  # ≤: the pipeline dedups re-crawled urls
    assert assigned.filter(assigned.cluster_id.isNull()).count() == 0
    n_clusters = spark.read.parquet(str(out / "clusters.parquet")).count()
    assert 0 < n_clusters <= n_assigned
