"""spark-submit entry point (cli.py): end-to-end run, outputs, resume,
incremental chaining — driven in-process through main(argv)."""

import json

from ai_data_matching_spark.cli import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    return json.loads(out)


def test_cli_run_outputs_and_resume(spark, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    argv = [
        "--synth-pages", "200", "--seed", "9",
        "--checkpoint-root", ckpt, "--output-prefix", out,
    ]
    s1 = _run(capsys, argv)
    assert s1["resumed_stages"] == [] and s1["fingerprint"]
    assigned = spark.read.parquet(f"{out}/assigned.parquet")
    assert assigned.count() > 0
    assert set(assigned.columns) == {"url", "warc_ts", "lang", "norm_domain", "cluster_id"}
    for name in ("clusters", "edges", "stats"):
        assert spark.read.parquet(f"{out}/{name}.parquet").count() > 0

    # killed-and-rerun with the same checkpoint root: every stage resumes
    s2 = _run(capsys, argv)
    assert set(s2["resumed_stages"]) >= {"extract", "blocked", "edges", "labels"}
    assert s2["fingerprint"] == s1["fingerprint"]

    # a changed config invalidates the fingerprint (no stale resume)
    s3 = _run(capsys, argv + ["--fuzzy-threshold", "0.9"])
    assert s3["resumed_stages"] == [] and s3["fingerprint"] != s1["fingerprint"]


def test_cli_incremental_chains_on_base(spark, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")
    base = _run(capsys, ["--synth-pages", "150", "--seed", "3", "--checkpoint-root", ckpt])

    # fold a different synth slice as a new batch; chain on the base run
    inc = _run(
        capsys,
        ["--synth-pages", "150", "--seed", "4", "--checkpoint-root", ckpt,
         "--incremental-batch", "b1"],
    )
    assert inc["fingerprint"] and inc["fingerprint"] != base["fingerprint"]

    # next batch chains on b1's printed fingerprint — the cli contract
    inc2 = _run(
        capsys,
        ["--synth-pages", "150", "--seed", "5", "--checkpoint-root", ckpt,
         "--incremental-batch", "b2", "--prior-fingerprint", inc["fingerprint"]],
    )
    assert inc2["fingerprint"] not in (base["fingerprint"], inc["fingerprint"])


def test_cli_incremental_requires_checkpoint(capsys):
    rc = main(["--synth-pages", "50", "--incremental-batch", "b1"])
    assert rc == 2


def test_cli_backend_selection(spark, tmp_path):
    """--iceberg-catalog binds TableIO to the Iceberg adapter (ident
    plumbing only — no jar in this sandbox); default stays parquet."""
    from ai_data_matching_spark.cli import _make_io, _parse_args
    from ai_data_matching_spark.sources.tables import (
        IcebergSnapshotBackend,
        ParquetSnapshotBackend,
    )

    root = str(tmp_path / "ck")
    args = _parse_args(["--synth-pages", "10", "--checkpoint-root", root])
    assert isinstance(_make_io(spark, args).backend, ParquetSnapshotBackend)

    args = _parse_args(
        ["--synth-pages", "10", "--checkpoint-root", root,
         "--iceberg-catalog", "prod", "--iceberg-namespace", "er"]
    )
    be = _make_io(spark, args).backend
    assert isinstance(be, IcebergSnapshotBackend)
    assert be.table_ident("blocked", "x1") == "prod.er.blocked_x1"

    assert _make_io(spark, _parse_args(["--synth-pages", "10"])) is None


def test_cli_rejects_zero_synth_pages(tmp_path):
    """--synth-pages 0 must fail with a clear message, not fall through to
    the --input branch and crash on args.input=None."""
    import pytest

    with pytest.raises(SystemExit, match="synth-pages"):
        main([
            "--synth-pages", "0",
            "--checkpoint-root", str(tmp_path / "c"),
            "--output-prefix", str(tmp_path / "o"),
        ])
