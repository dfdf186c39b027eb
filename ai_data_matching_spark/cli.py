"""spark-submit entry point for the record-linkage pipeline.

Cluster form (the north-rule shipping contract; spark-submit takes a
driver SCRIPT, so ship a two-line shim that calls :func:`main` — see
tests/test_spark_submit.py, which runs this exact form for real):

    # driver.py:  import sys; from ai_data_matching_spark.cli import main
    #             sys.exit(main(sys.argv[1:]))
    spark-submit --master yarn --deploy-mode cluster \
        --py-files ai_data_matching_spark.zip driver.py \
        --input iceberg_catalog.db.pages --checkpoint-root s3://bkt/ckpt \
        --output-prefix iceberg_catalog.db.linkage

Local / sandbox form (no Iceberg jar; parquet-snapshot TableIO gives the
same commit/resume semantics):

    python -m ai_data_matching_spark.cli --synth-pages 10000 \
        --checkpoint-root /tmp/ckpt --output-prefix /tmp/out

A killed run re-invoked with the same --checkpoint-root and config
resumes from the last committed snapshot (stages are fingerprinted by
their config — see sources/tables.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def _parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="ai-data-matching-spark")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages table: parquet path or spark table name")
    src.add_argument(
        "--synth-pages", type=int, help="generate a deterministic synth corpus of N pages"
    )
    p.add_argument("--seed", type=int, default=42, help="synth corpus seed")
    p.add_argument("--checkpoint-root", help="TableIO root for stage snapshots + resume")
    p.add_argument(
        "--incremental-batch",
        metavar="BATCH_ID",
        help="treat the input as a NEW-page batch and fold it into the prior "
        "committed run at --checkpoint-root (operators/incremental.py); the "
        "summary prints this batch's fingerprint for the next batch to chain on",
    )
    p.add_argument(
        "--prior-fingerprint",
        help="state to chain on: omit for the base run's config fingerprint, "
        "or pass a previous batch's printed fingerprint",
    )
    p.add_argument("--output-prefix", help="write assigned/clusters/edges/stats here")
    p.add_argument(
        "--iceberg-catalog",
        help="bind stage snapshots to Iceberg tables in this configured "
        "catalog (spark.sql.catalog.<name> must be set on the session); "
        "default is parquet-dir snapshots under --checkpoint-root",
    )
    p.add_argument(
        "--iceberg-namespace",
        default="er_snapshots",
        help="namespace for snapshot tables under --iceberg-catalog",
    )
    p.add_argument("--fuzzy-threshold", type=float, default=None)
    p.add_argument("--max-block-size", type=int, default=None)
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def _make_io(spark, args: argparse.Namespace):
    """Checkpoint layer from CLI flags: parquet-dir snapshots by default,
    Iceberg tables when --iceberg-catalog names a configured catalog.
    (The manifest JSON lives under --checkpoint-root either way — see
    sources/tables.py module docstring.)"""
    from .sources.tables import TableIO

    if not args.checkpoint_root:
        if args.iceberg_catalog:
            raise SystemExit(
                "--iceberg-catalog requires --checkpoint-root (the manifest "
                "lives there); without it NO checkpointing would happen and "
                "the flag would be silently ignored"
            )
        return None
    backend = None
    if args.iceberg_catalog:
        from .sources.tables import IcebergSnapshotBackend

        backend = IcebergSnapshotBackend(
            spark, args.iceberg_catalog, args.iceberg_namespace
        )
    return TableIO(args.checkpoint_root, backend=backend)


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])

    from .pipeline import PipelineConfig, run_pipeline
    from .session import build_session

    spark = build_session(
        app_name="ai-data-matching-pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    if args.synth_pages is not None:
        if args.synth_pages <= 0:
            raise SystemExit("--synth-pages must be a positive page count")
        from .synth import generate_pages

        pages = generate_pages(spark, args.synth_pages, seed=args.seed).drop("entity_id")
    elif args.input.endswith(".parquet") or "/" in args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = spark.table(args.input)

    cfg_kwargs = {}
    if args.fuzzy_threshold is not None:
        cfg_kwargs["fuzzy_threshold"] = args.fuzzy_threshold
    if args.max_block_size is not None:
        cfg_kwargs["max_block_size"] = args.max_block_size
    cfg = PipelineConfig(**cfg_kwargs)

    io = _make_io(spark, args)
    t0 = time.perf_counter()
    if args.incremental_batch:
        if io is None:
            print("--incremental-batch requires --checkpoint-root", file=sys.stderr)
            return 2
        from .operators.incremental import run_incremental

        res = run_incremental(
            spark,
            pages,
            io,
            args.incremental_batch,
            cfg=cfg,
            prior_fingerprint=args.prior_fingerprint,
        )
    else:
        res = run_pipeline(spark, pages, io=io, cfg=cfg)

    if args.output_prefix:
        res.assigned.write.mode("overwrite").parquet(f"{args.output_prefix}/assigned.parquet")
        res.clusters.write.mode("overwrite").parquet(f"{args.output_prefix}/clusters.parquet")
        res.edges.write.mode("overwrite").parquet(f"{args.output_prefix}/edges.parquet")
        res.stats.write.mode("overwrite").parquet(f"{args.output_prefix}/stats.parquet")
    else:
        res.assigned.write.format("noop").mode("overwrite").save()

    stats = {r["key"] if "key" in r else i: r.asDict() for i, r in enumerate(res.stats.collect())}
    summary = {
        "seconds": round(time.perf_counter() - t0, 2),
        "resumed_stages": res.resumed_stages,
        "cc_iterations": res.cc_iterations,
        "fingerprint": res.fingerprint,
        "stats": stats,
    }
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
