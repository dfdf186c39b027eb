"""Continuous ER: file drops stream into the committed entity state via
foreachBatch + incremental fold; the final clustering equals the batch
recompute over everything dropped (streaming/resolve.py contract)."""

from pyspark.sql import functions as F

from ai_data_matching_spark.pipeline import PipelineConfig, run_pipeline
from ai_data_matching_spark.sources.tables import TableIO
from ai_data_matching_spark.streaming.resolve import (
    latest_state_fingerprint,
    resolve_stream,
)

CFG = PipelineConfig(best_match_only=False)
COLS = ["url", "warc_ts", "html", "text", "lang"]


def _partition(assigned) -> set[frozenset]:
    by_cluster: dict[str, set] = {}
    for r in assigned.select("url", "cluster_id").collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["url"])
    return {frozenset(v) for v in by_cluster.values()}


def test_drops_fold_into_committed_state(spark, pages_small, tmp_path):
    pages = pages_small.drop("entity_id").select(*COLS)
    drops = str(tmp_path / "drops")
    io = TableIO(str(tmp_path / "snaps"))
    ckpt = str(tmp_path / "ckpt")

    # drop 1 → bootstrap epoch (full pipeline commit)
    first = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) != 0)
    first.write.parquet(drops)
    resolve_stream(spark, drops, io, ckpt, cfg=CFG)
    fp1 = latest_state_fingerprint(io)
    assert fp1 is not None

    # drop 2 → incremental epoch chained on the committed state; the
    # stream checkpoint must make it process ONLY the new file
    second = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
    second.write.mode("append").parquet(drops)
    resolve_stream(spark, drops, io, ckpt, cfg=CFG)
    fp2 = latest_state_fingerprint(io)
    assert fp2 != fp1

    # each fold must release its persist_tracked handles before the next
    # epoch — a long-running stream otherwise accumulates one fold's
    # worth of cached blocks per epoch, unbounded
    from ai_data_matching_spark.cache import _PERSISTED

    assert _PERSISTED == []

    # incremental epochs commit DELTAS; the full state is a chain view
    labels = io.read_state(spark, "labels", fp2)
    blocked = io.read_state(spark, "blocked", fp2)
    from ai_data_matching_spark.operators.clustering import cluster_assignments

    assigned = cluster_assignments(blocked.select("url"), labels)
    want = run_pipeline(spark, pages, cfg=CFG)
    assert _partition(assigned) == _partition(want.assigned)

    # no pending files → draining again commits nothing new
    resolve_stream(spark, drops, io, ckpt, cfg=CFG)
    assert latest_state_fingerprint(io) == fp2
