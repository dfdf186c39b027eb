"""Property-based check of the fold's re-crawl classification matrix.

The handcrafted tests pin one scenario per branch (new / replay /
refresh / changed / stale — tests/test_incremental.py); this generates
random MIXES of them — re-crawls with and without content changes,
out-of-order deliveries, within-batch duplicates, batch-only urls — and
asserts the contract invariants against a full recompute of the same
events:

1. ROW EQUALITY: the fold's assigned (url, warc_ts) set equals the
   recompute's — latest-crawl-wins picks the same surviving row per url
   on both paths, including the 'refresh' timestamp advance and the
   'stale' drop.
2. MONOTONE REFINEMENT: every recompute cluster is contained in some
   fold cluster — the fold never retracts prior edges (documented
   divergence), so it can only be coarser, never split or cross-assign.
3. EXACT EQUALITY when no re-crawled url changed content — with no
   'changed' rows the monotone divergence cannot trigger, so the fold
   must reproduce the recompute's clustering exactly.
"""

import datetime as dt
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_data_matching_spark.operators.incremental import run_incremental
from ai_data_matching_spark.pipeline import PipelineConfig, run_pipeline
from ai_data_matching_spark.sources.tables import TableIO

CFG = PipelineConfig(best_match_only=False)

URLS = [f"http://{d}.example.com/{i}" for d in "abc" for i in (1, 2, 3)]
BODIES = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",
    "one two three four five six seven eight nine ten eleven twelve",
    "totally different unrelated words appear here instead now always",
    "the quick brown fox jumps over the lazy dog repeatedly each day",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",  # dup of 0 → cross-url exact pairs
]
SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _row(url_i: int, day: int, body_i: int):
    body = BODIES[body_i]
    html = f"<html><body><p>{body}</p></body></html>".encode()
    ts = dt.datetime(2026, 1, 1) + dt.timedelta(days=day)
    return (URLS[url_i], ts, html, None, "en")


def _partition(assigned) -> set[frozenset]:
    by_cluster: dict[str, set] = {}
    for r in assigned.select("url", "cluster_id").collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["url"])
    return {frozenset(v) for v in by_cluster.values()}


_event = st.tuples(
    st.integers(0, len(URLS) - 1),
    st.integers(0, 20),
    st.integers(0, len(BODIES) - 1),
)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    base_events=st.lists(_event, min_size=3, max_size=7, unique_by=lambda e: e[0]),
    batch_events=st.lists(_event, min_size=1, max_size=7),
)
def test_fold_matches_recompute_under_random_recrawl_mix(
    spark, base_events, batch_events
):
    # Same-timestamp re-crawls with DIFFERENT content are deliberately
    # left in: since 2026-08-19 the within-corpus max-struct rule
    # (blocking.latest_crawl_wins) and the cross-state classify rule
    # (operators/incremental.py) break such ties on the SAME key —
    # (warc_ts, lang, norm_domain, xxhash64(norm_text), simhash) — so
    # the property now covers them too, alongside changes across days,
    # replays, refreshes, and out-of-order deliveries.
    base = spark.createDataFrame([_row(*e) for e in base_events], SCHEMA)
    batch = spark.createDataFrame([_row(*e) for e in batch_events], SCHEMA)

    root = tempfile.mkdtemp(prefix="hyp-inc-")
    try:
        io = TableIO(root)
        run_pipeline(spark, base, io=io, cfg=CFG)
        # fold the batch as TWO chained epochs when it has ≥2 events —
        # re-crawl classification must hold across fold boundaries too
        # (a url can be new in epoch 1 and re-crawled in epoch 2)
        half = len(batch_events) // 2
        if half:
            b1 = spark.createDataFrame([_row(*e) for e in batch_events[:half]], SCHEMA)
            first = run_incremental(spark, b1, io, "hb0", cfg=CFG)
            b2 = spark.createDataFrame([_row(*e) for e in batch_events[half:]], SCHEMA)
            fold = run_incremental(
                spark, b2, io, "hb1", cfg=CFG, prior_fingerprint=first.fingerprint
            )
        else:
            fold = run_incremental(spark, batch, io, "hb1", cfg=CFG)
        recompute = run_pipeline(spark, base.unionByName(batch), cfg=CFG)

        fold_rows = {
            (r["url"], r["warc_ts"])
            for r in fold.assigned.select("url", "warc_ts").collect()
        }
        rec_rows = {
            (r["url"], r["warc_ts"])
            for r in recompute.assigned.select("url", "warc_ts").collect()
        }
        assert fold_rows == rec_rows

        fold_parts = _partition(fold.assigned)
        rec_parts = _partition(recompute.assigned)
        containing = {u: p for p in fold_parts for u in p}
        for part in rec_parts:
            anchor = next(iter(part))
            assert part <= containing[anchor], (part, containing[anchor])

        # no url ever changes content across any epoch ⇒ the monotone
        # divergence can't trigger ⇒ exact clustering equality
        bodies_by_url: dict[int, set] = {}
        for u, _d, b in base_events + batch_events:
            bodies_by_url.setdefault(u, set()).add(BODIES[b])
        changed = any(len(s) > 1 for s in bodies_by_url.values())
        if not changed:
            assert fold_parts == rec_parts
    finally:
        shutil.rmtree(root, ignore_errors=True)
