"""Incremental entity resolution: fold a batch of NEW pages into a prior
committed run without regenerating or rescoring old-old pairs.

A web-scale corpus is append-mostly: each crawl adds a slice while the
resolved history (blocked sketches + pair graph) is already committed as
snapshots (sources/tables.TableIO — the engine's Iceberg-contract
checkpoint layer). Re-running the full pipeline over history ∪ batch
re-scores O(history) pairs to add O(batch) new ones. This module scores
only pairs that TOUCH the new batch:

* blocking — the batch is sketched with the same fused Arrow kernel and
  classified against the committed state BY CONTENT: older-or-equal
  byte-identical replays are dropped (no-op), NEWER byte-identical
  re-crawls refresh the stored metadata (warc_ts advances, no rescore),
  re-crawls with changed content REPLACE the prior row (latest crawl
  wins) and are rescored, stale out-of-order crawls are dropped;
  everything kept is unioned with the surviving prior ``blocked``
  snapshot under an ``_is_new`` flag (False for refreshes). Hot-key
  (skew) exclusion is computed over the UNION block sizes, i.e. the
  same cap decisions a full recompute over history ∪ batch would make
  for the new pairs. Per-batch ingest counts (new / changed /
  refreshed / dropped) ride the fused per-fold ``batch_metrics_*``
  frame (one metric action per fold).
* candidate generation — an asymmetric equi-join: new-side keys against
  all-side keys, so old-old pairs are never materialized. Orientation,
  Hamming prefilter, cross-key dedup and payload attach are shared with
  ``blocking.candidate_pairs`` semantics (url_a < url_b contract).
* exact phase — (norm_domain, simhash) groups that gained ≥1 new member
  re-emit star edges for ALL their members → union-group rep, so a new
  page joining a previously-singleton group links the old member too.
* clustering — connected components over prior edges ∪ new edges. Edges
  are only ever ADDED, so incremental clustering is monotone: pages
  co-clustered before stay co-clustered after (the standard contract
  for incremental ER). With ``best_match_only=False`` and no block
  crossing the size cap between runs, the result is EXACTLY the full
  recompute's clustering (tests/test_incremental.py asserts equality).
  With top-1 edge selection the per-batch argmax can keep a different
  (never a missing) edge than the global argmax would — documented
  divergence, clusters only coarsen.

Each batch commits ``blocked_delta`` / ``edges_delta`` /
``labels_delta`` snapshots under a batch-derived fingerprint — each
O(batch / touched), never a rewrite of the O(history) state. The full
state view is reconstructed on read by folding the delta chain over the
nearest full snapshot (``TableIO.read_state`` — the Iceberg
merge-on-read shape), and every ``compact_every``-th batch additionally
commits full snapshots so the read chain stays bounded and gc can
expire ancestry. A killed incremental run resumes per stage exactly
like the base pipeline, and the next batch chains on this batch's
committed state.
"""

from __future__ import annotations

import os
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import persist_tracked
from ..pipeline import PipelineConfig, PipelineResult
from ..sources.tables import TableIO, config_fingerprint
from .blocking import (
    hot_keys,
    latest_crawl_wins,
    route_unmatched,
    with_extract_sketch_keys,
)
from .clustering import cluster_assignments, connected_components
from .consolidate import consolidate_clusters, match_statistics
from .scoring import fuzzy_match_edges, score_pairs, union_edges

BLOCKED_COLS = ["url", "warc_ts", "lang", "norm_domain", "norm_text",
                "simhash", "minhash_sig", "block_keys"]


def exact_match_edges_touched(blocked_union: DataFrame, new_flag: str = "_is_new") -> DataFrame:
    """Star edges for exact groups that gained at least one new member.

    Emits member → union-group-min-url for EVERY member of a touched
    group (old members included): if the batch page becomes the group's
    new rep, linking only new members would leave the old ones
    disconnected from it. Untouched groups keep their prior edges.

    A group is touched iff its (norm_domain, simhash) key appears in the
    batch — so the history side is first cut by a BROADCAST semi-join on
    the batch's O(batch) distinct keys, and only the surviving members
    (touched groups' full membership) reach the groupBy and the star
    join-back. The previous form shuffled the ENTIRE union through the
    groupBy to then discard every untouched group — O(history) shuffle
    per batch for output that is O(touched).
    """
    batch_keys = (
        blocked_union.filter(F.col(new_flag))
        .select(F.col("norm_domain").alias("_gd"), F.col("simhash").alias("_gs"))
        .dropDuplicates(["_gd", "_gs"])
    )
    # persisted: touched feeds both the group aggregate and the star
    # join-back below (one action, two DAG branches — no subtree sharing)
    touched = persist_tracked(
        blocked_union.select("norm_domain", "simhash", "url").join(
            F.broadcast(batch_keys),
            F.col("norm_domain").eqNullSafe(F.col("_gd"))
            & F.col("simhash").eqNullSafe(F.col("_gs")),
        )
        .select("norm_domain", "simhash", "url")
    )
    grp = (
        touched.groupBy("norm_domain", "simhash")
        .agg(F.min("url").alias("_rep"), F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .select(F.col("norm_domain").alias("_gd"), F.col("simhash").alias("_gs"), "_rep")
    )
    return (
        touched.select("norm_domain", "simhash", F.col("url").alias("src"))
        .join(
            grp,
            F.col("norm_domain").eqNullSafe(F.col("_gd"))
            & F.col("simhash").eqNullSafe(F.col("_gs")),
        )
        .filter(F.col("src") != F.col("_rep"))
        .select(
            "src",
            F.col("_rep").alias("dst"),
            F.lit(1.0).alias("score"),
            F.lit("exact").alias("match_type"),
        )
    )


def _label_delta_driver(
    prior_labels: DataFrame, new_edges: DataFrame
) -> DataFrame:
    """Driver-side contraction + union-find for label deltas whose edge
    set fits the CC small-graph gate (the overwhelmingly common fold
    shape — the committed edge delta is O(batch)).

    The distributed form pays ~5 fixed-latency units per fold (two
    broadcast builds for the endpoint maps, the CC gate probe, the CC
    collect, plus persists) to produce a result that the hybrid CC would
    collect to the driver anyway. This path collects ONCE each: the
    O(delta) edge list and the prior labels cut to its endpoint set
    (broadcast semi-join — the prior is scanned, never shuffled), then
    does contraction, node-origin flags, and union-find in
    pyarrow/numpy (the exact kernel the CC small-graph path runs —
    ``clustering.union_find_arrow_table`` — so labels are
    bit-identical), and ships back one tiny broadcast for the
    changed-row scan. Driver memory is bounded by the same
    ``DEFAULT_SMALL_GRAPH_EDGES`` gate CC uses."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .clustering import union_find_arrow_table

    spark = new_edges.sparkSession
    e_tbl = new_edges.select("src", "dst").toArrow()
    empty = spark.createDataFrame([], "url string, component string")
    if e_tbl.num_rows == 0:
        return empty
    src = e_tbl.column("src").combine_chunks()
    dst = e_tbl.column("dst").combine_chunks()
    ends = pc.unique(pa.concat_arrays([src, dst]))
    ends_df = spark.createDataFrame(pa.table({"url": ends}), schema="url string")
    t_tbl = (
        prior_labels.join(F.broadcast(ends_df), "url", "left_semi")
        .select("url", "component")
        .toArrow()
    )
    t_urls = t_tbl.column("url").combine_chunks()
    t_comp = t_tbl.column("component").combine_chunks()
    idx_s = pc.index_in(src, value_set=t_urls)
    idx_d = pc.index_in(dst, value_set=t_urls)
    src_m = pc.coalesce(pc.take(t_comp, idx_s), src)
    dst_m = pc.coalesce(pc.take(t_comp, idx_d), dst)
    src_prior = pc.is_valid(idx_s)
    dst_prior = pc.is_valid(idx_d)
    keep = pc.invert(pc.equal(src_m, dst_m))
    contracted = pa.table(
        {"src": pc.filter(src_m, keep), "dst": pc.filter(dst_m, keep)}
    )
    labels = union_find_arrow_table(contracted)
    if labels is None:
        return empty
    l_urls = labels.column("url").combine_chunks()
    l_comp = labels.column("component").combine_chunks()
    # node-origin flags: a contracted node is either a prior component
    # rep or a brand-new url — decided by the contraction join itself
    fresh_nodes = pc.unique(
        pa.concat_arrays(
            [
                pc.filter(src_m, pc.invert(src_prior)),
                pc.filter(dst_m, pc.invert(dst_prior)),
            ]
        )
    )
    in_fresh = pc.is_valid(pc.index_in(l_urls, value_set=fresh_nodes))
    fresh_tbl = pa.table(
        {"url": pc.filter(l_urls, in_fresh), "component": pc.filter(l_comp, in_fresh)}
    )
    # changed reps: prior-origin nodes whose component id actually moved
    rep_moved = pc.and_(pc.invert(in_fresh), pc.invert(pc.equal(l_urls, l_comp)))
    reps_tbl = pa.table(
        {"_rep": pc.filter(l_urls, rep_moved), "_nc": pc.filter(l_comp, rep_moved)}
    )
    changed = (
        prior_labels.join(
            F.broadcast(
                spark.createDataFrame(reps_tbl, schema="_rep string, _nc string")
            ),
            prior_labels["component"] == F.col("_rep"),
        )
        .select("url", F.col("_nc").alias("component"))
    )
    fresh = (
        spark.createDataFrame(fresh_tbl, schema="url string, component string")
        if fresh_tbl.num_rows
        else empty
    )
    return changed.unionByName(fresh)


def incremental_label_delta(
    prior_labels: DataFrame,
    new_edges: DataFrame,
    n_new_edges: int | None = None,
    driver_edge_limit: int | None = None,
) -> tuple[DataFrame, int]:
    """The label DELTA the new edges induce on the prior clustering —
    exactly the rows a full recompute would label differently, plus the
    brand-new urls — computed without re-walking the prior edge set.

    Edges are only ever added (the monotone contract), so the prior
    components can be CONTRACTED to single nodes: map each new edge's
    endpoints through the prior labels (urls absent from the prior keep
    themselves), drop the self-loops (edges inside one prior component),
    and run CC on what remains — a graph of O(new edges) size whose node
    ids are prior component reps and brand-new urls. Because a component
    rep IS the component's min url, the contracted CC's min-rep result
    equals the min url of the merged component, so the delta (changed
    prior rows + fresh urls) applied over the prior labels reproduces the
    full recompute's labels bit-for-bit (tests/test_incremental.py
    asserts the equality end-to-end).

    The delta is O(touched components + new urls) — it is what the fold
    COMMITS (``labels_delta`` snapshot); the full label view is
    reconstructed on read (TableIO.read_state url-replacement merge).

    Cost shape (r05 rewrite): the prior labels are SCANNED, never
    SHUFFLED. The old form outer-joined the O(delta) edges against the
    full prior labels — a left-outer join whose big side is on the right
    cannot broadcast, so Spark sort-merge-shuffled the whole history's
    labels per fold, twice (src + dst), and the fresh-node anti-join
    shuffled it a third time. Now the prior side is first cut to the
    edge-endpoint url set with one broadcast semi-join (scan-only,
    O(delta) output, persisted once for both sides), the endpoint joins
    broadcast that slim cut, and fresh nodes come from the join's own
    null-ness flags (a url absent from the prior keeps itself — so
    whether a contracted NODE is a prior component rep or a brand-new
    url is already decided during contraction, no history anti-join
    needed). The one remaining O(history) touch is the changed-row scan
    against the (broadcast) contracted result — irreducible, it defines
    the delta.

    When the caller knows the edge-delta row count (``n_new_edges`` —
    the fold reads it from the committed snapshot's manifest record, so
    it costs zero jobs) and it fits the CC small-graph gate, the whole
    contraction runs driver-side in one pass (``_label_delta_driver``)
    — same labels, ~5 fewer fixed-latency Spark rounds per fold. The
    distributed shape below is the scale path (and the fallback when
    the count is unknown); tests pin both paths equal.
    """
    if driver_edge_limit is None:
        from .clustering import DEFAULT_SMALL_GRAPH_EDGES as _gate

        driver_edge_limit = _gate
    if n_new_edges is not None and 0 <= n_new_edges <= driver_edge_limit:
        return _label_delta_driver(prior_labels, new_edges), 0
    e = new_edges.select("src", "dst")
    ends = (
        e.select(F.col("src").alias("url"))
        .unionByName(e.select(F.col("dst").alias("url")))
        .dropDuplicates()
    )
    # persisted: pl_src and pl_dst below both broadcast this cut — without
    # the persist each broadcast exchange re-scans the full prior labels
    touched = persist_tracked(
        prior_labels.join(F.broadcast(ends), "url", "left_semi")
    )
    pl_src = touched.select(F.col("url").alias("src"), F.col("component").alias("_c_src"))
    pl_dst = touched.select(F.col("url").alias("dst"), F.col("component").alias("_c_dst"))
    # persisted: feeds BOTH the CC edge list and the node-origin flags
    contracted_tagged = persist_tracked(
        e.join(F.broadcast(pl_src), "src", "left")
        .join(F.broadcast(pl_dst), "dst", "left")
        .select(
            F.coalesce("_c_src", "src").alias("src"),
            F.col("_c_src").isNotNull().alias("_src_prior"),
            F.coalesce("_c_dst", "dst").alias("dst"),
            F.col("_c_dst").isNotNull().alias("_dst_prior"),
        )
    )
    # node → came-from-prior flag; consistent per node (a url either has a
    # prior label row or it doesn't), O(delta) rows
    node_flags = (
        contracted_tagged.select(F.col("src").alias("url"), F.col("_src_prior").alias("_prior"))
        .unionByName(
            contracted_tagged.select(F.col("dst").alias("url"), F.col("_dst_prior").alias("_prior"))
        )
        .dropDuplicates()
    )
    contracted = contracted_tagged.select("src", "dst").filter(F.col("src") != F.col("dst"))
    c_labels, iters = connected_components(contracted)
    # consumed twice (changed-row join + fresh-node semi-join) and tiny —
    # O(touched components + new urls)
    c_labels = persist_tracked(c_labels)
    changed = (
        prior_labels.join(
            F.broadcast(
                c_labels.select(
                    F.col("url").alias("_rep"), F.col("component").alias("_nc")
                )
            ),
            prior_labels["component"] == F.col("_rep"),
        )
        # a touched component whose rep stays its own min is unchanged —
        # only rows whose component id actually moves belong in the delta
        .filter(F.col("_nc") != F.col("component"))
        .select("url", F.col("_nc").alias("component"))
    )
    fresh = c_labels.join(
        F.broadcast(node_flags.filter(~F.col("_prior")).select("url")),
        "url",
        "left_semi",
    )
    return changed.unionByName(fresh.select("url", "component")), iters


def incremental_components(
    prior_labels: DataFrame, new_edges: DataFrame
) -> tuple[DataFrame, int]:
    """Full label view for (prior ∪ new) edges: the incremental delta
    applied over the prior labels by url replacement — equals a full CC
    over the merged edge set (see incremental_label_delta)."""
    delta, iters = incremental_label_delta(prior_labels, new_edges)
    delta = persist_tracked(delta)  # consumed by the anti-join AND the union
    view = prior_labels.join(delta.select("url"), "url", "left_anti").unionByName(delta)
    return view, iters


def incremental_candidate_pairs(
    blocked_union: DataFrame,
    new_flag: str = "_is_new",
    max_block_size: int = 64,
    max_band_hamming: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """New-touching candidate pairs: (new × all) minus old-old.

    Same contract as ``blocking.candidate_pairs`` — slim uid join,
    Hamming prefilter on simhash-band pairs, cross-key dedup, payload
    attach, url_a < url_b — but the left join side carries only the new
    batch, so the join output is O(batch × block), not O(block²). The
    hot-key cap is measured over UNION block sizes (what a full
    recompute would see).
    """
    sel = blocked_union.select(
        F.xxhash64(F.col("url")).alias("uid"),
        F.col("simhash"),
        F.col(new_flag).alias("_new"),
        F.explode("block_keys").alias("block_key"),
    )
    # Cap decisions only matter for keys the BATCH touches — an untouched
    # key generates no new pairs — so the frequency scan is cut to the
    # batch's key set with a broadcast semi-join BEFORE the groupBy:
    # aggregating every history key to cap an O(batch) key set is an
    # O(history) shuffle per fold that a 100-TB deployment can't pay.
    # Block sizes are still counted over the full UNION membership of the
    # surviving keys, so the cap mirrors the full recompute's decisions.
    batch_keys = sel.filter(F.col("_new")).select("block_key").dropDuplicates()
    # persisted: three consumers re-derive this lineage otherwise — the
    # hot-keys agg and BOTH sides of the a×b self-join each re-scan the
    # blocked view and re-run the explode + semi-join (forced-count
    # attribution at 100k/16: candidate_pairs derivation 2.2 s without
    # the persist, 0.9 s with; at 10^12 docs each re-derivation is a
    # full column-pruned history scan). Slim columns only (uid,
    # simhash, flag, key), MEMORY_AND_DISK.
    touched = persist_tracked(
        sel.join(F.broadcast(batch_keys), "block_key", "left_semi")
    )
    # persisted for the same reason as blocking.candidate_pairs: consumed
    # by the broadcast exclusion AND the caller's overflow-metric action
    hot = persist_tracked(hot_keys(touched.select("block_key", "uid"), max_block_size))
    # both join sides draw from `touched`: untouched-key rows would die in
    # the equi-join anyway, so never let them into a shuffle
    cold = touched.join(F.broadcast(hot.select("block_key")), "block_key", "left_anti")

    a = cold.filter(F.col("_new")).select(
        "block_key", F.col("uid").alias("uid_a"), F.col("simhash").alias("_sh_a")
    )
    b = cold.select("block_key", F.col("uid").alias("uid_b"), F.col("simhash").alias("_sh_b"))
    ham_ok = (~F.col("block_key").startswith("sh")) | (
        F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))) <= max_band_hamming
    )
    # orient by least/greatest (the asymmetric join yields new-old pairs
    # in one order and new-new pairs in both); cross-key dedup happens in
    # the attach groupBy below — one shuffle for dedup AND attach
    slim = (
        a.join(b, "block_key")
        .filter(F.col("uid_a") != F.col("uid_b"))
        .filter(ham_ok)
        .select(
            F.least("uid_a", "uid_b").alias("uid_a"),
            F.greatest("uid_a", "uid_b").alias("uid_b"),
        )
    )
    from ..functions.similarity import MAX_SCORE_CHARS

    # Melt-attach (r05): the previous shape was dropDuplicates (shuffle 1)
    # + two payload equi-joins — two column-pruned history scans, with the
    # second join's probe side too wide for AQE to broadcast (shuffle 2).
    # Melting each pair into (pair, side, uid) rows lets ONE history scan
    # feed both endpoints through a single equi-join (AQE broadcasts the
    # O(pairs) melted side at fold scale; at extreme batch sizes it
    # degrades to the same shuffle join as before, never worse), and ONE
    # groupBy on the oriented pair key performs the cross-key dedup and
    # the a/b pivot together. Net: one O(history) scan and one O(pairs)
    # shuffle replace two scans and two shuffles per fold. Duplicate
    # (multi-key) pairs collapse in the agg — max over identical structs.
    payload = blocked_union.select(
        F.xxhash64(F.col("url")).alias("uid"),
        F.col("url"),
        F.substring(F.col("norm_text"), 1, MAX_SCORE_CHARS).alias("norm_text"),
        F.col("minhash_sig"),
    )
    sides = slim.select(
        "uid_a",
        "uid_b",
        F.explode(
            F.array(
                F.struct(F.col("uid_a").alias("uid"), F.lit(0).alias("side")),
                F.struct(F.col("uid_b").alias("uid"), F.lit(1).alias("side")),
            )
        ).alias("_s"),
    ).select("uid_a", "uid_b", F.col("_s.uid").alias("uid"), F.col("_s.side").alias("side"))
    pay = F.struct(F.col("url"), F.col("norm_text"), F.col("minhash_sig"))
    pairs0 = (
        payload.join(sides, "uid")
        .groupBy("uid_a", "uid_b")
        .agg(
            F.max(F.when(F.col("side") == 0, pay)).alias("_pa"),
            F.max(F.when(F.col("side") == 1, pay)).alias("_pb"),
        )
    )
    flip = F.col("_pa.url") > F.col("_pb.url")
    pick = lambda a_c, b_c: F.when(flip, b_c).otherwise(a_c)  # noqa: E731
    pairs = pairs0.select(
        pick(F.col("_pa.url"), F.col("_pb.url")).alias("url_a"),
        pick(F.col("_pb.url"), F.col("_pa.url")).alias("url_b"),
        pick(F.col("_pa.norm_text"), F.col("_pb.norm_text")).alias("text_a"),
        pick(F.col("_pb.norm_text"), F.col("_pa.norm_text")).alias("text_b"),
        pick(F.col("_pa.minhash_sig"), F.col("_pb.minhash_sig")).alias("sig_a"),
        pick(F.col("_pb.minhash_sig"), F.col("_pa.minhash_sig")).alias("sig_b"),
    )
    return pairs, hot


def run_incremental(
    spark: SparkSession,
    new_pages: DataFrame,
    io: TableIO,
    batch_id: str,
    cfg: PipelineConfig | None = None,
    prior_fingerprint: str | None = None,
    compact_every: int = 8,
) -> PipelineResult:
    """Resolve ``new_pages`` (url, warc_ts, html[, text, lang]) against the
    prior committed run and commit the state DELTA.

    ``prior_fingerprint`` identifies the state to chain on: the base
    pipeline's config fingerprint for the first batch, or a previous
    batch's returned fingerprint (``config_fingerprint`` of cfg+batch)
    for later ones. Commits ``blocked_delta`` / ``edges_delta`` /
    ``labels_delta`` snapshots under this batch's fingerprint — each
    O(batch∕touched), never a rewrite of the O(history) state (the
    Iceberg merge-on-read shape; TableIO.read_state reconstructs the
    full view by folding the delta chain over the nearest full
    snapshot). Every ``compact_every``-th batch additionally commits
    full ``blocked`` / ``edges`` / ``labels`` snapshots, bounding the
    read chain and letting gc expire ancestry. The run is resumable per
    stage and the next batch chains on its fingerprint either way.
    """
    cfg = cfg or PipelineConfig()
    cfg_fp = config_fingerprint(asdict(cfg))
    base_fp = prior_fingerprint or cfg_fp
    fp = config_fingerprint({"cfg": asdict(cfg), "batch": batch_id, "prior": base_fp})
    resumed: list[str] = []

    # Compaction decision: a function of the PRIOR chain — OR of this
    # fold's own already-committed full records. The second clause makes
    # the decision stable across a killed retry even when gc compacted
    # the prior head in between (chain_length then reads 0 and the bare
    # threshold would flip to False): a first attempt that committed its
    # full 'blocked' snapshot and died before 'edges'/'labels' must
    # finish the set on retry, or the fingerprint is left permanently
    # stage-misaligned (full blocked + delta edges) — the docstring's
    # "every compact_every-th batch commits full snapshots" broken, and
    # the read chain unbounded past it.
    compact = compact_every > 0 and (
        io.chain_length("blocked", base_fp) + 1 >= compact_every
        or any(io.last_committed(s, fp) is not None for s in ("blocked", "edges", "labels"))
    )
    delta_extra = {"cfg_fp": cfg_fp, "prior": base_fp, "kind": "delta"}
    full_extra = {"cfg_fp": cfg_fp, "prior": base_fp, "kind": "full"}

    # Prior state views are read LAZILY: a stage that resumes from its own
    # committed snapshot never touches them — so a killed head-batch retry
    # still resumes after gc() compacted the head and expired its
    # ancestry. Only an actual recompute requires the prior state and
    # fails loudly without it.
    def _prior(stage_name: str) -> DataFrame:
        df = io.read_state(spark, stage_name, base_fp)
        if df is None:
            raise ValueError(
                f"no committed {stage_name} snapshot for fingerprint {base_fp}; "
                "run the base pipeline with this TableIO first (or the prior "
                "state was gc-expired — a recompute of this batch needs it)"
            )
        return df

    def stage_delta(name: str, compute) -> DataFrame:
        """Commit/resume the O(batch) delta for logical stage ``name``;
        ``resumed_stages`` reports the LOGICAL name either way."""
        df, was_resumed = io.read_or_compute(
            spark, name + "_delta", fp, compute, extra=delta_extra
        )
        if was_resumed:
            resumed.append(name)
        return df

    def maybe_compact(name: str, view: DataFrame) -> DataFrame:
        """On a compaction batch, materialize the full state view as its
        own snapshot (idempotent on retry)."""
        if not compact:
            return view
        full_rec = io.last_committed(name, fp)
        if full_rec is not None:
            return io.read_snapshot(spark, full_rec)
        return io.commit(view, name, fp, extra=full_extra)

    # batch sketching: same fused kernel + key derivation as the pipeline.
    # Incoming rows are classified against the committed state by CONTENT,
    # not just url (ADVICE r03 — a url-only anti-join silently dropped
    # re-crawled pages whose content changed, so their new sketches never
    # updated edges/clusters):
    #   * url absent from state                        → 'new'
    #   * url present, identical norm_text+simhash, crawl older-or-equal
    #     → replay, dropped (true no-op: a replayed epoch — crash between
    #     the snapshot manifest commit and the stream checkpoint commit —
    #     never double-counts assigned/clusters/match_statistics)
    #   * url present, identical content, crawl NEWER  → 'refresh': the
    #     stored row's metadata advances (warc_ts) with NO rescore —
    #     otherwise a later out-of-order older crawl with different
    #     content would beat the stale stored timestamp and diverge from
    #     a full recompute's latest-crawl-wins pick
    #   * url present, content CHANGED, crawl newer    → 'changed': the
    #     batch row REPLACES the prior blocked row (latest crawl wins,
    #     same deterministic max-struct rule as within-batch dedup) and
    #     is rescored like a new page. Prior edges from the old content
    #     are never retracted (monotone contract — clusters only coarsen;
    #     documented divergence, same class as best_match_only top-1).
    #   * url present, content changed, crawl OLDER    → stale
    #     out-of-order delivery, dropped.
    # Per-batch ingest counts are written as a metric so replay/stale
    # volume is visible (write happens after the stage, from the cheap
    # committed snapshot — see the fused batch_metrics write below).
    rest = [c for c in BLOCKED_COLS if c != "url"]

    def _with_content_hash(df: DataFrame) -> DataFrame:
        """Ensure the committed content hash column exists. The base
        pipeline commits ``norm_text_hash = xxhash64(norm_text)`` into the
        blocked snapshot so the fold's classify join below compares
        fixed-width columns ONLY — without the committed column, every
        fold re-reads and re-hashes the whole history's norm_text (the
        one wide column) just to test "did this url's content change?".
        Chains committed by pre-hash code fall back to hashing on read —
        same function, same input, so classification is identical."""
        if "norm_text_hash" in df.columns:
            return df
        return df.withColumn("norm_text_hash", F.xxhash64("norm_text"))

    def _blocked_delta() -> DataFrame:
        prior_blocked = _with_content_hash(_prior("blocked"))
        # the docstring admits (url, warc_ts, html) without text/lang;
        # fill the optional columns with typed nulls so the BLOCKED_COLS
        # projection below resolves (same shape the schema-drift fill in
        # read_state uses)
        batch_src = new_pages
        for _c in ("text", "lang"):
            if _c not in batch_src.columns:
                batch_src = batch_src.withColumn(_c, F.lit(None).cast("string"))
        batch = with_extract_sketch_keys(
            batch_src,
            n_simhash_bands=cfg.n_simhash_bands,
            minhash_k=cfg.minhash_k,
            # extracted_text is dropped by the BLOCKED_COLS projection —
            # omit it from the Arrow return instead of transferring it;
            # norm_text stays FULL to match the prior blocked snapshot
            emit_extracted=False,
        ).select(*BLOCKED_COLS)
        # within-batch dedup by url: the SHARED latest-crawl-wins rule
        # (blocking.latest_crawl_wins — also applied by run_pipeline's
        # blocked stage, so batch and corpus-at-once ingestion pick the
        # same survivor per url)
        batch = latest_crawl_wins(batch)
        # The classifying join needs only a SLIM comparison key from the
        # prior state, not its payload: at scale `prior_blocked` is the
        # whole resolved history, and shipping full norm_text +
        # minhash_sig + block_keys through a shuffle join just to test
        # "did this url's content change?" made the prior side ~50×
        # wider than necessary. Content equality is xxhash64(norm_text)
        # + simhash (both deterministic; a misclassification needs a
        # 64-bit hash collision AND an identical simhash on different
        # text); the hash is the COMMITTED norm_text_hash column, so the
        # parquet scan below reads six fixed-width columns and norm_text
        # never leaves history's column chunks. Newer-vs-stale compares
        # (warc_ts, lang, norm_domain, text-hash, simhash) — EXACTLY the
        # leading key of blocking.latest_crawl_wins (which also breaks
        # content ties on xxhash64(norm_text)), so batched and
        # corpus-at-once ingestion resolve the identical survivor per
        # url even for same-timestamp re-crawls with different text.
        _key = lambda ts, lg, nd, th, sh: F.struct(  # noqa: E731
            F.col(ts), F.col(lg), F.col(nd), F.col(th), F.col(sh)
        )
        prior_keyed = prior_blocked.select(
            "url",
            F.col("warc_ts").alias("_p_ts"),
            F.col("lang").alias("_p_lang"),
            F.col("norm_domain").alias("_p_nd"),
            F.col("norm_text_hash").alias("_p_th"),
            F.col("simhash").alias("_p_sh"),
            F.lit(True).alias("_in_prior"),
        )
        # Cut the prior side to the batch's url set BEFORE the outer join:
        # a left-outer join can only broadcast its RIGHT side, so with the
        # O(history) prior on the right Spark sort-merge-shuffles BOTH
        # sides — the whole history's keys reshuffled per fold. After this
        # broadcast semi-join the survivor set is O(batch ∩ history) and
        # AQE broadcasts it, so history is scanned (column-pruned) but
        # never shuffled. Dropping non-batch urls is a no-op for a left
        # join keyed on the batch's urls. Same O(batch)-broadcast contract
        # as batch_keys in the exact/candidate stages; urls come from the
        # raw input (not the sketched batch) so the Arrow extract is never
        # computed twice.
        batch_urls = new_pages.select("url").dropDuplicates()
        prior_keyed = prior_keyed.join(F.broadcast(batch_urls), "url", "left_semi")
        cmp = batch.withColumn("_b_th", F.xxhash64("norm_text")).join(
            prior_keyed, "url", "left"
        )
        same_content = F.col("_b_th").eqNullSafe(F.col("_p_th")) & F.col(
            "simhash"
        ).eqNullSafe(F.col("_p_sh"))
        newer = _key("warc_ts", "lang", "norm_domain", "_b_th", "simhash") > _key(
            "_p_ts", "_p_lang", "_p_nd", "_p_th", "_p_sh"
        )
        # same-content re-crawls split on the SAME newer-vs-stale key as
        # changed ones: a byte-identical crawl with a newer key is a
        # "refresh" — it must advance the stored warc_ts (metadata-only
        # row replacement, no rescore) or a later out-of-order OLDER
        # crawl with different content would compare against the stale
        # timestamp, win, and diverge from a full recompute's
        # latest-crawl-wins max-struct pick. Only an older-or-equal
        # identical crawl is a droppable "replay".
        status = (
            F.when(F.col("_in_prior").isNull(), F.lit("new"))
            .when(same_content & newer, F.lit("refresh"))
            .when(same_content, F.lit("replay"))
            .when(newer, F.lit("changed"))
            .otherwise(F.lit("stale"))
        )
        # the stage's COMMITTED artifact is the kept delta alone —
        # O(batch), never the O(history) union (the view below merges on
        # read). No persist needed: the commit materializes it once and
        # every later consumer reads the committed parquet.
        # the batch's own content hash (_b_th) is committed with the delta
        # so the NEXT fold's merged prior view keeps the fast classify path
        return (
            cmp.withColumn("_batch_status", status)
            .filter(F.col("_batch_status").isin("new", "changed", "refresh"))
            .select(
                "url", *rest, F.col("_b_th").alias("norm_text_hash"), "_batch_status"
            )
        )

    kept = stage_delta("blocked", _blocked_delta)

    def _blocked_view() -> DataFrame:
        """The flagged blocked union (prior ∖ changed ∪ kept) the edge
        stage consumes. LAZY — only a recomputing edge stage builds it,
        so a fully-resumed retry never touches the prior chain (which a
        gc-compacted head may have expired)."""
        # refresh rows replace their prior row too (newer warc_ts, same
        # content) — they must join the supersede set or the view holds
        # two rows per refreshed url. Pre-status resumed chains (delta
        # committed by a code revision without _batch_status) carry no
        # status column — there every kept row was new/changed, so the
        # whole url set supersedes (same guard as the ingest metric and
        # _edges_delta below).
        has_status = "_batch_status" in kept.columns
        kept_status = (
            kept
            if has_status
            else kept.withColumn("_batch_status", F.lit(None).cast("string"))
        )
        changed_urls = (
            kept.filter(F.col("_batch_status").isin("changed", "refresh"))
            if has_status
            else kept
        ).select("url")
        # norm_text_hash rides along (compat-filled on pre-hash chains) so
        # a compaction batch bakes it into the full snapshot; the edge
        # consumers below never select it — column pruning drops it
        prior_keep = (
            _with_content_hash(_prior("blocked"))
            .select(*BLOCKED_COLS, "norm_text_hash")
            .join(changed_urls, "url", "left_anti")
        )
        return (
            prior_keep.withColumn("_is_new", F.lit(False))
            .withColumn("_batch_status", F.lit(None).cast("string"))
            .unionByName(
                # refresh rows are metadata-only replacements: identical
                # content → identical block keys and sketches → every
                # prior edge stays valid, so they must NOT re-enter the
                # edge stages as new rows (that would rescore their whole
                # block for a timestamp bump)
                _with_content_hash(kept_status).withColumn(
                    "_is_new",
                    F.coalesce(
                        F.col("_batch_status") != F.lit("refresh"), F.lit(True)
                    ),
                )
            )
        )

    if compact and io.last_committed("blocked", fp) is None:
        io.commit(
            _blocked_view().select(*BLOCKED_COLS, "norm_text_hash"),
            "blocked",
            fp,
            extra=full_extra,
        )

    # Per-fold observability is fused into ONE metric write at the end of
    # the fold (see batch_metrics below) — each of the four former
    # standalone writes (ingest counts, block overflow, edge counts,
    # score histogram) was its own Spark job launch, together a measured
    # ~2 s of the fold's size-invariant floor (VERDICT r04 item 1/2).
    # The constituent frames are collected lazily here and unioned in a
    # long (metric, key, value) layout for a single action.
    fold_metric_parts: list[DataFrame] = []

    def _metric_part(metric: str, key_col, value_col, src: DataFrame) -> None:
        fold_metric_parts.append(
            src.select(
                F.lit(metric).alias("metric"),
                key_col.cast("string").alias("key"),
                value_col.cast("double").alias("value"),
            )
        )

    # ingest: new / changed(updated) / refreshed(ts-only) counts from the
    # slim committed delta, plus the distinct batch-url total; guarded so
    # resuming a snapshot committed by a pre-status code version skips
    # the rows instead of failing (dropped_replay_or_stale is derivable:
    # batch_urls − new − changed − refresh).
    if "_batch_status" in kept.columns:
        _metric_part(
            "batch_ingest",
            F.col("_batch_status"),
            F.col("n"),
            kept.groupBy("_batch_status").agg(F.count("*").alias("n")),
        )
        _metric_part(
            "batch_ingest",
            F.lit("batch_urls"),
            F.col("n"),
            new_pages.select("url").distinct().agg(F.count("*").alias("n")),
        )

    def _edges_delta() -> DataFrame:
        # On a compaction fold the full blocked snapshot was committed
        # just above — read IT back instead of rebuilding _blocked_view(),
        # whose O(history) prior-scan + anti-join + union would otherwise
        # execute a SECOND time inside this stage's commit (the committed
        # parquet and the view hold identical rows by construction). The
        # _is_new flag is reconstructed from the O(batch) kept delta;
        # refresh rows stay False, same as the view. Pre-status resumed
        # chains have no _batch_status column — there every kept row was
        # new/changed, so the unfiltered url set is the same flag.
        full_rec = io.last_committed("blocked", fp)
        if full_rec is not None:
            rescored = (
                kept.filter(F.col("_batch_status") != F.lit("refresh"))
                if "_batch_status" in kept.columns
                else kept
            )
            blocked = (
                io.read_snapshot(spark, full_rec)
                .join(
                    F.broadcast(
                        rescored.select("url", F.lit(True).alias("_kept_new"))
                    ),
                    "url",
                    "left",
                )
                .withColumn("_is_new", F.coalesce(F.col("_kept_new"), F.lit(False)))
                .drop("_kept_new")
            )
        else:
            blocked = _blocked_view()
        # persisted: exact_inc feeds BOTH the route_unmatched anti-join
        # and the edge union inside one action — Spark does not share
        # common subtrees across DAG branches, so without the persist the
        # O(history) touched-group scan (groupBy + join-back over the
        # full blocked union) runs twice.
        exact_inc = persist_tracked(exact_match_edges_touched(blocked))
        pairs, overflow = incremental_candidate_pairs(
            blocked,
            max_block_size=cfg.max_block_size,
            max_band_hamming=cfg.max_band_hamming,
        )
        # overflow rows join the fused end-of-fold metric write; the frame
        # is persisted (hot_keys via incremental_candidate_pairs), so by
        # write time it is already materialized — a resumed edge stage
        # never recomputes it, and then (as before) records no overflow
        _metric_part(
            "block_overflow", F.col("block_key"), F.col("block_size"), overflow
        )
        routed = route_unmatched(pairs, exact_inc)
        scored = score_pairs(routed, match_threshold=cfg.fuzzy_threshold).drop(
            "sig_a", "sig_b", "text_a", "text_b"
        )
        fuzzy_inc = fuzzy_match_edges(
            scored, threshold=cfg.fuzzy_threshold, best_match_only=cfg.best_match_only
        )
        if os.environ.get("SPARK_GRAFT_PROFILE_FOLD") == "1":
            # diagnostic only (scripts/profile_incremental.py): forces
            # extra actions to attribute the edge-stage seconds — never
            # on in a measured bench run
            import sys as _sys
            import time as _time

            for _lbl, _frame in (
                ("blocked_view_scan", blocked),
                ("exact_touched", exact_inc),
                ("candidate_pairs", pairs),
                ("scored_pairs", scored),
            ):
                _t0 = _time.perf_counter()
                _n = _frame.count()
                print(
                    f"    [fold-profile] {_lbl}: {_n} rows "
                    f"{_time.perf_counter() - _t0:.2f}s",
                    file=_sys.stderr,
                )
        return union_edges(exact_inc, fuzzy_inc)

    # the fold COMMITS only the edge delta — prior edges are never
    # retracted (monotone contract) and never rewritten. The full edge
    # view is merge-on-read: chain union + one max-struct dedup
    # (tables.merge_edge_sets — 'exact' outranks 'fuzzy' on a 1.0 tie so
    # a recurring exact edge is never relabeled by a tying fuzzy edge).
    # The returned frame IS the committed delta (read_or_compute re-reads
    # after commit) — the labels stage and the batch metrics below
    # consume it directly instead of re-resolving the manifest record
    # and rebuilding the same scan plan twice per fold.
    edge_delta = stage_delta("edges", _edges_delta)
    # consumed ≥2× below (clusters + stats) and by the caller — persist
    # the slim reconstructed view so the chain union + dedup shuffle runs
    # once (columns: 2 urls + score + type; MEMORY_AND_DISK spills)
    edges = maybe_compact("edges", io.read_state(spark, "edges", fp))
    if not compact:
        edges = persist_tracked(edges)

    cc_iters = 0

    def _labels_delta() -> DataFrame:
        nonlocal cc_iters
        # incremental CC: contract prior components through the committed
        # edge delta (exact under the monotone-edges contract — see
        # incremental_label_delta). The committed artifact is the label
        # DELTA (changed prior rows + fresh urls), O(touched), never the
        # O(history) relabeled set. The delta's row count comes from the
        # manifest record of the just-committed edges_delta snapshot —
        # zero jobs — and routes small folds to the driver-side
        # contraction path.
        edge_rec = io.last_committed("edges_delta", fp)
        d, cc_iters = incremental_label_delta(
            _prior("labels"),
            edge_delta,
            n_new_edges=None if edge_rec is None else edge_rec.get("row_count"),
        )
        return d

    stage_delta("labels", _labels_delta)
    labels = maybe_compact("labels", io.read_state(spark, "labels", fp))

    # the assigned view reconstructs blocked state on read as well —
    # full snapshot when compacted, prior ∖ changed ∪ delta otherwise
    pages_slim = io.read_state(spark, "blocked", fp).select(
        "url", "warc_ts", "lang", "norm_domain"
    )
    assigned = cluster_assignments(pages_slim, labels)
    clusters = consolidate_clusters(assigned, edges)
    stats = match_statistics(assigned, edges)

    # Per-batch observability is DELTA-scoped. The previous form wrote
    # the full-state match_statistics row per fold — an O(history)
    # aggregation per batch, the wrong cost shape at 10^12 docs. The
    # match-count + score-distribution metrics the checkpoint contract
    # asks for describe THIS batch's output, which is the committed
    # O(batch) edge delta; the full-state stats row stays available as
    # the LAZY ``PipelineResult.stats`` view (zero jobs unless the
    # caller consumes it), and a compaction batch materializes state
    # anyway. Edge counts + histogram join the fused write below.
    from .scoring import score_histogram

    _metric_part(
        "edge_counts",
        F.col("match_type"),
        F.col("n"),
        edge_delta.groupBy("match_type").agg(F.count("*").alias("n")),
    )
    _metric_part(
        "score_histogram",
        F.round(F.col("score_bucket"), 2),
        F.col("n_pairs"),
        score_histogram(edge_delta),
    )
    # THE fold's one metric action: every per-batch observability frame
    # (ingest counts, block overflow, edge counts, score histogram) in a
    # long (metric, key, value) layout under a single write — four Spark
    # job launches of pure bookkeeping fused into one (VERDICT r05 task 1).
    # A PURE replay (all three stages resumed — the fold already ran to
    # completion once) skips the rewrite: the original write holds the
    # overflow rows, which only exist while the edge stage computes, and
    # overwriting would erase them for a no-op fold.
    if set(resumed) != {"blocked", "edges", "labels"}:
        fused = fold_metric_parts[0]
        for part in fold_metric_parts[1:]:
            fused = fused.unionByName(part)
        io.write_metric(
            fused.select(F.lit(batch_id).alias("batch_id"), "metric", "key", "value"),
            "final",
            f"batch_metrics_{batch_id}",
        )

    return PipelineResult(
        assigned=assigned,
        clusters=clusters,
        edges=edges,
        stats=stats,
        resumed_stages=resumed,
        cc_iterations=cc_iters,
        fingerprint=fp,
    )
