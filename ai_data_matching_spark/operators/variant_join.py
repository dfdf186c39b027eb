"""J1 — the reference's phase-1 exact matcher as a DataFrame join.

/root/reference/src/matching_engine.py:88-130: build a dict
``variant → [client rows]`` over all client variants (len ≥ 3), then for
each vendor probe its variants IN ORDER and take the FIRST variant with a
bucket, emitting ONE match = the FIRST client in that bucket, score 1.0.

Re-expressed relationally with the §2.7 nondeterminism traps fixed:

* probe order — the reference's ``list(set(variants))`` is
  hash-seed-dependent; here every variant carries an explicit priority
  (0 original > 1 normalized > 2 stopword-stripped) and the winner is
  the minimum (priority, build_order) pair — a total order.
* "first client in the bucket" — insertion order in the reference;
  here an explicit ``build_order`` column (caller-supplied stable id).

Shape: explode variants on both sides → equi-join on the variant string
→ per-probe ``min(struct(...))`` argmin. The aggregate (not a
``row_number`` window) matters at scale: a hot variant whose bucket holds
10⁶ build rows would funnel every joined row for each probing record into
ONE window partition's sort, while ``min`` gets map-side partial
aggregation — each shuffle task reduces its slice to one candidate row per
probe before the exchange.

That argmin bounds the OUTPUT, not the join itself: a stop-word-like
variant shared by 10⁶ build rows still emits 10⁶ joined rows per probing
record before the aggregate. ``max_bucket_size`` caps it the same way as
``blocking.hot_keys`` / ``dedup.max_posting_size``: a frequency scan over
build-side variants excludes buckets above the cap from the join and
reports them as an overflow frame — dropped coverage is visible, never
silent. (Semantically a capped variant behaves as if it had no bucket, so
probes fall through to their next-priority variant — mirroring how the
reference's dict lookup would behave if the hot bucket were absent.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..extract import MIN_MATCH_LENGTH, normalize_name_col, variants_col


def _exploded_variants(df: DataFrame, id_col: str, name_col: str, prefix: str) -> DataFrame:
    norm = normalize_name_col(F.col(name_col))
    v = df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.explode(variants_col(F.col(name_col), norm)).alias("_v"),
    )
    return v.select(
        f"{prefix}_id",
        F.col("_v.priority").alias(f"{prefix}_priority"),
        F.col("_v.variant").alias("variant"),
    )


def exact_match_via_variants(
    probe: DataFrame,
    build: DataFrame,
    probe_id: str,
    build_id: str,
    probe_name: str,
    build_name: str,
    build_order: Column | None = None,
    max_bucket_size: int | None = None,
    return_overflow: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """One row per matched probe record: (probe_id, build_id, match_variant,
    probe_priority, score=1.0, match_type='exact').

    ``build_order`` is the "client row order" tiebreaker (defaults to the
    build id itself — pass an explicit row-number column to reproduce a
    specific input ordering).

    ``max_bucket_size`` excludes build-side variant buckets larger than
    the cap from the join (hot-variant skew split — see module docstring);
    with ``return_overflow`` the excluded ``(variant, bucket_size)`` frame
    is returned alongside the matches for metric persistence."""
    pv = _exploded_variants(probe, probe_id, probe_name, "probe")
    bv = _exploded_variants(build, build_id, build_name, "build")
    # the reference's lookup only indexes variants with len >= 3
    bv = bv.filter(F.length("variant") >= MIN_MATCH_LENGTH).withColumn(
        "_border", build_order if build_order is not None else F.col("build_id")
    )
    overflow = None
    if max_bucket_size is not None:
        # map-side-combined (variant, count) scan — one cheap shuffle of
        # partial counts, same pattern as blocking.hot_keys
        overflow = (
            bv.groupBy("variant")
            .agg(F.count("*").alias("bucket_size"))
            .filter(F.col("bucket_size") > max_bucket_size)
        )
        bv = bv.join(F.broadcast(overflow.select("variant")), "variant", "left_anti")
    j = pv.join(bv, "variant")
    # struct comparison is lexicographic by field order ⇒ min() realises the
    # total order (probe_priority, _border, build_id, variant); the trailing
    # variant field keeps the winner deterministic even if one build row
    # exposes the same string under two of its variant slots.
    best = j.groupBy("probe_id").agg(
        F.min(
            F.struct("probe_priority", "_border", "build_id", "variant")
        ).alias("_best")
    )
    out = best.select(
        "probe_id",
        F.col("_best.build_id").alias("build_id"),
        F.col("_best.variant").alias("match_variant"),
        F.col("_best.probe_priority").alias("probe_priority"),
        F.lit(1.0).alias("score"),
        F.lit("exact").alias("match_type"),
    )
    if return_overflow:
        if overflow is None:
            overflow = pv.sparkSession.createDataFrame(
                [], "variant string, bucket_size long"
            )
        return out, overflow
    return out
