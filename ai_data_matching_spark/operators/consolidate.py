"""Entity consolidation — graft analog of the reference's rollups.

* ``consolidate_clusters`` mirrors RelationshipMapper's per-entity rollup
  (/root/reference/src/relationship_mapper.py:20-123, A3): one row per
  resolved entity with counts, representative fields, member details, and
  a match-quality flag ('Exact' if any exact edge touched the cluster).
* ``match_statistics`` mirrors get_match_statistics
  (/root/reference/src/matching_engine.py:331-353, A4).

The comma-joined-sorted-set string columns reproduce the reference's
presentation form (`', '.join(sorted(set(...)))`,
relationship_mapper.py:97-99) while the raw arrays are kept too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_MEMBER_DETAILS = 1000


def consolidate_clusters(
    assigned: DataFrame,
    edges: DataFrame,
    url_col: str = "url",
    max_members: int = MAX_MEMBER_DETAILS,
) -> DataFrame:
    """One row per cluster: size, representative url (min), domains,
    languages, time range, member list, match quality.

    The member-detail array is capped at ``max_members`` and the cap is
    skew-safe: NO per-cluster sort window (a mega duplicate cluster — the
    100 TB reality — would serialize its whole membership into one task's
    sort). Instead a first count pass sizes each cluster; clusters at or
    under the cap collect every member, larger clusters take a
    deterministic hash sample (pmod(xxhash64(url), ceil(size/cap)) == 0,
    expected ≈ cap members), so no aggregation buffer ever holds more than
    ~cap structs. The collected array is ``array_sort``-ed (url is the
    leading struct field → lexicographic member order) because
    ``collect_list`` order is not guaranteed under AQE/plan changes.
    ``n_pages`` always counts ALL members.
    """
    match_q = (
        edges.select(F.explode(F.array("src", "dst")).alias(url_col), "match_type")
        .groupBy(url_col)
        .agg(F.max(F.col("match_type") == "exact").alias("_any_exact"))
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("_csize"))
    df = assigned.join(match_q, url_col, "left").join(sizes, "cluster_id")
    rate = F.greatest(
        F.ceil(F.col("_csize").cast("double") / F.lit(max_members)).cast("long"), F.lit(1)
    )
    keep = (F.col("_csize") <= max_members) | (
        F.pmod(F.xxhash64(F.col(url_col)), rate) == 0
    )
    member = F.when(keep, F.struct(F.col(url_col), F.col("warc_ts")))
    return (
        df.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_pages"),
            F.min(url_col).alias("representative_url"),
            F.array_join(F.sort_array(F.collect_set("norm_domain")), ", ").alias("domains"),
            F.array_join(F.sort_array(F.collect_set("lang")), ", ").alias("langs"),
            F.min("warc_ts").alias("first_seen"),
            F.max("warc_ts").alias("last_seen"),
            # collect_list drops the nulls (non-kept members); slice caps
            # the sampled overshoot at exactly max_members
            F.slice(F.array_sort(F.collect_list(member)), 1, max_members).alias("members"),
            F.when(F.max(F.coalesce(F.col("_any_exact"), F.lit(False))), F.lit("Exact"))
            .otherwise(F.lit("Fuzzy"))
            .alias("match_quality"),
        )
    )


def match_statistics(assigned: DataFrame, edges: DataFrame) -> DataFrame:
    """Headline metrics row: pages, clusters, duplicate pages, match rate,
    edge counts by type (reference A4 semantics over the graft domain).

    Fully LAZY: one plan (two 1-row aggregates crossJoined) that costs
    zero jobs until the caller consumes it — a pipeline run whose stats
    are never read pays nothing, and a consumer triggers exactly ONE
    action (the previous eager form ran two collects inside every
    ``run_pipeline``, pure fixed cost in the scaling decomposition)."""
    a = assigned.agg(
        F.count("*").alias("_n"), F.countDistinct("cluster_id").alias("_c")
    )
    e = edges.agg(
        F.sum((F.col("match_type") == "exact").cast("long")).alias("_e"),
        F.sum((F.col("match_type") == "fuzzy").cast("long")).alias("_f"),
    )
    dup = F.col("_n") - F.col("_c")
    return a.crossJoin(e).select(
        F.col("_n").alias("n_pages"),
        F.col("_c").alias("n_clusters"),
        dup.alias("n_duplicate_pages"),
        F.when(F.col("_n") > 0, F.round(dup / F.col("_n") * 100.0, 2))
        .otherwise(F.lit(0.0))
        .alias("duplicate_rate_pct"),
        F.coalesce(F.col("_e"), F.lit(0)).alias("n_exact_edges"),
        F.coalesce(F.col("_f"), F.lit(0)).alias("n_fuzzy_edges"),
    )
