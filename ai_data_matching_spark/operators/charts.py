"""Chart-DATA operators: the aggregate shapes behind the reference's
analytics surface (/root/reference/src/charts.py), as plain DataFrames.

The reference renders Plotly figures from small pandas aggregates; at
engine scale the chart is presentation-only while the AGGREGATE is the
operator — so this module emits exactly those aggregate frames (top-N
bars, type distributions, score buckets, expiry timeline, summary
metrics) and leaves rendering to any client. Every function mirrors the
corresponding charts.py computation:

* ``top_relationships_data``    — charts.py:10-27 (nlargest by value →
  stacked-bar rows, rank order)
* ``match_type_distribution``   — charts.py:64-78 (value_counts → pie)
* ``score_distribution``        — charts.py:300-320 region of the summary
  dashboard (match-score buckets; also scoring.score_histogram)
* ``expiry_timeline_data``      — charts.py:102-136 (coerce end dates,
  drop unparseable, sort, bounded marker size val/50000 clamped to 8-20)
* ``summary_metrics_data``      — charts.py:271-333 (success rate, value
  breakdown, per-type mean score)

All are native column expressions — top-N uses orderBy+limit (Spark plans
TakeOrderedAndProject: per-partition heaps, no global sort) and the
distributions are one map-side-combined groupBy each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from ..partitioning import one_group


def top_relationships_data(
    matches: DataFrame,
    value_col: str,
    name_col: str,
    top_n: int = 10,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Top-N rows by relationship value with an explicit bar rank
    (charts.py:17 ``nlargest(top_n, 'total_relationship_value')``).

    Ties break on the name column so the frame is deterministic (the
    reference inherits pandas' input order). Rank is applied AFTER the
    top-N limit, so the window's single-partition stage sees only N rows.
    """
    top = matches.orderBy(F.desc(value_col), F.asc(name_col)).limit(top_n)
    # deliberate single ≤N-row group (see partitioning.one_group)
    w = Window.partitionBy(one_group(name_col)).orderBy(
        F.desc(value_col), F.asc(name_col)
    )
    return top.select(
        name_col, value_col, *extra_cols
    ).withColumn("rank", F.row_number().over(w).cast("long"))


def match_type_distribution(matches: DataFrame, type_col: str = "match_type") -> DataFrame:
    """Counts + share per match type (charts.py:72 ``value_counts`` →
    pie labels/values). One map-side-combined groupBy; the total for the
    pct column comes from a window over the tiny aggregate, not a second
    scan of the input."""
    agg = matches.groupBy(type_col).agg(F.count("*").alias("n"))
    total = Window.partitionBy(one_group(type_col))
    return agg.select(
        type_col,
        "n",
        F.round(F.lit(100.0) * F.col("n") / F.sum("n").over(total), 4).alias("pct"),
    )


def score_distribution(
    scored: DataFrame, score_col: str = "score", bucket: float = 0.05
) -> DataFrame:
    """Score-bucket histogram (the match-quality panel of the summary
    dashboard, charts.py:300-320; same shape as scoring.score_histogram
    plus a share column)."""
    agg = (
        scored.groupBy(
            F.round(F.floor(F.col(score_col) / bucket) * bucket, 6).alias("score_bucket")
        )
        .agg(F.count("*").alias("n_pairs"))
    )
    total = Window.partitionBy(one_group("score_bucket"))
    return agg.select(
        "score_bucket",
        "n_pairs",
        F.round(F.lit(100.0) * F.col("n_pairs") / F.sum("n_pairs").over(total), 4).alias("pct"),
    ).orderBy("score_bucket")


def expiry_timeline_data(
    matches: DataFrame,
    date_col: str,
    value_col: str,
    name_col: str,
    sentinel: str = "Not specified",
) -> DataFrame:
    """Contract-expiry timeline rows (charts.py:102-136): drop the
    sentinel/null dates, coerce with null-on-failure (the reference's
    ``pd.to_datetime(errors='coerce')``), keep parseable rows, and emit
    the bounded marker size ``min(20, max(8, value/50000))`` the scatter
    uses. Ordering is left to the consumer (a global sort of all rows is
    the renderer's concern, not the engine's).

    Accepted date formats (coalesced null-on-failure, first match wins):
    ``yyyy-MM-dd``, ``yyyy-MM-dd HH:mm:ss``, ``MM/dd/yyyy`` — the common
    shapes ``pd.to_datetime`` coerces in the reference's exports. Anything
    else is dropped, as ``errors='coerce'`` would drop it."""
    raw = F.col(date_col).cast("string")
    parsed = F.coalesce(
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(raw, F.lit("MM/dd/yyyy")),
    )
    return (
        matches.filter(F.col(date_col).isNotNull() & (F.col(date_col) != sentinel))
        .withColumn("end_date", parsed.cast("date"))
        .filter(F.col("end_date").isNotNull())
        .select(
            name_col,
            "end_date",
            value_col,
            F.least(
                F.lit(20.0), F.greatest(F.lit(8.0), F.col(value_col) / F.lit(50000.0))
            ).alias("marker_size"),
        )
    )


def summary_metrics_data(
    matches: DataFrame,
    total_candidates: int,
    vendor_value_col: str,
    client_value_col: str,
) -> DataFrame:
    """One-row summary dashboard frame (charts.py:271-305): match success
    rate against the candidate universe + total value breakdown.

    Value totals sum in DECIMAL (exact, order-independent) and cast back
    to double: a naive double sum over millions of rows is partition-
    order-dependent in its last bits, so the same data would report
    different totals run-to-run. decimal(30,6) holds |v| < 10^24 per row
    (a previous 18,6 cast silently NULLed — i.e. dropped from the sum —
    any row at or above 10^12 under non-ANSI overflow semantics); Spark
    widens the sum to decimal(38,6), DuckDB to DECIMAL(38,6), so the
    oracle twin stays exact."""
    exact_sum = lambda c: F.round(  # noqa: E731
        F.sum(F.col(c).cast("decimal(30,6)")), 2
    ).cast("double")
    return matches.agg(
        F.count("*").alias("n_matched"),
        F.lit(int(total_candidates)).cast("long").alias("n_candidates"),
        F.round(F.lit(100.0) * F.count("*") / F.lit(max(int(total_candidates), 1)), 4).alias(
            "success_rate_pct"
        ),
        exact_sum(vendor_value_col).alias("total_vendor_value"),
        exact_sum(client_value_col).alias("total_client_value"),
    )


def match_quality_data(
    matches: DataFrame, type_col: str = "match_type", score_col: str = "score"
) -> DataFrame:
    """Mean score per match type (charts.py:314
    ``groupby('match_type')['match_score'].mean()``)."""
    return matches.groupBy(type_col).agg(
        F.round(F.avg(score_col), 6).alias("avg_score"),
        F.count("*").alias("n"),
    )
