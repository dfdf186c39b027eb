"""Chart-data aggregates (operators/charts.py — reference charts.py analog)."""

import datetime

from pyspark.sql import functions as F

from ai_data_matching_spark.operators.charts import (
    expiry_timeline_data,
    match_quality_data,
    match_type_distribution,
    score_distribution,
    summary_metrics_data,
    top_relationships_data,
)


def _matches(spark):
    rows = [
        # name, value, match_type, score, end_date, vendor_v, client_v
        ("acme", 900.0, "exact", 1.0, "2026-01-15", 600.0, 300.0),
        ("beta", 500.0, "fuzzy", 0.9, "Not specified", 200.0, 300.0),
        ("gama", 500.0, "fuzzy", 0.87, None, 450.0, 50.0),
        ("delt", 100.0, "exact", 1.0, "2025-06-30", 60.0, 40.0),
        ("epsi", 50.0, "fuzzy", 0.86, "garbage-date", 30.0, 20.0),
    ]
    return spark.createDataFrame(
        rows,
        "name string, value double, match_type string, score double, "
        "end_date string, vendor_v double, client_v double",
    )


def test_top_relationships_rank_and_ties(spark):
    got = top_relationships_data(_matches(spark), "value", "name", top_n=3).collect()
    # desc value, name tiebreak: acme(900), beta(500), gama(500)
    assert [(r["name"], r["rank"]) for r in got] == [("acme", 1), ("beta", 2), ("gama", 3)]


def test_match_type_distribution_pct(spark):
    got = {r["match_type"]: r for r in match_type_distribution(_matches(spark)).collect()}
    assert got["exact"]["n"] == 2 and got["fuzzy"]["n"] == 3
    assert got["exact"]["pct"] == 40.0 and got["fuzzy"]["pct"] == 60.0


def test_score_distribution_buckets_sum_to_100(spark):
    got = score_distribution(_matches(spark), "score", bucket=0.05).collect()
    assert abs(sum(r["pct"] for r in got) - 100.0) < 1e-6
    buckets = {r["score_bucket"]: r["n_pairs"] for r in got}
    assert buckets[1.0] == 2          # the two exact 1.0 scores
    assert buckets[0.85] == 2         # 0.87, 0.86 floor to 0.85
    assert buckets[0.9] == 1          # 0.9 sits on its own bucket boundary

def test_expiry_timeline_filters_and_marker(spark):
    got = expiry_timeline_data(_matches(spark), "end_date", "value", "name").collect()
    # sentinel, null and unparseable dates dropped — only acme + delt remain
    assert {r["name"] for r in got} == {"acme", "delt"}
    by = {r["name"]: r for r in got}
    assert by["acme"]["end_date"] == datetime.date(2026, 1, 15)
    # marker size = min(20, max(8, value/50000)) → both clamp to the floor
    assert by["acme"]["marker_size"] == 8.0 and by["delt"]["marker_size"] == 8.0
    big = spark.createDataFrame(
        [("mega", 2_000_000.0, "2026-01-01")], "name string, value double, end_date string"
    )
    r = expiry_timeline_data(big, "end_date", "value", "name").collect()[0]
    assert r["marker_size"] == 20.0   # ceiling clamp


def test_expiry_timeline_accepts_common_formats(spark):
    """The coercion mirrors pd.to_datetime(errors='coerce') on the three
    shapes reference exports actually contain: date, datetime, slashed
    (ADVICE r03 — only yyyy-MM-dd parsed before, silently dropping the
    rest)."""
    rows = [
        ("iso", 1.0, "2026-01-15"),
        ("dt", 1.0, "2026-01-15 00:00:00"),
        ("us", 1.0, "01/15/2026"),
        ("junk", 1.0, "15 Jan 2026"),   # not an accepted shape → dropped
    ]
    df = spark.createDataFrame(rows, "name string, value double, end_date string")
    got = {r["name"]: r["end_date"] for r in
           expiry_timeline_data(df, "end_date", "value", "name").collect()}
    assert got == {k: datetime.date(2026, 1, 15) for k in ("iso", "dt", "us")}


def test_summary_and_quality(spark):
    m = _matches(spark)
    s = summary_metrics_data(m, total_candidates=10, vendor_value_col="vendor_v",
                             client_value_col="client_v").collect()[0]
    assert s["n_matched"] == 5 and s["success_rate_pct"] == 50.0
    assert s["total_vendor_value"] == 1340.0 and s["total_client_value"] == 710.0
    q = {r["match_type"]: r for r in match_quality_data(m).collect()}
    assert q["exact"]["avg_score"] == 1.0 and q["exact"]["n"] == 2
    assert abs(q["fuzzy"]["avg_score"] - round((0.9 + 0.87 + 0.86) / 3, 6)) < 1e-9


def test_top_relationships_plan_is_take_ordered(spark):
    df = top_relationships_data(_matches(spark), "value", "name", top_n=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
