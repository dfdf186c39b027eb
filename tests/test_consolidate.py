"""Cluster consolidation: member-detail cap, match-quality flag."""

from pyspark.sql import functions as F

from ai_data_matching_spark.operators.consolidate import consolidate_clusters


def test_member_cap_does_not_affect_counts(spark):
    assigned = spark.createDataFrame(
        [(f"http://d.com/{i}", "d.com", "en", "c0") for i in range(10)],
        "url string, norm_domain string, lang string, cluster_id string",
    ).withColumn("warc_ts", F.current_timestamp())
    edges = spark.createDataFrame(
        [("http://d.com/0", "http://d.com/1", "exact")],
        "src string, dst string, match_type string",
    )
    row = consolidate_clusters(assigned, edges, max_members=3).collect()[0]
    assert row["n_pages"] == 10
    assert len(row["members"]) == 3
    # capped members are the lexicographically-first urls (deterministic)
    assert [m["url"] for m in row["members"]] == [
        "http://d.com/0", "http://d.com/1", "http://d.com/2"
    ]
    assert row["match_quality"] == "Exact"


def test_match_quality_fuzzy_when_no_exact_edges(spark):
    assigned = spark.createDataFrame(
        [("http://a.com/1", "a.com", "en", "c0"), ("http://a.com/2", "a.com", "en", "c0")],
        "url string, norm_domain string, lang string, cluster_id string",
    ).withColumn("warc_ts", F.current_timestamp())
    edges = spark.createDataFrame(
        [("http://a.com/1", "http://a.com/2", "fuzzy")],
        "src string, dst string, match_type string",
    )
    row = consolidate_clusters(assigned, edges).collect()[0]
    assert row["match_quality"] == "Fuzzy"
    assert row["n_pages"] == 2
