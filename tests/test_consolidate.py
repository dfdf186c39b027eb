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
    # oversized cluster: deterministic hash-sampled members, capped, sorted
    urls = [m["url"] for m in row["members"]]
    assert 1 <= len(urls) <= 3
    assert urls == sorted(urls)
    assert set(urls) <= {f"http://d.com/{i}" for i in range(10)}
    # determinism: same input → same sample
    row2 = consolidate_clusters(assigned, edges, max_members=3).collect()[0]
    assert [m["url"] for m in row2["members"]] == urls
    assert row["match_quality"] == "Exact"


def test_small_cluster_members_complete_and_sorted(spark):
    assigned = spark.createDataFrame(
        [(f"http://s.com/{i}", "s.com", "en", "c0") for i in (3, 1, 2)],
        "url string, norm_domain string, lang string, cluster_id string",
    ).withColumn("warc_ts", F.current_timestamp())
    edges = spark.createDataFrame([], "src string, dst string, match_type string")
    row = consolidate_clusters(assigned, edges, max_members=10).collect()[0]
    assert [m["url"] for m in row["members"]] == [
        "http://s.com/1", "http://s.com/2", "http://s.com/3"
    ]


def test_mega_cluster_completes_without_single_task_sort(spark):
    """10^5-member cluster: the capped member array must come from a hash
    sample + bounded agg buffer, never a full per-cluster sort window."""
    n = 100_000
    assigned = (
        spark.range(n)
        .select(
            F.concat(F.lit("http://m.com/"), F.format_string("%06d", "id")).alias("url"),
            F.lit("m.com").alias("norm_domain"),
            F.lit("en").alias("lang"),
            F.lit("mega").alias("cluster_id"),
            F.current_timestamp().alias("warc_ts"),
        )
        .repartition(8)
    )
    edges = spark.createDataFrame([], "src string, dst string, match_type string")
    out = consolidate_clusters(assigned, edges, max_members=100)
    # no Window/Sort over the cluster partition in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    row = out.collect()[0]
    assert row["n_pages"] == n
    urls = [m["url"] for m in row["members"]]
    assert 0 < len(urls) <= 100
    assert urls == sorted(urls)


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
