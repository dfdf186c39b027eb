"""End-to-end gates: pairwise F1 ≥ 0.99 on labeled pairs at fixed blocking
key (BASELINE.json metric), transitive-chain merging, near-miss rejection,
and synth similarity calibration."""

import pytest
from pyspark.sql import functions as F

from ai_data_matching_spark.functions.similarity import indel_ratio
from ai_data_matching_spark.pipeline import pairwise_f1, run_pipeline
from ai_data_matching_spark.synth import (
    K_CHAIN,
    K_NEARMISS,
    generate_pages,
)


@pytest.fixture(scope="module")
def result(spark, pages_small):
    return run_pipeline(spark, pages_small.drop("entity_id"))


def test_pairwise_f1_gate(result, labels_small):
    m = pairwise_f1(result.assigned, labels_small)
    assert m["f1"] >= 0.99, m
    assert m["precision"] >= 0.99, m
    assert m["recall"] >= 0.99, m
    # the 1.0 must not be vacuous: every labeled pair was evaluated
    # (both urls joined an assignment) — an empty label join would pass
    # the zero-guards above with tp=fp=fn=0
    assert m["n_evaluated"] == labels_small.count(), m


def test_pairwise_f1_negative_controls(result, labels_small, spark):
    """The metric must actually move: an all-one-cluster assignment fails
    precision (labeled non-matches co-cluster); an all-singleton
    assignment fails recall (labeled matches split); and an assignment
    whose urls don't join the labels reports n_evaluated == 0 instead of
    a silent perfect score."""
    assigned = result.assigned
    one = assigned.withColumn("cluster_id", F.lit("all"))
    m1 = pairwise_f1(one, labels_small)
    assert m1["precision"] < 0.99 and m1["fp"] > 0, m1
    singletons = assigned.withColumn("cluster_id", F.col("url"))
    m2 = pairwise_f1(singletons, labels_small)
    assert m2["recall"] < 0.01 and m2["fn"] > 0, m2
    drifted = assigned.withColumn("url", F.concat(F.lit("x://"), F.col("url")))
    m3 = pairwise_f1(drifted, labels_small)
    assert m3["n_evaluated"] == 0 and m3["f1"] == 1.0, m3  # vacuous — caught by the guard


def test_clusters_match_ground_truth_entities(result, pages_small):
    """Every predicted cluster maps to exactly one ground-truth entity and
    vice versa (cluster equality, SURVEY §5 item 3)."""
    truth = pages_small.select("url", "entity_id")
    j = result.assigned.select("url", "cluster_id").join(truth, "url")
    # each cluster contains one entity
    impure = (
        j.groupBy("cluster_id").agg(F.countDistinct("entity_id").alias("n")).filter("n > 1").count()
    )
    # each entity lands in one cluster
    split = (
        j.groupBy("entity_id").agg(F.countDistinct("cluster_id").alias("n")).filter("n > 1").count()
    )
    assert impure == 0
    assert split == 0


def test_transitive_chain_merged(spark, result, pages_small):
    """A~B, B~C with sim(A,C) < threshold must still co-cluster (C5)."""
    chain_pages = pages_small.filter(F.col("url").like("%e___.site%/p%")).select(
        "url", "entity_id"
    )
    j = result.assigned.join(chain_pages, "url")
    sizes = (
        j.groupBy("entity_id")
        .agg(F.countDistinct("cluster_id").alias("n_clusters"), F.count("*").alias("n"))
        .filter(F.col("n") == 3)
    )
    bad = sizes.filter(F.col("n_clusters") > 1).count()
    assert bad == 0


def test_synth_similarity_calibration(spark):
    """Chain adjacent ≈ 0.90 ≥ .85; chain ends ≈ 0.81 < .85; near-miss < .85."""
    pages = generate_pages(spark, 200, seed=42)
    pdf = pages.toPandas()
    by_entity = pdf.groupby("entity_id")
    checked_chain = checked_nm = 0
    for _, grp in by_entity:
        texts = grp.sort_values("url")["text"].tolist()
        if len(texts) == 3 and "site" in grp["url"].iloc[0]:
            s01 = indel_ratio(texts[0], texts[1])
            s02 = indel_ratio(texts[0], texts[2])
            s12 = indel_ratio(texts[1], texts[2])
            sims = sorted([s01, s02, s12])
            # two adjacent links above threshold, one end-to-end below
            if sims[0] < 0.85 and sims[1] >= 0.86 and sims[2] >= 0.86:
                checked_chain += 1
    # near-miss: consecutive entity ids on a shared nm domain
    nm = pdf[pdf.url.str.contains("site-")].groupby(
        pdf.url.str.extract(r"http://(?:www\.)?([^/]+)")[0]
    )
    for dom, grp in nm:
        if grp["entity_id"].nunique() == 2 and len(grp) == 2:
            a, b = grp["text"].tolist()
            s = indel_ratio(a, b)
            assert s < 0.85, (dom, s)
            assert s > 0.70
            checked_nm += 1
    assert checked_chain > 0
    assert checked_nm > 0


def test_near_miss_not_merged(result, pages_small):
    """Qualcomm/Qualtrics class: two entities on a shared domain with sim
    just below threshold must stay separate clusters."""
    truth = pages_small.select("url", "entity_id")
    j = result.assigned.select("url", "cluster_id").join(truth, "url")
    merged_entities = (
        j.groupBy("cluster_id").agg(F.countDistinct("entity_id").alias("n")).filter("n > 1")
    )
    assert merged_entities.count() == 0


def test_stats_shape(result):
    row = result.stats.collect()[0]
    assert row["n_pages"] > 0
    assert 0 < row["n_clusters"] <= row["n_pages"]
    assert row["n_exact_edges"] > 0
    assert row["n_fuzzy_edges"] > 0
