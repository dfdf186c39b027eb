"""Persist-handle discipline: release_persisted() drops every operator
cache (VERDICT r01: persist() without unpersist())."""

from pyspark.sql import functions as F

from ai_data_matching_spark.cache import release_persisted


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_dedup_persists_released(spark):
    from ai_data_matching_spark.operators.dedup import (
        duplicate_pairs_minhash_lsh,
        duplicate_pairs_simhash,
    )

    release_persisted()  # clean slate (other module-scoped fixtures may cache)
    base = _n_cached(spark)
    docs = spark.createDataFrame(
        [(i, f"some shared words plus unique token {i}") for i in range(30)],
        "doc_id long, text string",
    )
    duplicate_pairs_minhash_lsh(docs, jaccard_threshold=0.5).count()
    duplicate_pairs_simhash(docs).count()
    assert _n_cached(spark) > base
    release_persisted()
    assert _n_cached(spark) == base


def test_pipeline_persists_released(spark):
    from ai_data_matching_spark.pipeline import run_pipeline
    from ai_data_matching_spark.synth import generate_pages

    release_persisted()
    base = _n_cached(spark)
    pages = generate_pages(spark, 120, seed=7).drop("entity_id")
    res = run_pipeline(spark, pages)
    res.assigned.count()
    res.stats.count()
    assert _n_cached(spark) > base
    released = release_persisted()
    assert released > 0
    assert _n_cached(spark) == base
