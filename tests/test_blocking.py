"""Blocking: sketch determinism, exact-group edges, hot-key skew
splitting, salted-join round-trip (SURVEY §4 custom work items 1 & 3)."""

from pyspark.sql import functions as F

from ai_data_matching_spark.operators.blocking import (
    candidate_pairs,
    exact_match_edges,
    salted_equijoin,
    with_blocking_keys,
)


def _blocked(spark):
    rows = [
        ("http://a.com/1", "alpha beta gamma delta epsilon zeta", "en"),
        ("http://www.a.com/2", "alpha beta gamma delta epsilon zeta", "en"),  # exact dup
        ("http://a.com/3", "alpha beta gamma delta epsilon QQQ", "en"),       # near dup
        ("http://b.com/1", "totally different words here now ok", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, norm_text string, lang string")
    return with_blocking_keys(df)


def test_simhash_deterministic_and_near(spark):
    b = _blocked(spark).select("url", "simhash").collect()
    sh = {r["url"]: r["simhash"] for r in b}
    assert sh["http://a.com/1"] == sh["http://www.a.com/2"]  # identical text
    # near-duplicate text → small hamming distance
    ham = bin((sh["http://a.com/1"] ^ sh["http://a.com/3"]) & (2**64 - 1)).count("1")
    assert ham < 24
    # unrelated text → large distance
    ham2 = bin((sh["http://a.com/1"] ^ sh["http://b.com/1"]) & (2**64 - 1)).count("1")
    assert ham2 > ham


def test_exact_match_edges_star_shape(spark):
    blocked = _blocked(spark)
    edges = exact_match_edges(blocked).collect()
    assert len(edges) == 1
    e = edges[0]
    assert e["src"] == "http://www.a.com/2" and e["dst"] == "http://a.com/1"
    assert e["score"] == 1.0 and e["match_type"] == "exact"


def test_candidate_pairs_and_hot_key_exclusion(spark):
    # one hot domain with 30 unrelated pages + one small domain pair
    hot = [(f"http://hub.com/{i}", f"unique text number {i} padding words", "en") for i in range(30)]
    cold = [
        ("http://c.com/1", "shared cold text one two three", "en"),
        ("http://c.com/2", "shared cold text one two four", "en"),
    ]
    df = spark.createDataFrame(hot + cold, "url string, norm_text string, lang string")
    blocked = with_blocking_keys(df)
    pairs, overflow = candidate_pairs(blocked, max_block_size=10)
    ov = {r["block_key"] for r in overflow.collect()}
    assert "dom:hub.com" in ov
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert ("http://c.com/1", "http://c.com/2") in got
    # no dom-key pairs from the hot domain (band collisions may still pair a few)
    assert len(got) < 30


def test_band_pairs_hamming_filtered(spark):
    """Band-key collisions between textually-unrelated pages (simhash
    Hamming > threshold) must not become candidate pairs, while
    domain-key pairs survive regardless of sketch distance."""
    base = " ".join(f"word{i:02d}" for i in range(40))
    rows = [
        ("http://x1.com/p", base, "en"),
        ("http://x2.com/p", base, "en"),  # cross-domain mirror (hamming 0)
        ("http://y.com/a", "one twoo three fourr fivee sixxx seven", "en"),
        ("http://y.com/b", "completely unrelated content words here", "en"),  # same domain, far text
    ]
    df = spark.createDataFrame(rows, "url string, norm_text string, lang string")
    pairs, _ = candidate_pairs(with_blocking_keys(df))
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    # same-domain pair kept even though texts are unrelated
    assert ("http://y.com/a", "http://y.com/b") in got
    # cross-domain near-dup found via band keys (small hamming)
    assert ("http://x1.com/p", "http://x2.com/p") in got
    # no pairing of unrelated cross-domain pages
    assert ("http://x1.com/p", "http://y.com/b") not in got
    assert ("http://x1.com/p", "http://y.com/a") not in got


def test_salted_join_round_trips(spark):
    fact = spark.range(0, 2000).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [("0", "zero"), ("1", "one"), ("2", "two")], "k string, name string"
    )
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_equijoin(fact, dim, "k", n_salt=4, hot_key_threshold=100)
    assert salted.count() == plain.count()
    assert salted.select("k", "v", "name").exceptAll(plain).count() == 0
    assert plain.exceptAll(salted.select("k", "v", "name")).count() == 0


def test_exact_edges_null_domain_group_kept(spark):
    """Pages with a null norm_domain (unparseable url) that share a simhash
    must still form an exact group — the join-back is null-safe."""
    from ai_data_matching_spark.operators.blocking import exact_match_edges

    rows = [("u1", None, 42), ("u2", None, 42), ("u3", "a.com", 42)]
    blocked = spark.createDataFrame(rows, "url string, norm_domain string, simhash long")
    edges = exact_match_edges(blocked)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {("u2", "u1")}


def test_fused_extract_sketch_parity(spark):
    """with_extract_sketch_keys (one Arrow pass) must equal the staged
    with_blocking_keys(with_extracted_normalized(df)) path — columns,
    order, and values."""
    from ai_data_matching_spark.extract import with_extracted_normalized
    from ai_data_matching_spark.operators.blocking import with_extract_sketch_keys
    from ai_data_matching_spark.synth import generate_pages

    pages = generate_pages(spark, 200, seed=11).drop("entity_id")
    staged = with_blocking_keys(with_extracted_normalized(pages).drop("text"))
    fused = with_extract_sketch_keys(pages)
    assert fused.columns == staged.columns
    a = sorted(map(tuple, staged.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b


def test_latest_crawl_wins_is_column_order_independent(spark):
    """The survivor must be keyed by NAME (warc_ts leading), not by frame
    column order — a frame passed as (url, lang, warc_ts) must not pick
    the max-lang row."""
    from ai_data_matching_spark.operators.blocking import latest_crawl_wins

    rows = [
        ("u1", "zz", "2020-01-01 00:00:00"),   # older crawl, max lang
        ("u1", "aa", "2021-01-01 00:00:00"),   # latest crawl, min lang
    ]
    df = spark.createDataFrame(rows, "url string, lang string, warc_ts string").select(
        "url", "lang", F.to_timestamp("warc_ts").alias("warc_ts")
    )
    out = {r["url"]: r["lang"] for r in latest_crawl_wins(df).collect()}
    assert out == {"u1": "aa"}

    # and the canonical column order picks the same survivor
    out2 = {
        r["url"]: r["lang"]
        for r in latest_crawl_wins(df.select("url", "warc_ts", "lang")).collect()
    }
    assert out2 == {"u1": "aa"}


def test_minhash_band_keys_tile_any_k(spark):
    """Band keys must tile the signature for non-default k (regression:
    rows_per_band was hardcoded to 4, so k=8 sliced past the signature and
    bands 2-3 collapsed to one constant key for every doc)."""
    from ai_data_matching_spark.functions.hashing import minhash_band_keys

    rows = [
        ("http://a.com/1", "alpha beta gamma delta epsilon zeta", "en"),
        ("http://b.com/1", "totally different words here now ok", "en"),
    ]
    base = spark.createDataFrame(rows, "url string, norm_text string, lang string")
    df = with_blocking_keys(base, minhash_k=8, use_minhash_bands=True)
    rows = df.select("block_keys").collect()
    mh = [sorted(k for k in r["block_keys"] if k.startswith("mh")) for r in rows]
    # with 4 bands over k=8 every doc gets 4 distinct mh keys, and docs with
    # different text must not share all four
    assert all(len(ks) == 4 for ks in mh)
    assert len({tuple(ks) for ks in mh}) > 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        minhash_band_keys(F.col("minhash_sig"), n_bands=3, k=16)
