"""J1 reference-shape probe join: variant priority order + first-build-row
tiebreak (matching_engine.py:88-130 with the §2.7 traps fixed)."""

from pyspark.sql import functions as F

from ai_data_matching_spark.operators.variant_join import exact_match_via_variants


def test_priority_and_bucket_order(spark):
    # probe "Acme Inc" has variants: 0="Acme Inc", 1="acme".
    # build has: client 20 named "acme" (normalized bucket), client 10
    # named "Acme Inc" (original-string bucket). Priority 0 must win even
    # though client 20 has a smaller... make client ids force the trap:
    probe = spark.createDataFrame([(1, "Acme Inc")], "pid long, name string")
    build = spark.createDataFrame(
        [(20, "acme"), (10, "Acme Inc")], "bid long, name string"
    )
    got = exact_match_via_variants(
        probe, build, "pid", "bid", "name", "name"
    ).collect()
    assert len(got) == 1
    r = got[0]
    # "Acme Inc" (priority 0) matches client 10's original variant — the
    # priority-1 "acme" bucket (client 20) must NOT win
    assert r["build_id"] == 10 and r["probe_priority"] == 0
    assert r["match_variant"] == "Acme Inc" and r["score"] == 1.0


def test_first_build_row_tiebreak(spark):
    probe = spark.createDataFrame([(1, "Widget Corp")], "pid long, name string")
    build = spark.createDataFrame(
        [(7, "Widget Corp"), (3, "Widget Corp")], "bid long, name string"
    )
    got = exact_match_via_variants(probe, build, "pid", "bid", "name", "name").collect()
    assert len(got) == 1 and got[0]["build_id"] == 3  # min build id = "first row"


def test_short_names_never_match(spark):
    probe = spark.createDataFrame([(1, "ab")], "pid long, name string")
    build = spark.createDataFrame([(2, "ab")], "bid long, name string")
    assert exact_match_via_variants(probe, build, "pid", "bid", "name", "name").count() == 0


def test_hot_variant_cap_bounds_join(spark):
    """A stop-word-like variant shared by 10⁴ build rows must be skew-split
    out of the join: probes relying only on the hot variant go unmatched,
    probes with a cold variant still match, and the overflow frame reports
    the excluded bucket with its size."""
    n_hot = 10_000
    build = spark.createDataFrame(
        [(i, "Common Name") for i in range(n_hot)] + [(n_hot, "Rare Name")],
        "bid long, name string",
    )
    probe = spark.createDataFrame(
        [(1, "Common Name"), (2, "Rare Name")], "pid long, name string"
    )
    got, overflow = exact_match_via_variants(
        probe, build, "pid", "bid", "name", "name",
        max_bucket_size=100, return_overflow=True,
    )
    rows = {r["probe_id"]: r for r in got.collect()}
    assert 1 not in rows                      # hot bucket excluded → no match
    assert rows[2]["build_id"] == n_hot       # cold bucket still matches
    ov = {r["variant"]: r["bucket_size"] for r in overflow.collect()}
    # the hot name's variant bucket blows the cap and is reported (the
    # normalized slot equals lower(raw) so only the original slot exists)
    assert ov == {"Common Name": n_hot}

    # and the bounded-join claim itself: with the cap, the pre-aggregate
    # join emits only cold-bucket rows (2 variants of one rare build row
    # joined by one probe = ≤ a handful), never the 2×10⁴ hot rows
    uncapped = exact_match_via_variants(probe, build, "pid", "bid", "name", "name")
    assert uncapped.count() == 2              # argmin still bounds OUTPUT rows
    assert got.count() == 1
