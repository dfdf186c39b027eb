"""ANN: brute-force exactness vs numpy oracle; LSH recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_data_matching_spark.operators.similarity_search import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_bruteforce_matches_numpy_oracle(spark, emb):
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = cosine_topk_bruteforce(emb, queries, k=3).collect()

    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)

    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        qv = mat[ids == qid][0]
        sims = mat @ qv / (norms * np.linalg.norm(qv))
        sims[ids == qid] = -np.inf
        best = ids[np.argsort(-sims)][:3]
        got_ids = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        # cosine values must match the oracle to 1e-5 (ties may reorder ids)
        want = sorted(np.sort(sims)[::-1][:3].round(5))
        have = sorted(round(r["cosine"], 5) for r in rows)
        assert have == pytest.approx(want, abs=2e-5), qid
        assert len(got_ids) == 3


def test_lsh_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    # these synthetic embeddings have only moderately-similar neighbors
    # (mean top-5 cosine ≪ 1), so recall needs short hashes + many tables
    approx = cosine_topk_lsh(emb, queries, k=5, bits=4, n_tables=12)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # measured 0.82 at this config


def test_lsh_candidates_shrink(spark, emb):
    """The point of LSH: the candidate set is much smaller than N×Q."""
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    n, q = emb.count(), queries.count()
    approx = cosine_topk_lsh(emb, queries, k=10**9, bits=8, n_tables=2)
    n_cand = approx.count()
    assert n_cand < 0.5 * n * q


def test_ivf_contract_params_are_exact_at_driver_sf(spark):
    """The k-means quantizer at the contract params (8 centroids, nprobe
    6) reproduces the exact brute-force top-k at sf0.01 — a measured
    recall-1.0 point for the production path. (The ORACLED ann_ivf_topk
    query uses quantizer='anchor_ids' instead, whose oracle replays the
    semantics exactly at every sf — see the replay test below; sf0.001's
    embeddings have near-orthogonal top-3 neighbors that defeat ANY
    non-exhaustive probe — recall there is gated separately below.)"""
    from ai_data_matching_spark.operators.similarity_search import cosine_topk_ivf

    emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb01.filter(F.col("vec_id") % 100 == 0)
    exact = cosine_topk_bruteforce(emb01, queries, k=3)
    approx = cosine_topk_ivf(emb01, queries, k=3, n_centroids=8, nprobe=6)
    e = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in approx.collect()}
    assert a == e


def test_ivf_recall_bound_on_adversarial_embeddings(spark, emb):
    """sf0.001: the hard case for a coarse quantizer (top neighbors are
    near-orthogonal to their query, so list locality is weak). The probe
    path must still recover most of the exact top-3."""
    from ai_data_matching_spark.operators.similarity_search import cosine_topk_ivf

    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = cosine_topk_bruteforce(emb, queries, k=3)
    approx = cosine_topk_ivf(emb, queries, k=3, n_centroids=8, nprobe=6)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.7  # measured 0.8 at this config


def test_ivf_candidates_shrink_and_recall_degrades_gracefully(spark, emb):
    """Approximate regime: fewer probes ⇒ strictly bounded candidate set,
    recall stays usable (data-adaptive lists beat random assignment)."""
    from ai_data_matching_spark.operators.similarity_search import cosine_topk_ivf

    queries = emb.filter(F.col("vec_id") % 50 == 0)
    n, q = emb.count(), queries.count()
    approx = cosine_topk_ivf(emb, queries, k=10**9, n_centroids=8, nprobe=2)
    n_cand = approx.count()
    assert n_cand < 0.5 * n * q
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    top = cosine_topk_ivf(emb, queries, k=5, n_centroids=8, nprobe=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in top.collect()}
    assert len(e & a) / len(e) >= 0.4  # measured 0.53 at this config


def test_ivf_anchor_quantizer_matches_numpy_replay(spark, emb):
    """quantizer='anchor_ids' has engine-independent semantics (anchors =
    lowest-id rows; assignment/probe = argmax of round(cos, 6), ties to
    the lowest anchor index). Replay them independently in numpy and
    require EXACT (query, neighbor, rank) equality — the same property
    the DuckDB oracle certifies cross-engine for ann_ivf_topk. Rounding
    in the replay is half-away-from-zero (the Spark/DuckDB rule) via
    _round_half_away, NOT np.round (half-even), so the replay can't pass
    or fail on a rounding-rule difference."""
    from ai_data_matching_spark.operators.similarity_search import (
        _round_half_away,
        cosine_topk_ivf,
    )

    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_ivf(
            emb, queries, k=3, n_centroids=8, nprobe=6, quantizer="anchor_ids"
        ).collect()
    }

    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    anchors = xn[:8]  # pdf is id-ordered: the 8 lowest vec_ids
    sims = _round_half_away(xn @ anchors.T, 6)
    assign = np.argsort(-sims, axis=1, kind="stable")[:, 0]
    want = set()
    for qi in np.flatnonzero(ids % 100 == 0):
        probes = np.argsort(-sims[qi], kind="stable")[:6]
        cand = np.flatnonzero(np.isin(assign, probes) & (ids != ids[qi]))
        cos = _round_half_away(xn[cand] @ xn[qi], 6)
        ordered = sorted(zip(-cos, ids[cand]))[:3]
        for rank, (_negc, nid) in enumerate(ordered, 1):
            want.add((int(ids[qi]), int(nid), rank))
    assert got == want and got


def test_round_half_away_matches_duckdb_and_spark():
    """_round_half_away is the cross-engine contract the anchor_ids IVF
    leans on: pin it against DuckDB's round() on exact .5 boundaries
    (where np.round's banker's rule disagrees) and on random doubles,
    property-style."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ai_data_matching_spark.operators.similarity_search import _round_half_away

    con = duckdb.connect()

    def duck(v: float) -> float:
        return con.execute("SELECT round(?::DOUBLE, 6)", [v]).fetchone()[0]

    # exact representable halves at the 6th decimal (2^-7 and odd
    # multiples): away-from-zero and banker's agree only when rounding
    # away lands on an even digit, so 0.0078125 (→ ...12 vs ...13)
    # separates the rules while 0.0234375 (→ ...438 both ways) doesn't
    for v in (0.0078125, -0.0078125, 0.0234375, -0.0234375):
        assert _round_half_away(np.array([v]), 6)[0] == duck(v), v
    for v in (0.0078125, -0.0078125):
        assert np.round(v, 6) != duck(v)  # proves the rules differ here

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False))
    def prop(v):
        assert _round_half_away(np.array([v]), 6)[0] == duck(v)

    prop()


def test_ivf_training_is_deterministic(spark, emb):
    """Two trainings over differently-partitioned inputs give the same
    centroids (hash-ordered sample, fixed init — no RNG state)."""
    from ai_data_matching_spark.operators.similarity_search import train_ivf_centroids

    c1 = train_ivf_centroids(emb.repartition(7), 8)
    c2 = train_ivf_centroids(emb.coalesce(1), 8)
    assert np.allclose(c1, c2)
