"""Connected components: known graphs, transitive chains, idempotence.

All graph-shape tests force the ITERATIVE star path
(small_graph_threshold=0); the hybrid driver union-find is asserted
equivalent to it in test_hybrid_matches_iterative."""

import random

from ai_data_matching_spark.operators.clustering import connected_components


def _cc(spark, edges, threshold=0):
    df = spark.createDataFrame(edges, "src string, dst string")
    labels, iters = connected_components(df, small_graph_threshold=threshold)
    comp = {r["url"]: r["component"] for r in labels.collect()}
    return comp, iters


def test_hybrid_matches_iterative(spark):
    rng = random.Random(7)
    nodes = [f"u{i:04d}" for i in range(400)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(300)]
    it_comp, it_iters = _cc(spark, edges, threshold=0)
    uf_comp, uf_iters = _cc(spark, edges, threshold=10**6)
    assert it_iters > 0 and uf_iters == 0
    assert it_comp == uf_comp


def test_two_components(spark):
    comp, _ = _cc(spark, [("b", "a"), ("c", "b"), ("e", "d")])
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"


def test_long_chain_converges_logarithmically(spark):
    n = 32
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    comp, iters = _cc(spark, edges)
    assert len(set(comp.values())) == 1
    assert all(c == "n000" for c in comp.values())
    assert iters <= 10  # O(log n), not O(n) label propagation


def test_star_input_is_fixpoint(spark):
    comp, iters = _cc(spark, [("b", "a"), ("c", "a"), ("d", "a")])
    assert set(comp.values()) == {"a"}
    assert iters <= 2


def test_duplicate_and_reversed_edges(spark):
    comp, _ = _cc(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("c", "b")])
    assert comp["a"] == comp["b"] == comp["c"] == "a"
