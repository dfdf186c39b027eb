"""Connected components: known graphs, transitive chains, idempotence."""

from ai_data_matching_spark.operators.clustering import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    labels, iters = connected_components(df)
    comp = {r["url"]: r["component"] for r in labels.collect()}
    return comp, iters


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
