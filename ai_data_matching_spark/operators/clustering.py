"""Phase 3 — transitive clustering via large-star/small-star connected
components (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC 2014 — public algorithm).

The reference only consolidates matches by exact group-by on the matched
name (/root/reference/src/relationship_mapper.py:20-123), which misses
transitive chains (A~B, B~C ⇒ {A,B,C}). At web scale the pair graph needs
true connected components; large-star/small-star converges in O(log n)
rounds of pure DataFrame joins/aggregations, each round checkpointed to
cut lineage (driver loop — not expressible as a single Catalyst plan).

Node ids are the url strings themselves (total order = lexicographic);
component id = min url in the component. Convergence is detected with a
cheap (count, xor-of-hashes) fingerprint of the edge set instead of a
full set-difference — two aggregates, no extra shuffle of the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors of each node to the neighborhood
    minimum (including the node itself)."""
    sym = _symmetrize(edges).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        F.col("u").alias("mu"), F.least(F.col("u"), F.col("mn")).alias("m")
    )
    return (
        sym.join(m, sym["u"] == m["mu"])
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Operate on edges directed high→low: connect all smaller-or-equal
    neighbors (and the node) to the minimum."""
    directed = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = directed.groupBy("u").agg(F.min("v").alias("m")).select(
        F.col("u").alias("mu"), F.col("m")
    )
    nbrs = directed.join(m, directed["u"] == m["mu"]).select(
        F.col("v").alias("node"), F.col("m"), F.col("u").alias("center")
    )
    # neighbors → min, plus center → min
    out = nbrs.select("node", "m").union(
        nbrs.select(F.col("center").alias("node"), F.col("m"))
    )
    return (
        out.filter(F.col("node") != F.col("m"))
        .select(F.col("node").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("src"), F.col("dst"))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


DEFAULT_SMALL_GRAPH_EDGES = 2_000_000


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Exact same labels as the iterative path, for edge sets that fit the
    driver: one collect + path-compressed union-find + one parallelize.

    Replaces ~20 shuffle barriers (3 CC iterations × two star ops × 3
    shuffles each) with one serial pass — the CC loop is latency-bound,
    not volume-bound, once blocking/dedup has shrunk the graph; this is
    the dominant serial term in the pipeline's Amdahl decomposition.
    """
    import pandas as pd

    rows = edges.select("src", "dst").toPandas()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(rows["src"], rows["dst"]):
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by MIN so the representative is the min url — the same
            # canonical label the star algorithm converges to
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    labels = pd.DataFrame(
        {"url": list(parent), "component": [find(u) for u in parent]}
    )
    return edges.sparkSession.createDataFrame(labels, "url string, component string")


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_fn=None,
    small_graph_threshold: int = DEFAULT_SMALL_GRAPH_EDGES,
) -> tuple[DataFrame, int]:
    """Compute connected components of an undirected edge list.

    Returns ``(labels, n_iterations)`` where labels = (url, component)
    and component = min url of the component. Isolated nodes are not in
    the input and so not in the output; callers union them back with
    component = own url.

    Hybrid strategy: below ``small_graph_threshold`` distinct edges the
    graph is solved driver-side (union-find, n_iterations = 0); above it,
    the distributed large-star/small-star loop runs. Pass
    ``small_graph_threshold=0`` to force the iterative path (tests do).

    ``checkpoint_fn(df, iteration) -> df`` lets the pipeline swap in
    Iceberg/parquet snapshot checkpoints; defaults to localCheckpoint.
    """
    if checkpoint_fn is None:
        def checkpoint_fn(df: DataFrame, _i: int) -> DataFrame:
            return df.localCheckpoint(eager=True)

    slim = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    if small_graph_threshold:
        # persist ONCE so the threshold count and the subsequent collect
        # (or the iterative loop's first checkpoint) reuse the materialized
        # edges instead of recomputing the full upstream blocking+scoring
        # lineage twice — the count is a map-side-combined aggregation over
        # the cached blocks
        slim = slim.persist()
        n_edges = slim.count()
        if n_edges <= small_graph_threshold:
            labels = _driver_union_find(slim)  # collects eagerly
            slim.unpersist()
            return labels, 0
    cur = checkpoint_fn(slim, 0)
    if small_graph_threshold:
        slim.unpersist()  # checkpoint materialized its own copy
    prev_fp = _fingerprint(cur)
    iterations = 0
    for it in range(1, max_iterations + 1):
        iterations = it
        nxt = _small_star(_large_star(cur))
        nxt = checkpoint_fn(nxt, it)
        fp = _fingerprint(nxt)
        cur = nxt
        if fp == prev_fp:
            break
        prev_fp = fp

    # converged: every edge is (member, root); roots map to themselves
    labels = (
        cur.select(F.col("src").alias("url"), F.col("dst").alias("component"))
        .union(cur.select(F.col("dst").alias("url"), F.col("dst").alias("component")))
        .groupBy("url")
        .agg(F.min("component").alias("component"))
    )
    return labels, iterations


def cluster_assignments(pages: DataFrame, labels: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach component ids to all pages; singletons get their own url."""
    joined = pages.join(labels, pages[url_col] == labels["url"], "left").drop(labels["url"])
    return joined.withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col(url_col))
    ).drop("component")
