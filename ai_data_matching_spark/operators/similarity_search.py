"""Similarity search over embedding columns (array<float>).

* ``cosine_topk_bruteforce`` — exact top-k per query via a broadcast
  cross join; the correctness baseline. Dot products are native
  (zip_with + aggregate, JVM-side, no Python).
* ``cosine_topk_lsh`` — random-hyperplane LSH bucketing: queries only
  compare against vectors sharing a hyperplane-sign bucket (multi-probe
  via several independent tables). The scale path: candidate set shrinks
  ~2^bits per table; recall measured against brute force in tests.
* ``cosine_topk_ivf`` — inverted-file (coarse-quantizer) index: spherical
  k-means centroids trained on a bounded driver sample, every corpus
  vector assigned to its nearest-centroid list, queries probe the
  ``nprobe`` nearest lists. Candidates = list equi-join; exact cosine on
  candidates only. The data-adaptive complement to LSH's data-oblivious
  hyperplanes — clustered corpora get tighter candidate sets at equal
  probe cost.

At 100 TB: brute force is O(Q·N) — only viable with small broadcast Q;
LSH/IVF bound the join fan-out per bucket/list and are the defaults for
big Q. IVF training never sees more than ``sample_n`` vectors (one
bounded TakeOrdered collect); the centroid matrix (n_centroids × dim
doubles) ships to executors inside the Arrow UDF closure, and the
candidate join is a plain equi-join on ``list_id`` whose skew is bounded
by k-means balance — at 10^12 rows raise n_centroids ∝ √N (or go
two-level IVF) so per-list size stays shuffle-partition-friendly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    """Native cosine similarity between two array<float/double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _score_topk(cand: DataFrame, k: int, qv: str = "_queryv", cv: str = "_neighborv") -> DataFrame:
    """Shared scoring tail for all three search paths: exact cosine
    (rounded to 6 for stable cross-engine hashes) → per-query top-k with
    the deterministic (desc cosine, asc neighbor_id) tie-break. One tail
    so a tie-break or rounding change can never drift between bruteforce
    and the approximate paths' recall-vs-bruteforce measurement."""
    scored = cand.withColumn("cosine", F.round(cosine_col(F.col(qv), F.col(cv)), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank), rank 1..k.
    Queries are broadcast — keep them ≪ corpus."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    cand = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    return _score_topk(cand, k, qv="_qv", cv="_cv")


_SPLITMIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_1
    x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_2
    return x ^ (x >> np.uint64(31))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix (dim × n_planes), identical on
    every executor/platform — derived from splitmix64 of the index grid,
    never from process-local RNG state."""
    i = np.arange(dim, dtype=np.uint64)[:, None]
    j = np.arange(n_planes, dtype=np.uint64)[None, :]
    h = _splitmix(i * np.uint64(0x9E3779B97F4A7C15) ^ j * np.uint64(0xC2B2AE3D27D4EB4F)
                  ^ np.uint64(seed))
    return np.where(h & np.uint64(1), 1.0, -1.0)


def make_lsh_bucket_udf(bits: int, n_tables: int, seed: int = 42):
    """Arrow-batched bucket computation: one matrix product per batch
    (``V @ H`` then sign-pack ``bits`` per table) instead of
    ``bits × n_tables`` interpreted aggregate expressions per row —
    measured ~40× faster and the only scalable form at 100 TB."""
    n_planes = bits * n_tables
    weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype=object)
        mat = np.array(vecs.tolist(), dtype=np.float64)
        hp = _hyperplanes(mat.shape[1], n_planes, seed)
        signs = (mat @ hp) > 0  # (n, n_tables*bits)
        sigs = (signs.reshape(len(mat), n_tables, bits).astype(np.uint64)
                * weights[None, None, :]).sum(axis=2)
        return pd.Series(
            [[f"t{t}:{int(row[t])}" for t in range(n_tables)] for row in sigs]
        )

    return _buckets


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each vector lands in ``n_tables`` buckets; candidates = bucket
    collisions; exact cosine on candidates only, then window top-k.
    """
    bucket_udf = make_lsh_bucket_udf(bits, n_tables)

    def bucketed(df: DataFrame, role: str) -> DataFrame:
        buckets = bucket_udf(F.col(vec_col).cast("array<double>"))
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"_{role}v"),
            F.explode(buckets).alias("bucket"),
        )

    c = bucketed(corpus, "neighbor")
    q = bucketed(queries, "query")
    cand = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _score_topk(cand, k)


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 20_000,
    n_iters: int = 8,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained on a deterministic
    bounded sample (the ``sample_n`` lowest ``xxhash64(id)`` rows — a
    uniform pseudo-random draw that is identical across runs, partitions
    and cluster sizes, unlike ``df.sample``'s partition-seeded RNG).

    Lloyd iterations run in numpy on the driver: assign = argmax dot
    against L2-normalized centroids, update = renormalized member mean;
    a list that empties keeps its previous centroid. Deterministic init:
    the first ``n_centroids`` rows of the hash-ordered sample. Returns a
    (n_centroids × dim) float64 matrix of unit rows. O(sample_n · dim ·
    n_centroids · n_iters) driver work — independent of corpus size.
    """
    sample = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("_v"),
                      F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample_n)
        .select("_v")
        .toPandas()
    )
    x = np.array(sample["_v"].tolist(), dtype=np.float64)
    if len(x) < n_centroids:
        raise ValueError(f"sample ({len(x)}) smaller than n_centroids ({n_centroids})")
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cents = x[:n_centroids].copy()
    for _ in range(n_iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    cents[c] = m / n
    return cents


def anchor_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse-quantizer anchors = the embeddings of the ``n_centroids``
    LOWEST-id corpus rows, unit-normalized. No training: the anchor set
    is a pure function of the data that any engine can reproduce with
    ``ORDER BY id LIMIT n`` — which is the point: an IVF built on these
    anchors has SQL-expressible semantics end-to-end, so a DuckDB oracle
    can mirror the assignment exactly instead of merely checking recall
    (see ``cosine_topk_ivf(quantizer="anchor_ids")``). Quantization
    quality ≈ k-means init without Lloyd steps — acceptable for a
    correctness pin; production uses the trained quantizer. One bounded
    TakeOrdered collect (n_centroids × dim doubles)."""
    rows = (
        corpus.select(
            F.col(id_col).alias("_i"), F.col(vec_col).cast("array<double>").alias("_v")
        )
        .orderBy("_i")
        .limit(n_centroids)
        .collect()
    )
    if len(rows) < n_centroids:
        raise ValueError(f"corpus ({len(rows)}) smaller than n_centroids ({n_centroids})")
    x = np.array([r["_v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    if not np.all(norms > 1e-9):
        # fail loudly: a zero-norm anchor degenerates differently in every
        # engine (Spark clamps to cosine 0, DuckDB's cosine returns NaN
        # and sorts it FIRST under ORDER BY ... DESC) — a confusing hash
        # mismatch downstream instead of a data error here
        raise ValueError("anchor_centroids: zero-norm embedding among anchors")
    return x / norms


def _round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """Round half AWAY FROM ZERO — the rule Spark's ``F.round`` and
    DuckDB's ``round()`` share. ``np.round`` is half-even (banker's) and
    disagrees with both on exact .5 boundaries, which would let a
    Python-side assignment flip lists relative to a SQL oracle."""
    p = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def make_ivf_list_udf(centroids: np.ndarray, nprobe: int, stable_rounded: bool = False):
    """Arrow-batched list assignment: one ``X @ C.T`` matrix product per
    batch, then argpartition for the top-``nprobe`` lists per row. The
    centroid matrix is captured in the closure (broadcast once per
    executor by task serialization — a few KB).

    ``stable_rounded`` makes the choice cross-engine reproducible: scores
    round to 6 decimals before ranking and ties break toward the LOWEST
    list index (stable argsort) — the same decision an oracle's
    ``ORDER BY round(cos, 6) DESC, anchor_idx`` makes. Rounding is
    HALF-AWAY-FROM-ZERO (``_round_half_away``), the rule both Spark's
    ``F.round`` and DuckDB's ``round()`` apply — numpy's default
    ``np.round`` is banker's (half-even) and would disagree with both on
    exact .5 boundaries. Residual cross-engine risk is only an
    FP-association difference landing within ~1 ulp of a 5e-7 boundary
    (~1e-9 per value) — the same exposure every round-6 oracle in the
    registry carries. The default path keeps the cheaper argpartition
    (tie order unspecified), fine when only recall is measured."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    np_ = min(nprobe, len(cents))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _lists(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype=object)
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents.T
        if stable_rounded:
            top = np.argsort(-_round_half_away(sims, 6), axis=1, kind="stable")[:, :np_]
        elif np_ == len(cents):
            top = np.tile(np.arange(len(cents)), (len(mat), 1))
        else:
            top = np.argpartition(-sims, np_ - 1, axis=1)[:, :np_]
        return pd.Series([row.astype(int).tolist() for row in top])

    return _lists


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_n: int = 20_000,
    quantizer: str = "kmeans",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    Corpus vectors live in exactly one inverted list (top-1 centroid);
    each query probes its ``nprobe`` nearest lists. Candidates are the
    list equi-join; exact cosine on candidates only, then window top-k —
    same output contract as the brute-force baseline, so recall is
    directly measurable (tests/test_similarity_search.py).

    ``quantizer="kmeans"`` (production default) trains spherical k-means
    on a bounded sample — best list balance, but the centroids are not
    reproducible outside this engine, so an external oracle can only
    check RECALL against brute force (which drops below 1.0 whenever a
    true neighbor lands outside the probed lists — data- and
    scale-dependent). ``quantizer="anchor_ids"`` uses the lowest-id
    corpus rows as anchors with rounded, tie-stable assignment
    (``anchor_centroids``): every decision is expressible in ANSI SQL, so
    a cross-engine oracle can replay the EXACT semantics at any scale —
    the correctness-pin mode."""
    if quantizer == "anchor_ids":
        cents = anchor_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    elif quantizer == "kmeans":
        cents = train_ivf_centroids(
            corpus, n_centroids, id_col=id_col, vec_col=vec_col, sample_n=sample_n
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    stable = quantizer == "anchor_ids"
    assign1 = make_ivf_list_udf(cents, 1, stable_rounded=stable)
    probe = make_ivf_list_udf(cents, nprobe, stable_rounded=stable)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_neighborv"),
        F.explode(assign1(F.col(vec_col).cast("array<double>"))).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_queryv"),
        F.explode(probe(F.col(vec_col).cast("array<double>"))).alias("list_id"),
    )
    cand = (
        c.join(q, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _score_topk(cand, k)
