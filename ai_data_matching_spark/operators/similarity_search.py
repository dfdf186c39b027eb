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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def _hyperplane_buckets(vec, dim: int, bits: int, table: int, seed: int = 42):
    """Sign-pattern bucket id from ``bits`` pseudo-random hyperplanes.

    Hyperplane coefficients are deterministic ±1 patterns derived from
    xxhash64(component index, bit, table) — computed natively per row via
    an unrolled sum (no stored model, reproducible everywhere).
    """
    sig = F.lit(0).cast("long")
    for b in range(bits):
        # dot(vec, h_b) where h_b[i] = ±1 from a hash of (i, b, table)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(i, F.lit(b), F.lit(table), F.lit(seed)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return F.concat(F.lit(f"t{table}:"), sig.cast("string"))


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
    def bucketed(df: DataFrame, role: str) -> DataFrame:
        buckets = F.array(
            *[_hyperplane_buckets(F.col(vec_col), dim or 0, bits, t) for t in range(n_tables)]
        )
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
