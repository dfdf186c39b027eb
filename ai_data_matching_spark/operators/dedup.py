"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all over a ``(id, text)`` document frame, each returning
the survivors (and exposing the duplicate-pair frames for audit):

* exact          — hash-groupBy on raw text (one shuffle of (hash, id))
* minhash_lsh    — shingle → MinHash signature → banded LSH bucket join;
                   verify candidates with native Jaccard over shingle sets
* simhash        — 64-bit simhash band blocking + hamming-distance verify
* ngram_jaccard  — word n-gram Jaccard within blocks (native
                   array_intersect/union — no UDF)
* embedding_cosine — near-dup by cosine ≥ τ over an embedding column
                   (LSH-bucketed; see similarity_search for ANN)

All native DataFrame ops; candidate verification stays JVM-side.
At 100 TB scale: every strategy is (narrow sketch projection) → (one
equi-join on short keys) → (verify on the candidate set only) — never an
all-pairs comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persist_tracked
from ..functions.hashing import simhash_bands


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each exact text group.

    The groupBy input projects only (xxhash64(text), id), so its shuffle
    carries (hash, id) — never the text payload. Survivor ids then attach
    payload columns with ONE left-semi join on the id alone.
    """
    ids = docs.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("_h"))
    reps = ids.groupBy("_h").agg(F.min(id_col).alias(id_col)).select(id_col)
    return docs.join(reps, id_col, "left_semi")


def duplicate_pairs_minhash_lsh(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    minhash_k: int = 16,
    n_bands: int = 8,
    jaccard_threshold: float = 0.7,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH: shingle → sign → band →
    bucket-join → exact-Jaccard verify on shingle sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    from ..functions.sketches import MINHASH_K, make_shingles_udf, make_sketch_udf

    assert minhash_k == MINHASH_K, "fast sketch UDF emits fixed-k signatures"
    rows_per_band = minhash_k // n_bands
    base = docs.select(
        F.col(id_col).alias("id"),
        make_shingles_udf(shingle_k)(F.col(text_col)).alias("_sh"),
        make_sketch_udf(shingle_k)(F.col(text_col))["minhash_sig"].alias("_sig"),
    )

    bands = base.select(
        "id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"b{b}:"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                "_",
                            )
                        ).cast("string"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )
    bands = persist_tracked(bands)  # consumed by both sides of the bucket self-join
    a = bands.select(F.col("bucket"), F.col("id").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = bands.select(F.col("bucket"), F.col("id").alias("id_b"), F.col("_sh").alias("_sh_b"))
    cand = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(1.0))
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duplicate_pairs_simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate pairs via SimHash band blocking + hamming verify.

    Two 64-bit simhashes within ``max_hamming`` bits share at least one of
    4 bands when max_hamming ≤ 3·16 (pigeonhole over flipped bits), so
    band blocking loses nothing up to the bound. Returns
    (id_a, id_b, hamming).
    """
    from ..functions.sketches import sketch_udf

    base = docs.select(
        F.col(id_col).alias("id"),
        sketch_udf(F.col(text_col))["simhash"].alias("_sim"),
    )
    bands = base.select(
        "id", "_sim", F.explode(simhash_bands(F.col("_sim"), n_bands)).alias("bucket")
    )
    bands = persist_tracked(bands)  # consumed by both sides of the bucket self-join
    a = bands.select("bucket", F.col("id").alias("id_a"), F.col("_sim").alias("_sim_a"))
    b = bands.select("bucket", F.col("id").alias("id_b"), F.col("_sim").alias("_sim_b"))
    ham = F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def duplicate_pairs_ngram_jaccard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Word n-gram Jaccard over candidate pairs within blocks — exact
    result within the blocking, computed in the scalable explode-join
    shape: explode (id, shingle), self-join on (block, shingle), count
    matches per pair, then |∩|/(|A|+|B|-|∩|). This never materializes a
    quadratic array-intersect (the naive array_intersect pair join was
    measured ~50× slower at sf0.1) and only ever touches pairs that share
    at least one shingle — which is every pair that can clear a positive
    threshold. Blocks default to (lang, source); requires threshold > 0.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0 (zero-overlap pairs are never emitted)")
    from ..functions.sketches import make_shingles_udf

    block_cols = block_cols or ["lang", "source"]
    base = docs.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        make_shingles_udf(shingle_k)(F.col(text_col)).alias("_sh"),
    ).withColumn("_n", F.size("_sh"))
    # persisted: both sides of the self-join consume this frame — without
    # it Spark recomputes the shingle UDF per side (measured 2× cost)
    ex = persist_tracked(
        base.select(*block_cols, "id", "_n", F.explode("_sh").alias("_shingle"))
    )
    a = ex.select(
        *block_cols, "_shingle", F.col("id").alias("id_a"), F.col("_n").alias("_n_a")
    )
    b = ex.select(
        *block_cols, "_shingle", F.col("id").alias("id_b"), F.col("_n").alias("_n_b")
    )
    inter = (
        a.join(b, [*block_cols, "_shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_n_a", "_n_b")
        .agg(F.count("*").alias("_inter"))
    )
    jac = F.col("_inter").cast("double") / (
        F.col("_n_a") + F.col("_n_b") - F.col("_inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duplicate_pairs_embedding_cosine(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bits: int = 6,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs: random-hyperplane LSH bucket
    self-join + native cosine verify ≥ ``threshold``.

    Candidates only where a sign-pattern bucket collides (recall grows
    with ``n_tables``; pairs at cosine ≥ 0.9 collide in ≥1 of 8 six-bit
    tables w.p. ≈ 1-(1-(1-θ/π)^6)^8 ≈ 0.97). Verification is the exact
    JVM-side cosine — no Python. Returns (id_a, id_b, cosine).
    """
    from .similarity_search import cosine_col, make_lsh_bucket_udf

    bucket_udf = make_lsh_bucket_udf(bits, n_tables)
    base = persist_tracked(
        embs.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).withColumn("bucket", F.explode(bucket_udf(F.col("_v"))))
    )
    a = base.select("bucket", F.col("id").alias("id_a"), F.col("_v").alias("_va"))
    b = base.select("bucket", F.col("id").alias("id_b"), F.col("_v").alias("_vb"))
    # filter on the UNROUNDED cosine (exact verify — no borderline pair up
    # to 5e-7 below threshold sneaks in via rounding); round only in the
    # output projection for stable cross-engine value hashes.
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("_cos", cosine_col(F.col("_va"), F.col("_vb")))
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round(F.col("_cos"), 6).alias("cosine"))
    )


def survivors_from_pairs(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Resolve duplicate pairs to survivors: connected components over the
    pair graph, keep min-id per component. Reuses the pipeline's CC."""
    from .clustering import connected_components

    edges = pairs.select(
        F.col("id_a").cast("string").alias("src"), F.col("id_b").cast("string").alias("dst")
    )
    labels, _ = connected_components(edges)
    losers = labels.filter(F.col("url") != F.col("component")).select(
        F.col("url").cast("long").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
