"""Fast sketch computation: one Arrow-batched pandas UDF producing
(simhash64, minhash signature) per document.

This is the pipeline's hot path. The pure-SQL higher-order-function
versions in ``hashing.py`` are semantically equivalent shapes but
interpreted per array element by Spark (no codegen for HOFs) — measured
~1 ms/doc; this numpy path is ~50 µs/doc:

* one stable 64-bit base hash per shingle (blake2b, C speed,
  process/platform independent — NOT Python ``hash()``),
* MinHash via a universal-hash family over the base hashes
  (h_i = splitmix64(base ^ seed_i), numpy uint64 wrap arithmetic),
* SimHash via a vectorized bit-vote matrix.

Deterministic across runs, partitionings, and parallelism levels.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MINHASH_K = 16
_SPLITMIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = np.uint64(0x94D049BB133111EB)
_SEEDS = np.arange(1, MINHASH_K + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)


def _base_hashes(text: str, k: int = 3) -> np.ndarray:
    """Stable 64-bit hash per k-word shingle (whole text when < k words)."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < k:
        shingles = [" ".join(words)]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.array(
        [int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little") for s in shingles],
        dtype=np.uint64,
    )


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_1
    x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_2
    return x ^ (x >> np.uint64(31))


def simhash_minhash_py(text: str, k: int = 3) -> tuple[int, list[int]]:
    """Scalar twin (tests + synth oracles)."""
    h = _base_hashes(text, k)
    if h.size == 0:
        return 0, [0] * MINHASH_K
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sim = int(
        np.bitwise_or.reduce(
            np.where(votes > 0, np.uint64(1) << np.arange(64, dtype=np.uint64), np.uint64(0))
        )
    )
    sig = _splitmix(h[:, None] ^ _SEEDS[None, :]).min(axis=0)
    return np.int64(np.uint64(sim)).item(), [np.int64(v).item() for v in sig]


_SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("simhash", T.LongType()),
        T.StructField("minhash_sig", T.ArrayType(T.LongType())),
    ]
)


def make_sketch_udf(k: int = 3):
    @F.pandas_udf(_SKETCH_SCHEMA)
    def _sketch(text: pd.Series) -> pd.DataFrame:
        sims: list[int] = []
        sigs: list[list[int]] = []
        for t in text.fillna(""):
            s, m = simhash_minhash_py(t, k)
            sims.append(s)
            sigs.append(m)
        return pd.DataFrame(
            {"simhash": pd.Series(sims, dtype="int64"), "minhash_sig": sigs}
        )

    return _sketch


sketch_udf = make_sketch_udf(3)


def make_shingles_udf(k: int = 3):
    """Distinct k-word shingles as array<string> — ~40× faster than the
    interpreted higher-order slice expression in hashing.word_shingles
    (measured 1.3 ms/doc HOF vs ~30 µs/doc here)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _shingles(text: pd.Series) -> pd.Series:
        out = []
        for t in text.fillna(""):
            words = t.split()
            if not words:
                out.append([])
            elif len(words) < k:
                out.append([" ".join(words)])
            else:
                seen = dict.fromkeys(
                    " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
                )
                out.append(list(seen))
        return pd.Series(out)

    return _shingles
