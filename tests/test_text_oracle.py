"""DuckDB parity for the Gopher-family repetition signals — the same
oracle mechanics as the driver gate (identical rows on identical input,
value-compared), but as a pytest, since the 50-entry driver registry is
full. Inputs mix seeded multi-line docs (real dup-line structure,
repeated grams) with the sf0.001 documents table's texts."""

import math
import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from ai_data_matching_spark.functions.text import (
    dup_line_char_frac,
    dup_ngram_word_frac,
    top_ngram_char_frac,
)

# DuckDB twins of the three signals (max_units slice mirrored; list_sum
# of an empty list is NULL in DuckDB -> coalesce to 0)
_LINES = (
    "list_filter(string_split(text, chr(10)), x -> x <> '')[1:2000]"
)
_SQL_LINE = f"""
  CASE WHEN coalesce(list_sum(list_transform({_LINES}, x -> length(x))), 0) > 0
       THEN coalesce(list_sum(list_transform(
              list_filter({_LINES},
                x -> len(list_filter({_LINES}, y -> y = x)) >= 2),
              x -> length(x))), 0)
            / list_sum(list_transform({_LINES}, x -> length(x)))
       ELSE 0.0 END
"""
_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')[1:2000]"


def _sql_grams(n: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({_TOKS}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(({_TOKS})[i : i + {n - 1}], ' '))"
    )


def _sql_top(n: int) -> str:
    g = _sql_grams(n)
    return f"""
      CASE WHEN len({g}) > 0 AND length(text) > 0
           THEN list_max(list_transform({g},
                  x -> len(list_filter({g}, y -> y = x)) * length(x)))
                / length(text)
           ELSE 0.0 END
    """


def _sql_dup(n: int) -> str:
    g = _sql_grams(n)
    return f"""
      CASE WHEN len({g}) > 0
           THEN len(list_filter({g}, x -> len(list_filter({g}, y -> y = x)) >= 2))
                / CAST(len({g}) AS DOUBLE)
           ELSE 0.0 END
    """


def test_repetition_signals_match_duckdb(spark):
    rng = random.Random(7)
    vocab = "alpha beta gamma delta x1".split()
    synth = []
    for i in range(60):
        lines = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
            for _ in range(rng.randint(0, 5))
        ]
        if lines and rng.random() < 0.5:
            lines.append(rng.choice(lines))  # force dup lines
        synth.append((10_000 + i, "\n".join(lines)))
    real = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
        .collect()
    ]
    rows = synth + real

    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["l"], r["t2"], r["d5"])
        for r in sdf.select(
            "doc_id",
            dup_line_char_frac(F.col("text")).alias("l"),
            top_ngram_char_frac(F.col("text"), n=2).alias("t2"),
            dup_ngram_word_frac(F.col("text"), n=5).alias("d5"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("input_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        int(d): (l, t2, d5)
        for d, l, t2, d5 in con.execute(
            f"SELECT doc_id, {_SQL_LINE} AS l, {_sql_top(2)} AS t2, "
            f"{_sql_dup(5)} AS d5 FROM input_docs"
        ).fetchall()
    }

    assert set(got) == set(want)
    for d in got:
        for a, b in zip(got[d], want[d]):
            assert math.isclose(a, b, rel_tol=0, abs_tol=1e-12), (d, got[d], want[d])
