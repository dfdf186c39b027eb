"""Self-check of the driver contract: every ``queries()`` entry with an
``oracle_sql()`` twin must produce identical rows (order-insensitive) on
the same parquet tables via DuckDB — a local mirror of the driver's
CORRECTNESS gate, run at sf0.001 for speed."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# Queries whose self-check must run at a different sf than the fast
# 0.001. Empty since ann_ivf_topk switched to the anchor_ids quantizer,
# whose oracle replays the IVF semantics exactly at EVERY sf (it was
# previously recall-gated, which only held at sf0.01).
SF_OVERRIDES: dict[str, str] = {}


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def duck():
    return {
        sf: _connect(sf) for sf in {SF_DIR, *SF_OVERRIDES.values()}
    }


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6f}"
    return str(val)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


ORACLE_KEYS = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    sf_dir = SF_OVERRIDES.get(name, SF_DIR)
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck[sf_dir].execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: schema mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc, dc = _canon_rows(scols, srows), _canon_rows(dcols, drows)
    if sc != dc:
        diff = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_rows_only_queries_run(spark):
    """Queries without oracles (hash-based sketches) must still run and
    return a stable schema."""
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(entry_mod.oracle_sql())):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
