"""Contract-query skew guard: blocks above DEMO_BLOCK_CAP are excluded
from the demo surface's pairwise joins (VERDICT r01 scale-killer #4)."""

from pyspark.sql import functions as F

from __spark_entry__ import DEMO_BLOCK_CAP, _cap_blocks


def test_cap_blocks_drops_only_oversized(spark):
    rows = [(i, "en", "hot") for i in range(DEMO_BLOCK_CAP + 5)]
    rows += [(10_000 + i, "en", "cold") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    kept = _cap_blocks(df, ["lang", "source"])
    got = {r["source"] for r in kept.select("source").distinct().collect()}
    assert got == {"cold"}
    assert kept.count() == 5
