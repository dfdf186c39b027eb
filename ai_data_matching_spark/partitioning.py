"""Partition-shape helpers.

``fan_out`` fixes the small-file-scan serialization trap: a parquet file
under ``spark.sql.files.maxPartitionBytes`` arrives as ONE input split, so
an expression-heavy projection (md5 sketching, shingling, scoring) runs on
one core no matter how many the session has. Repartitioning the slim input
projection spreads that CPU across the session — and at production scale
the scan already has ≥ parallelism splits, so the guard makes this a
plan-level no-op (no shuffle is ever added on the 100-TB path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's core count when
    its current plan yields fewer partitions; unchanged otherwise.

    Call it on the SLIM projection that feeds CPU-heavy expressions (so
    the one-time shuffle moves only the columns that work needs), never on
    a wide frame.
    """
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def one_group(col: str | Column) -> Column:
    """Window partition key for a rank/share computed DELIBERATELY over
    one small group (top-k survivors, a tiny aggregate).

    An unpartitioned window spec makes WindowExec warn that all data moves
    to a single partition — correct and intended here, but the warning is
    indistinguishable from the real full-frame-sort bug it exists to
    catch. A literal partition key gets constant-folded back to the empty
    spec, so this derives an always-zero key from a column Catalyst cannot
    fold; the plan then SAYS the single group is chosen, and any surviving
    no-partition warning in a log is a real defect again.

    Only ever use downstream of a limit()/aggregate that bounds the frame
    to driver-trivial size.
    """
    return F.pmod(F.xxhash64(col), F.lit(1))
