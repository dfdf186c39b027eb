"""P7 — currency → USD conversion with reference-parity semantics.

Mirrors /root/reference/src/currency_converter.py:

* the 17-currency fallback rate table (:76-94) — the deterministic rates
  used when no live API is available (the only mode in this engine);
* ``convert_to_usd`` semantics (:100-129): null/zero amount → 0.0;
  currency code upper-trimmed, null → 'USD'; USD → amount unchanged;
  UNKNOWN currency → amount passed through UNCONVERTED (the reference
  logs and returns the amount rather than dropping the row); rate ≤ 0 →
  passthrough; otherwise round(amount / rate, 2).

The rate dim is broadcast; unknown codes survive via the left join +
coalesce, and a ``conversion_applied`` flag makes passthroughs auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# /root/reference/src/currency_converter.py:76-94
FALLBACK_RATES: dict[str, float] = {
    "USD": 1.0,
    "EUR": 0.85,
    "GBP": 0.78,
    "JPY": 150.0,
    "CAD": 1.35,
    "AUD": 1.55,
    "CHF": 0.88,
    "CNY": 7.20,
    "INR": 83.0,
    "SGD": 1.34,
    "MXN": 17.5,
    "BRL": 5.8,
    "KRW": 1340.0,
    "ZAR": 18.5,
    "SEK": 10.8,
    "NOK": 10.9,
    "DKK": 6.9,
}


def rates_df(spark) -> DataFrame:
    """17-row rate dim as a VALUES literal → pure JVM ``LocalRelation``.

    NOT ``createDataFrame(list)``: local Python lists take the
    RDD/pickle path, so every *broadcast* evaluation of the dim ran a
    Python-worker job (several seconds first-hit on a cold 32-slot
    worker pool; the VALUES form evaluates in ~0.6 s and keeps the
    whole conversion plan JVM-only)."""
    rows = ", ".join(f"('{c}', {r!r})" for c, r in sorted(FALLBACK_RATES.items()))
    return spark.sql(
        f"SELECT currency, CAST(rate AS DOUBLE) AS rate"
        f" FROM (VALUES {rows}) AS t(currency, rate)"
    )


def normalize_ccy(ccy: Column) -> Column:
    """upper().strip(), null → 'USD' (currency_converter.py:105)."""
    return F.coalesce(F.upper(F.trim(ccy)), F.lit("USD"))


def with_usd(
    df: DataFrame, amount_col: str, ccy_col: str, out_col: str = "total_usd"
) -> DataFrame:
    """Left-join the broadcast rate dim and convert; adds ``out_col`` and
    ``conversion_applied``. Unknown-currency rows are KEPT (passthrough),
    never dropped — an inner join here was the r01 parity gap."""
    rates = F.broadcast(rates_df(df.sparkSession))
    amount = F.col(amount_col).cast("double")
    j = df.withColumn("_ccy", normalize_ccy(F.col(ccy_col))).join(
        rates, F.col("_ccy") == F.col("currency"), "left"
    )
    convertible = (
        (F.col("_ccy") != "USD") & F.col("rate").isNotNull() & (F.col("rate") > 0)
    )
    # round via a fixed-point (DECIMAL) intermediate: float round() sits on
    # binary-representation boundaries (e.g. 43653.75/150 = 291.025 stored
    # as 291.0249999…, rounding down in some engines and up in others);
    # the decimal cast normalizes to 6 exact decimals first
    usd = (
        F.when(amount.isNull() | (amount == 0), F.lit(0.0))
        .when(
            convertible,
            F.round((amount / F.col("rate")).cast("decimal(24,6)"), 2).cast("double"),
        )
        .otherwise(amount)
    )
    applied = convertible & amount.isNotNull() & (amount != 0)
    return (
        j.withColumn(out_col, usd)
        .withColumn("conversion_applied", applied)
        .drop("currency", "rate")
        .withColumnRenamed("_ccy", "currency")
    )
