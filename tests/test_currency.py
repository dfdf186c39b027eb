"""P7 reference-parity conversion (currency_converter.py:76-129): every
branch — known rate, USD identity, messy code normalization, unknown
passthrough, null code, zero/null amount."""

from pyspark.sql import functions as F

from ai_data_matching_spark.functions.currency import FALLBACK_RATES, with_usd


def test_conversion_branches(spark):
    rows = [
        (1, 150.0, "EUR"),    # known: 150/0.85 = 176.47
        (2, 100.0, "USD"),    # identity, no rounding applied
        (3, 100.0, " gbp "),  # normalized to GBP
        (4, 100.0, "XYZ"),    # unknown → passthrough, flag false
        (5, 100.0, None),     # null → USD
        (6, 0.0, "EUR"),      # zero amount → 0.0
        (7, None, "EUR"),     # null amount → 0.0
    ]
    df = spark.createDataFrame(rows, "id long, amount double, ccy string")
    got = {r["id"]: r for r in with_usd(df, "amount", "ccy").collect()}
    assert got[1]["total_usd"] == 176.47 and got[1]["conversion_applied"]
    assert got[2]["total_usd"] == 100.0 and not got[2]["conversion_applied"]
    assert got[3]["currency"] == "GBP" and got[3]["total_usd"] == round(100 / 0.78, 2)
    assert got[4]["total_usd"] == 100.0 and not got[4]["conversion_applied"]
    assert got[4]["currency"] == "XYZ"  # row KEPT, not dropped
    assert got[5]["currency"] == "USD" and got[5]["total_usd"] == 100.0
    assert got[6]["total_usd"] == 0.0 and not got[6]["conversion_applied"]
    assert got[7]["total_usd"] == 0.0
    assert len(FALLBACK_RATES) == 17  # the reference's full fallback table
