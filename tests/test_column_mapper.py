"""S5/S6 deterministic column mapper + file-type routing (reference
data_processor._find_column and llm_column_mapper fallback rules)."""

import pytest

from ai_data_matching_spark.sources.column_mapper import (
    detect_file_type,
    find_column,
    map_to_schema,
)


def test_find_column_exact_beats_partial():
    cols = ["Supplier Name Extended", "Name"]
    # exact 'name' wins over partial 'name'-in-'supplier name extended'
    assert find_column(cols, ["name"]) == "Name"


def test_find_column_candidate_order_wins():
    cols = ["Vendor", "Company"]
    assert find_column(cols, ["supplier", "vendor", "company"]) == "Vendor"


def test_find_column_word_partial():
    assert find_column(["User-Identifier"], ["user id"]) == "User-Identifier"
    assert find_column(["  Total Value (USD) "], ["total value"]) == "  Total Value (USD) "
    assert find_column(["x", "y"], ["nothing"]) is None


def test_map_to_schema_requires(spark):
    df = spark.createDataFrame([(1, "a")], "`Some ID` long, other string")
    out = map_to_schema(df, {"id": ["some id"]}, require=["id"])
    assert out.columns == ["id"]
    with pytest.raises(KeyError, match="missing_field"):
        map_to_schema(df, {"missing_field": ["zzz"]}, require=["missing_field"])


def test_detect_file_type_rules():
    assert detect_file_type(
        ["Ultimate Parent Account (Read Only)", "Contracted Annual Travel Budget"]
    ) == "ege_customers"
    assert detect_file_type(["Corporate Gross Bookings Value", "Stage"]) == "ege_opportunities"
    assert detect_file_type(
        ["Ultimate Parent Name", "Expected Total Travel Volume", "Stage"]
    ) == "bt_opportunities"
    assert detect_file_type(
        ["Ultimate Parent Name", "Expected Total Travel Volume", "BT Type"]
    ) == "bt_clients"
    assert detect_file_type(["Supplier", "Total Value"]) == "raindrop_vendors"
    assert detect_file_type(["a", "b"], "contracts_2024.xlsx") == "raindrop_vendors"
    assert detect_file_type(["a", "b"]) == "unknown"
