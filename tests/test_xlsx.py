"""Stdlib SpreadsheetML reader/writer: round trip, best-sheet heuristic
(data_processor.py:43-58 parity), header probing."""

from ai_data_matching_spark.sources.xlsx import (
    _col_index,
    _col_letters,
    headers_and_rows,
    load_best_sheet,
    read_workbook,
    write_xlsx,
)


def test_column_letters_inverse():
    for i in [0, 1, 25, 26, 27, 51, 52, 701, 702]:
        assert _col_index(_col_letters(i)) == i


def test_round_trip_types(tmp_path):
    p = str(tmp_path / "t.xlsx")
    matrix = [
        ["Name", "N", "F", "B", "Unicode"],
        ["a&<>", 1, 2.5, True, "héllo α"],
        [None, -3, 0.0, False, ""],
    ]
    write_xlsx({"S1": matrix}, p)
    back = read_workbook(p)["S1"]
    assert back[0] == matrix[0]
    assert back[1] == ["a&<>", 1, 2.5, True, "héllo α"]
    assert back[2][:4] == [None, -3, 0, False]  # 0.0 → integral → int


def test_best_sheet_and_header_probe(tmp_path):
    p = str(tmp_path / "wb.xlsx")
    write_xlsx(
        {
            "Tiny": [["a", "b"], [1, 2], [3, 4], [5, 6]],          # ≤3 cols: skipped
            "Nums": [[1, 2, 3, 4], [5, 6, 7, 8]],                   # no string headers
            "Real": [[" Supplier Name ", "Value", "Currency", "End Date"],
                     ["Acme", 10, "USD", "2024-01-01"],
                     ["Bcme", 20, "EUR", "2024-02-01"]],
        },
        p,
    )
    sheet, headers, rows = load_best_sheet(p)
    assert sheet == "Real"
    assert headers[0] == "Supplier Name"  # probed + stripped
    assert len(rows) == 2 and rows[0][0] == "Acme"


def test_fallback_first_sheet(tmp_path):
    p = str(tmp_path / "wb2.xlsx")
    write_xlsx({"Only": [["x", "y"], [1, 2]]}, p)
    sheet, headers, rows = load_best_sheet(p)
    assert sheet == "Only" and headers == ["x", "y"] and rows == [[1, 2]]


def test_headers_and_rows_empty():
    assert headers_and_rows([]) == ([], [])


def test_header_probe_skiprows(tmp_path):
    """S3 parity (app.py:365-386): header found at a skiprows offset."""
    from ai_data_matching_spark.sources.xlsx import probe_header_row, write_xlsx, read_workbook

    preamble = [[f"junk {i}", None, None, None] for i in range(5)]
    body = [["Supplier Name", "Total Value", "Currency", "End Date"],
            ["Acme", 1, "USD", "2024-01-01"]]
    p = str(tmp_path / "probe.xlsx")
    write_xlsx({"S": preamble + body}, p)
    matrix = read_workbook(p)["S"]
    skip, headers, rows = probe_header_row(matrix, ["supplier"])
    assert skip == 5 and headers[0] == "Supplier Name" and rows == [["Acme", 1, "USD", "2024-01-01"]]
    # no keyword anywhere → fallback to row 0
    skip0, headers0, _ = probe_header_row(matrix, ["zzz"])
    assert skip0 == 0 and headers0[0] == "junk 0"


def test_sheet_name_with_quotes(tmp_path):
    """Double quotes in a sheet name must be escaped in the name="..."
    attribute (regression: saxutils.escape leaves quotes alone, producing
    malformed workbook.xml that no reader could parse)."""
    p = str(tmp_path / "q.xlsx")
    name = 'Q1 "Final" <Report> & Co'
    write_xlsx({name: [["h"], ["v"]]}, p)
    back = read_workbook(p)
    assert back[name] == [["h"], ["v"]]
