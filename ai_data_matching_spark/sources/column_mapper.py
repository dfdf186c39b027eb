"""S5/S6 — deterministic column mapping + file-type routing.

Re-creates the reference's non-LLM fallback path (SURVEY §1.3: "the
deterministic fallback is the semantic equivalent to keep"):

* ``find_column`` — /root/reference/src/data_processor.py:322-338:
  case-insensitive exact match first, then substring/word partial match,
  candidate order wins.
* ``map_to_schema`` — the Spark-side consumer: builds a select/alias
  projection from input headers to the canonical schema (driver-side name
  logic only; the projection itself is pure Catalyst, so column pruning
  still reaches the scan).
* ``detect_file_type`` — /root/reference/src/llm_column_mapper.py:363-388
  keyword routing rules, verbatim semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_column(columns: list[str], possible_names: list[str]) -> str | None:
    """Return the first input column matching a candidate name.

    For each candidate (in order): scan for an exact lowercased/stripped
    match; failing that, scan for a partial match (candidate contained in
    the column, or any whitespace word of the candidate contained in the
    column). Returns the ORIGINAL header spelling.
    """
    cols_lower = [c.lower().strip() for c in columns]
    for cand in possible_names:
        cand = cand.lower()
        for i, col in enumerate(cols_lower):
            if col == cand:
                return columns[i]
        for i, col in enumerate(cols_lower):
            if cand in col or any(word in col for word in cand.split()):
                return columns[i]
    return None


def map_columns(
    columns: list[str], canonical: dict[str, list[str]]
) -> dict[str, str]:
    """canonical field → original header, for every field found."""
    out: dict[str, str] = {}
    for field, candidates in canonical.items():
        hit = find_column(columns, candidates)
        if hit is not None:
            out[field] = hit
    return out


def map_to_schema(
    df: DataFrame,
    canonical: dict[str, list[str]],
    require: list[str] | None = None,
) -> DataFrame:
    """Project a scrambled-header frame onto the canonical schema.

    ``require`` lists fields that must resolve (raises KeyError naming the
    missing ones — fail loudly, never silently drop a required field).
    """
    mapping = map_columns(df.columns, canonical)
    missing = [f for f in (require or []) if f not in mapping]
    if missing:
        raise KeyError(f"unmappable required fields: {missing} from {df.columns}")
    return df.select(*[F.col(f"`{src}`").alias(field) for field, src in mapping.items()])


def detect_file_type(columns: list[str], filename: str = "") -> str:
    """Keyword routing rules (llm_column_mapper.py:363-388, verbatim)."""
    cols = [c.lower().strip() for c in columns]
    joined = " ".join(cols)
    fname = filename.lower()
    if "ultimate parent account (read only)" in cols and (
        "contracted annual travel budget" in joined
    ):
        return "ege_customers"
    if "corporate gross bookings value" in joined and "stage" in cols:
        return "ege_opportunities"
    if (
        ("ultimate parent name" in cols or "opportunity name" in cols)
        and "expected total travel volume" in joined
        and ("stage" in cols or "opportunity" in fname or "pipeline" in fname)
    ):
        return "bt_opportunities"
    if (
        "ultimate parent name" in cols
        and "expected total travel volume" in joined
        and "bt type" in cols
    ):
        return "bt_clients"
    if (
        any(k in joined for k in ["supplier", "vendor", "total value", "contract"])
        or "raindrop" in fname
        or "contract" in fname
    ):
        return "raindrop_vendors"
    return "unknown"
