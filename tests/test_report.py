"""K1/K2-lite report sinks: sheet names, row counts, HTML rendering."""

import os

from pyspark.sql import functions as F

from ai_data_matching_spark.sources.report import (
    RAW_SHEETS,
    SHEETS,
    build_report_frames,
    export_html,
    export_workbook,
)


def test_report_frames_and_sinks(spark, tmp_path):
    from ai_data_matching_spark.pipeline import run_pipeline
    from ai_data_matching_spark.synth import generate_pages

    pages = generate_pages(spark, 150, seed=11).drop("entity_id")
    res = run_pipeline(spark, pages)
    frames = build_report_frames(res.clusters, res.stats, top_n=5)
    assert list(frames) == SHEETS
    n_clusters = res.clusters.count()
    assert len(frames["Matches"]) == n_clusters
    assert set(frames["Summary"]["Metric"]) >= {"n_pages", "n_clusters"}
    assert frames["Match Analysis"]["Count"].sum() == n_clusters
    assert len(frames["Top Relationships"]) == min(5, n_clusters)
    # members arrays are presentation-dropped
    assert "members" not in frames["Matches"].columns

    out = export_workbook(frames, str(tmp_path / "report.xlsx"))
    assert out.endswith(".xlsx") and os.path.getsize(out) > 0
    from ai_data_matching_spark.sources.xlsx import read_workbook
    wb = read_workbook(out)
    assert list(wb) == SHEETS
    assert len(wb["Matches"]) == n_clusters + 1  # header + one row per cluster

    html = export_html(frames)
    assert "<h2>Matches</h2>" in html and "n_pages" in html

    # reference sheet parity: Vendor Data / Client Data raw dumps
    # (export_manager.py:66-75) — bounded, doubles rounded to 2
    vendor = pages.select("url", "warc_ts", (F.length("html") / 3.0).alias("spend"))
    client = pages.select("url", "lang")
    frames6 = build_report_frames(
        res.clusters, res.stats, top_n=5, max_rows=100,
        vendor_data=vendor, client_data=client,
    )
    assert list(frames6) == SHEETS + RAW_SHEETS
    assert len(frames6["Vendor Data"]) == 100       # max_rows bound
    v0 = frames6["Vendor Data"]["spend"].iloc[0]
    assert round(float(v0), 2) == float(v0)         # reference rounding
    assert list(frames6["Client Data"].columns) == ["url", "lang"]
    out6 = export_workbook(frames6, str(tmp_path / "report6.xlsx"))
    from ai_data_matching_spark.sources.xlsx import read_workbook
    assert list(read_workbook(out6)) == SHEETS + RAW_SHEETS
    from ai_data_matching_spark.cache import release_persisted
    release_persisted()
