"""K1/K2-lite report sinks: sheet names, row counts, HTML rendering."""

import os

from ai_data_matching_spark.sources.report import (
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
    from ai_data_matching_spark.cache import release_persisted
    release_persisted()
