"""THE parity proof: run our KPI builders on the reference's own
committed fact tables (/root/reference, read-only) and compare
column-for-column against its committed derived tables. Guarded on the
reference being present so the suite still runs elsewhere."""

from __future__ import annotations

import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/trade.parquet"),
    reason="reference artifacts not available")


def _compare(ours_pdf, ref_pdf, keys):
    """Exact (1e-6) on every column, *_ma3 included — the ma3 columns
    now run the reference's own pandas rolling kernel (grouped_map.
    pandas_rolling_mean), so no .5-boundary allowance is needed."""
    ours = ours_pdf.set_index(keys).sort_index()
    ref = ref_pdf.set_index(keys).sort_index()
    assert len(ours) == len(ref), (len(ours), len(ref))
    assert sorted(ours.columns) == sorted(ref.columns)
    problems = {}
    for col in ref.columns:
        o, r = ours[col], ref[col]
        if o.dtype == object:
            if not (o == r).all():
                problems[col] = "string mismatch"
            continue
        both_nan = o.isna() & r.isna()
        nan_mismatch = int((o.isna() != r.isna()).sum())
        diff = (o.astype(float) - r.astype(float)).abs().where(~both_nan, 0)
        if diff.max() > 1e-6 or nan_mismatch:
            problems[col] = (float(diff.max()), nan_mismatch)
    assert not problems, problems


def test_kpi_monthly_reproduces_reference_artifact(spark):
    import pandas as pd

    from sunat_rree_demo_spark.plans.kpi import build_kpi_monthly

    trade = spark.read.parquet(f"{REF}/trade.parquet")
    _compare(build_kpi_monthly(trade).toPandas(),
             pd.read_parquet(f"{REF}/kpi_monthly.parquet"),
             ["year", "month"])


def test_kpi_prod_monthly_reproduces_reference_artifact(spark):
    import pandas as pd

    from sunat_rree_demo_spark.plans.kpi import build_kpi_prod_monthly

    tp = spark.read.parquet(f"{REF}/trade_prod.parquet")
    _compare(build_kpi_prod_monthly(tp).toPandas(),
             pd.read_parquet(f"{REF}/kpi_prod_monthly.parquet"),
             ["year", "month", "category"])


def test_insights_and_eda_run_on_reference_data(spark):
    """The downstream layers must consume the real tables end-to-end."""
    from sunat_rree_demo_spark.plans.eda import run_eda
    from sunat_rree_demo_spark.plans.insights import build_insights, quick_stats
    from sunat_rree_demo_spark.plans.kpi import (
        build_kpi_monthly,
        build_kpi_prod_monthly,
    )

    km = build_kpi_monthly(spark.read.parquet(f"{REF}/trade.parquet"))
    kp = build_kpi_prod_monthly(spark.read.parquet(f"{REF}/trade_prod.parquet"))
    stats = run_eda(km)
    # the reference's published EDA stats (reports/eda/eda_summary.md:4-7
    # prints at 1 decimal; our bundle keeps 2, so compare within half a
    # display unit)
    assert abs(stats["mean_export_bn"] - 2.9) <= 0.05
    assert abs(stats["std_export_bn"] - 0.8) <= 0.05
    assert abs(stats["max_export_bn"] - 4.6) <= 0.05
    assert (stats["peak_year"], stats["peak_month"]) == (2011, 8)
    assert stats["n_months"] == 156 and stats["surplus_months"] == 109
    # the committed kpi_prod has disjoint flows per category → balance is
    # NaN throughout the latest year → the reference's own dropna
    # (insights_engine.py:63-68) yields the no-data card; both shapes are
    # faithful depending on the year's completeness
    cards = build_insights(kp)
    assert cards and ("Insight #1" in cards[0] or "Sin datos" in cards[0])
    qs = quick_stats(kp)
    assert qs["latest_year"] == 2025 and qs["active_categories"] > 0


def test_reference_summary_markdown_matches_committed_report(spark):
    """S11 golden: render the reference's own eda_summary.md template
    from the committed kpi_monthly and compare byte-for-byte against the
    committed report's stat sections (reports/eda/eda_summary.md:1-16;
    the trailing narrative/file-list/timestamp lines are static prose,
    not engine output)."""
    from sunat_rree_demo_spark.plans.eda import reference_summary_markdown

    km = spark.read.parquet(f"{REF}/kpi_monthly.parquet")
    ours = reference_summary_markdown(km).splitlines()
    with open(f"{REF}/reports/eda/eda_summary.md", encoding="utf-8") as f:
        ref = f.read().splitlines()
    assert ours == ref[: len(ours)]


def test_chart_artifacts_shapes_and_outliers(spark, tmp_path):
    """S11 chart sink: six artifacts with the reference figures' data —
    series lengths = n months, heatmap = months × years, outlier flags =
    the committed report's 7 events, dashboard carries all four panels."""
    import json

    from sunat_rree_demo_spark.plans.eda import write_chart_artifacts

    km = spark.read.parquet(f"{REF}/kpi_monthly.parquet")
    paths = write_chart_artifacts(km, str(tmp_path))
    assert sorted(paths) == [
        "dashboard_eda", "distribucion_mensual", "estacionalidad_heatmap",
        "outliers", "series_temporal", "tendencias",
    ]
    with open(paths["series_temporal"], encoding="utf-8") as f:
        series = json.load(f)
    assert len(series["x"]) == 156
    assert {len(v) for v in series["series"].values()} == {156}
    with open(paths["estacionalidad_heatmap"], encoding="utf-8") as f:
        heat = json.load(f)
    assert len(heat["y"]) == 12 and len(heat["x"]) == 13
    assert all(len(row) == len(heat["x"]) for row in heat["z"])
    with open(paths["outliers"], encoding="utf-8") as f:
        out = json.load(f)
    assert len(out["outliers"]["x"]) == 7  # eda_summary.md: 7 eventos
    with open(paths["dashboard_eda"], encoding="utf-8") as f:
        dash = json.load(f)
    assert sorted(dash["panels"]) == [
        "Balance Comercial", "Comercio Exterior",
        "Crecimiento YoY", "Estacionalidad",
    ]
    with open(paths["tendencias"], encoding="utf-8") as f:
        trends = json.load(f)
    # min_periods=1 ⇒ ma12 of the first row equals the raw value
    assert trends["series"]["Media Móvil 12m"][0] == pytest.approx(
        trends["series"]["Exportaciones"][0])


def test_chart_html_artifacts_render_and_embed_data(spark, tmp_path):
    """S11 HTML sink twin of the reference's Plotly files
    (eda.py:84-243): six standalone .html artifacts with the
    reference basenames, each carrying an inline SVG figure and the
    FULL chart bundle as an embedded JSON payload — byte-identical to
    what write_chart_artifacts persists as .json."""
    import json
    import re

    from sunat_rree_demo_spark.plans.charts_html import (
        write_chart_html_artifacts,
    )
    from sunat_rree_demo_spark.plans.eda import _json_safe, chart_bundle

    km = spark.read.parquet(f"{REF}/kpi_monthly.parquet")
    paths = write_chart_html_artifacts(km, str(tmp_path))
    assert sorted(paths) == [
        "dashboard_eda", "distribucion_mensual", "estacionalidad_heatmap",
        "outliers", "series_temporal", "tendencias",
    ]
    bundles = chart_bundle(km)
    for name, p in paths.items():
        assert p.endswith(f"{name}.html")
        with open(p, encoding="utf-8") as f:
            doc = f.read()
        assert doc.startswith("<!DOCTYPE html>") and "<svg" in doc
        m = re.search(
            r'<script type="application/json" id="chart-data">(.*?)'
            r'</script>', doc, re.S)
        assert m, f"{name}: no embedded chart data"
        assert json.loads(m.group(1)) == json.loads(
            json.dumps(_json_safe(bundles[name])))
    # figure sanity: the line chart draws one 2px polyline per series,
    # the heatmap one <rect> per non-null cell, the scatter flags the
    # committed report's 7 outlier events in the highlight slot
    with open(paths["series_temporal"], encoding="utf-8") as f:
        doc = f.read()
    assert doc.count("<polyline") >= 3 and 'stroke-width="2"' in doc
    with open(paths["estacionalidad_heatmap"], encoding="utf-8") as f:
        heat = f.read()
    cells = sum(1 for row in bundles["estacionalidad_heatmap"]["z"]
                for v in row if v is not None)
    assert heat.count("<rect") == cells
    with open(paths["outliers"], encoding="utf-8") as f:
        out = f.read()
    assert out.count('fill="var(--series-2)"') == 7


def test_chart_html_is_interactive_and_degrades(spark, tmp_path):
    """r11: every chart document carries the dependency-free pan/zoom
    script (the Plotly-modebar analog — wheel zoom, drag pan,
    double-click reset on the SVG viewBox) AFTER the data payload, so
    the figure and embedded JSON stay fully usable with scripting
    disabled; serve.py pages include the same script once."""
    from sunat_rree_demo_spark.plans.charts_html import (
        PANZOOM_JS,
        panzoom_script,
        write_chart_html_artifacts,
    )
    from sunat_rree_demo_spark.plans.serve import _page

    km = spark.read.parquet(f"{REF}/kpi_monthly.parquet")
    paths = write_chart_html_artifacts(km, str(tmp_path))
    for p in paths.values():
        with open(p, encoding="utf-8") as f:
            doc = f.read()
        assert PANZOOM_JS in doc
        assert doc.index('id="chart-data"') < doc.index("viewBox', vb")
    for hook in ("wheel", "pointerdown", "dblclick", "viewBox"):
        assert hook in PANZOOM_JS
    # '</' must never appear raw inside the script element
    assert "</" not in PANZOOM_JS
    page = _page("t", "<div class='viz-root'><svg viewBox='0 0 1 1'>"
                 "</svg></div>")
    assert page.count(panzoom_script()) == 1
