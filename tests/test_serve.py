"""The dashboard serving process (plans/serve.py): rerun-loop
semantics (every GET re-executes the parameterized query with the
URL's widget state), widget validation, and a real socket round trip.
"""

from __future__ import annotations

import json
import re
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def app(spark):
    from sunat_rree_demo_spark.plans.kpi import (
        build_kpi_monthly,
        build_kpi_prod_monthly,
    )
    from sunat_rree_demo_spark.plans.serve import DashboardApp
    from sunat_rree_demo_spark.sources.trade import (
        synthetic_trade,
        synthetic_trade_prod,
    )

    return DashboardApp(spark,
                        build_kpi_monthly(synthetic_trade(spark)),
                        build_kpi_prod_monthly(
                            synthetic_trade_prod(spark)))


def test_index_lists_all_six_figures(app):
    status, body = app.render("/")
    assert status == 200
    for name in ("series_temporal", "estacionalidad_heatmap",
                 "distribucion_mensual", "tendencias"):
        assert f"/chart/{name}" in body


def test_chart_page_embeds_svg_and_payload(app):
    status, body = app.render("/chart/series_temporal")
    assert status == 200
    assert "<svg" in body and "chart-data" in body


def test_country_rerun_applies_year_range_widget(app):
    """The rerun loop: the same path with different widget state
    re-executes the filtered query — out-of-range years must not
    appear in the selected-range table."""
    status, body = app.render("/country?lo=2010&hi=2011")
    assert status == 200
    sel = body.split("selected range")[1]
    years = set(re.findall(r"<td>(20\d\d)</td>", sel))
    assert years == {"2010", "2011"}
    # widening the range is a fresh run with more rows
    _, wide = app.render("/country?lo=2010&hi=2013")
    assert wide.count("<tr>") > body.count("<tr>")


def test_ranking_metric_widget_and_validation(app):
    status, body = app.render("/ranking?year=2012&metric=balance&n=3")
    assert status == 200
    assert body.count("<tr>") == 4  # header + n rows
    status, body = app.render("/ranking?metric=bogus")
    assert status == 400 and "metric" in body
    status, _ = app.render("/country?lo=abc")
    assert status == 400


def test_unknown_paths_are_404(app):
    assert app.render("/nope")[0] == 404
    assert app.render("/chart/nope")[0] == 404


def test_http_round_trip_on_a_real_socket(app):
    from sunat_rree_demo_spark.plans.serve import serve

    srv = serve(app, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        with urllib.request.urlopen(
                f"http://{host}:{port}/healthz", timeout=30) as r:
            assert r.status == 200
            years = json.loads(r.read())["years"]
            assert years[0] <= years[1]
        with urllib.request.urlopen(
                f"http://{host}:{port}/country?lo={years[0]}"
                f"&hi={years[0]}", timeout=60) as r:
            assert r.status == 200
            assert "selected range" in r.read().decode()
    finally:
        srv.shutdown()
        srv.server_close()
