"""Standalone HTML renderings of the S11 chart bundles — artifact
parity with the reference's ``reports/eda/*.html`` Plotly sinks
(``eda.py:84,109,117,150,191,243``), dependency-free: each file is one
self-contained document with an inline SVG figure plus the full chart
frame embedded as ``<script type="application/json">`` (the same bundle
``write_chart_artifacts`` persists as ``.json``), so downstream tooling
can read the data straight out of the HTML exactly as it could from the
reference's Plotly payloads.

Rendering follows the engine's chart conventions: categorical series
colors are assigned in fixed slot order (never cycled), sequential
magnitude uses one blue ramp light→dark, text wears ink tokens (never
series colors), 2px lines / recessive grid, a legend whenever ≥2
series, light and dark modes both specified via CSS custom properties,
and native ``<title>`` hover tooltips on point/cell marks. All geometry
is computed driver-side over the ≤hundreds-of-rows chart frame — the
Spark side of the job ended when ``chart_bundle`` collected it.
"""

from __future__ import annotations

import html
import json
import math
import os
from typing import Any

from pyspark.sql import DataFrame

from sunat_rree_demo_spark.plans.eda import _json_safe, chart_bundle

#: fixed categorical slot order (validated palette; light, dark).
_SERIES = [("#2a78d6", "#3987e5"),   # slot 1 blue
           ("#eb6834", "#d95926"),   # slot 2 orange
           ("#1baf7a", "#199e70")]   # slot 3 aqua

_W, _H = 720, 360
_ML, _MR, _MT, _MB = 56, 16, 24, 44  # plot margins

_CSS = """
.viz-root { color-scheme: light;
  --surface-1:#fcfcfb; --text-primary:#0b0b0b; --text-secondary:#52514e;
  --grid:#e4e3df;
  --series-1:#2a78d6; --series-2:#eb6834; --series-3:#1baf7a; --series-4:#8a5cc8; --series-5:#b8921a; --series-6:#d04d7c; --series-7:#158fad; --series-8:#7f7e78; }
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root { color-scheme: dark;
    --surface-1:#1a1a19; --text-primary:#ffffff; --text-secondary:#c3c2b7;
    --grid:#34332f;
    --series-1:#3987e5; --series-2:#d95926; --series-3:#199e70; --series-4:#8a5cc8; --series-5:#b8921a; --series-6:#d04d7c; --series-7:#158fad; --series-8:#7f7e78; } }
:root[data-theme="dark"] .viz-root { color-scheme: dark;
  --surface-1:#1a1a19; --text-primary:#ffffff; --text-secondary:#c3c2b7;
  --grid:#34332f;
  --series-1:#3987e5; --series-2:#d95926; --series-3:#199e70; --series-4:#8a5cc8; --series-5:#b8921a; --series-6:#d04d7c; --series-7:#158fad; --series-8:#7f7e78; }
.viz-root { background: var(--surface-1); color: var(--text-primary);
  font: 13px/1.4 system-ui, sans-serif; padding: 16px; }
.viz-root h1 { font-size: 16px; margin: 0 0 8px; }
.viz-root .legend { display: flex; gap: 16px; margin: 4px 0 8px;
  color: var(--text-secondary); }
.viz-root .legend .swatch { display: inline-block; width: 10px;
  height: 10px; border-radius: 2px; margin-right: 5px; }
.viz-root svg text { fill: var(--text-secondary); font-size: 11px; }
.viz-root svg .gridline { stroke: var(--grid); stroke-width: 1; }
.viz-root svg .axisline { stroke: var(--text-secondary); stroke-width: 1; }
"""


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n nice round tick values covering [lo, hi]."""
    if not (math.isfinite(lo) and math.isfinite(hi)) or hi <= lo:
        return [lo] if math.isfinite(lo) else [0.0]
    raw = (hi - lo) / n
    mag = 10 ** math.floor(math.log10(raw))
    step = next(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    t0 = math.floor(lo / step) * step
    out, t = [], t0
    while t <= hi + step / 2:
        if t >= lo - step / 2:
            out.append(round(t, 10))
        t += step
    return out


class _Scale:
    """Linear y + index x over the plot box."""

    def __init__(self, xs_n: int, ys: list[float],
                 w: int = _W, h: int = _H):
        finite = [y for y in ys if y is not None and math.isfinite(y)]
        self.ylo = min(finite) if finite else 0.0
        self.yhi = max(finite) if finite else 1.0
        if self.ylo == self.yhi:
            self.ylo -= 1.0
            self.yhi += 1.0
        pad = (self.yhi - self.ylo) * 0.05
        self.ylo -= pad
        self.yhi += pad
        self.xn = max(xs_n, 1)
        self.w, self.h = w, h

    def x(self, i: int) -> float:
        span = self.w - _ML - _MR
        if self.xn == 1:
            return _ML + span / 2
        return _ML + span * i / (self.xn - 1)

    def y(self, v: float) -> float:
        span = self.h - _MT - _MB
        return _MT + span * (1 - (v - self.ylo) / (self.yhi - self.ylo))


def _axes(sc: _Scale, xlabels: list[str]) -> list[str]:
    parts = []
    for tv in _ticks(sc.ylo, sc.yhi):
        y = sc.y(tv)
        parts.append(f'<line class="gridline" x1="{_ML}" y1="{y:.1f}" '
                     f'x2="{sc.w - _MR}" y2="{y:.1f}"/>')
        parts.append(f'<text x="{_ML - 6}" y="{y + 4:.1f}" '
                     f'text-anchor="end">{tv:g}</text>')
    parts.append(f'<line class="axisline" x1="{_ML}" y1="{sc.h - _MB}" '
                 f'x2="{sc.w - _MR}" y2="{sc.h - _MB}"/>')
    # ≤8 x labels, evenly thinned
    step = max(1, math.ceil(len(xlabels) / 8))
    for i in range(0, len(xlabels), step):
        parts.append(f'<text x="{sc.x(i):.1f}" y="{sc.h - _MB + 16}" '
                     f'text-anchor="middle">'
                     f'{html.escape(str(xlabels[i]))}</text>')
    return parts


def _polyline(sc: _Scale, ys: list[float | None], slot: int) -> str:
    segs, cur = [], []
    for i, v in enumerate(ys):
        if v is None or not math.isfinite(v):
            if cur:
                segs.append(cur)
            cur = []
        else:
            cur.append(f"{sc.x(i):.1f},{sc.y(v):.1f}")
    if cur:
        segs.append(cur)
    return "".join(
        f'<polyline fill="none" stroke="var(--series-{slot})" '
        f'stroke-width="2" points="{" ".join(s)}"/>'
        for s in segs if len(s) >= 2)


def _legend(names: list[str]) -> str:
    if len(names) < 2:
        return ""
    items = "".join(
        f'<span><span class="swatch" '
        f'style="background:var(--series-{i + 1})"></span>'
        f'{html.escape(n)}</span>'
        for i, n in enumerate(names))
    return f'<div class="legend">{items}</div>'


def _svg(body: list[str], w: int = _W, h: int = _H) -> str:
    return (f'<svg viewBox="0 0 {w} {h}" width="{w}" height="{h}" '
            f'role="img">' + "".join(body) + "</svg>")


def _render_line(b: dict[str, Any]) -> str:
    names = list(b["series"])
    allv = [v for s in b["series"].values() for v in s
            if v is not None]
    sc = _Scale(len(b["x"]), allv)
    body = _axes(sc, b["x"])
    for i, n in enumerate(names):
        body.append(_polyline(sc, b["series"][n], i + 1))
    return _legend(names) + _svg(body)


def _heat_color(frac: float) -> str:
    """Sequential single-hue blue ramp, light→dark (magnitude job)."""
    a = (234, 242, 252)  # near-surface tint
    z = (16, 63, 120)    # deep blue
    r, g, bl = (round(a[i] + (z[i] - a[i]) * frac) for i in range(3))
    return f"rgb({r},{g},{bl})"


def _render_heatmap(b: dict[str, Any]) -> str:
    xs, ys, z = b["x"], b["y"], b["z"]
    vals = [v for row in z for v in row if v is not None]
    lo, hi = (min(vals), max(vals)) if vals else (0.0, 1.0)
    span = (hi - lo) or 1.0
    ml = 88
    cw = (_W - ml - _MR) / max(len(xs), 1)
    ch = (_H - _MT - _MB) / max(len(ys), 1)
    body = []
    for r, yl in enumerate(ys):
        body.append(f'<text x="{ml - 6}" y="{_MT + (r + 0.65) * ch:.1f}" '
                    f'text-anchor="end">{html.escape(str(yl))}</text>')
        for c, xl in enumerate(xs):
            v = z[r][c]
            if v is None:
                continue
            fill = _heat_color((v - lo) / span)
            body.append(
                f'<rect x="{ml + c * cw:.1f}" y="{_MT + r * ch:.1f}" '
                f'width="{cw - 2:.1f}" height="{ch - 2:.1f}" '
                f'fill="{fill}" rx="2">'
                f'<title>{html.escape(str(yl))} {html.escape(str(xl))}: '
                f'{v:g}</title></rect>')
    for c, xl in enumerate(xs):
        body.append(f'<text x="{ml + (c + 0.5) * cw:.1f}" '
                    f'y="{_H - _MB + 16}" text-anchor="middle">'
                    f'{html.escape(str(xl))}</text>')
    return _svg(body)


def _quartiles(vals: list[float]) -> tuple[float, float, float]:
    s = sorted(vals)

    def q(p: float) -> float:
        k = (len(s) - 1) * p
        f, c = math.floor(k), math.ceil(k)
        return s[f] + (s[c] - s[f]) * (k - f)

    return q(0.25), q(0.5), q(0.75)


def _render_box(b: dict[str, Any]) -> str:
    groups: dict[str, list[float]] = {}
    for xl, v in zip(b["x"], b["y"]):
        if v is not None:
            groups.setdefault(str(xl), []).append(v)
    names = list(groups)
    sc = _Scale(len(names), [v for g in groups.values() for v in g])
    body = _axes(sc, names)
    bw = min(28.0, (_W - _ML - _MR) / max(len(names), 1) * 0.6)
    for i, n in enumerate(names):
        g = groups[n]
        q1, med, q3 = _quartiles(g)
        cx = sc.x(i)
        body.append(
            f'<line class="axisline" x1="{cx:.1f}" y1="{sc.y(min(g)):.1f}" '
            f'x2="{cx:.1f}" y2="{sc.y(max(g)):.1f}"/>')
        body.append(
            f'<rect x="{cx - bw / 2:.1f}" y="{sc.y(q3):.1f}" '
            f'width="{bw:.1f}" height="{sc.y(q1) - sc.y(q3):.1f}" '
            f'fill="var(--series-1)" fill-opacity="0.55" rx="2">'
            f'<title>{html.escape(n)}: q1 {q1:g}, mediana {med:g}, '
            f'q3 {q3:g}</title></rect>')
        body.append(
            f'<line x1="{cx - bw / 2:.1f}" y1="{sc.y(med):.1f}" '
            f'x2="{cx + bw / 2:.1f}" y2="{sc.y(med):.1f}" '
            f'stroke="var(--series-1)" stroke-width="2"/>')
    return _svg(body)


def _render_scatter(b: dict[str, Any]) -> str:
    sc = _Scale(len(b["x"]), b["y"])
    body = _axes(sc, b["x"])
    out = set(zip(b["outliers"]["x"], b["outliers"]["y"]))
    for i, (xl, v) in enumerate(zip(b["x"], b["y"])):
        if v is None or not math.isfinite(v):
            continue
        is_out = (xl, v) in out
        slot = 2 if is_out else 1
        r = 5 if is_out else 3.5
        body.append(
            f'<circle cx="{sc.x(i):.1f}" cy="{sc.y(v):.1f}" r="{r}" '
            f'fill="var(--series-{slot})">'
            f'<title>{html.escape(str(xl))}: {v:.2f}%'
            f'{" (outlier &gt;2σ)" if is_out else ""}</title></circle>')
    return (_legend(["Δ% mensual", "Outliers >2σ"]) + _svg(body))


def _render_dashboard(b: dict[str, Any]) -> str:
    parts = []
    for title, panel in b["panels"].items():
        names = list(panel["series"])
        allv = [v for s in panel["series"].values() for v in s
                if v is not None]
        sc = _Scale(len(panel["x"]), allv, w=_W // 2, h=_H // 2 + 40)
        body = _axes(sc, [str(x) for x in panel["x"]])
        for i, n in enumerate(names):
            body.append(_polyline(sc, panel["series"][n], i + 1))
        parts.append(
            f'<div style="display:inline-block; margin:4px">'
            f'<h1>{html.escape(title)}</h1>{_legend(names)}'
            f'{_svg(body, _W // 2, _H // 2 + 40)}</div>')
    return "".join(parts)


_RENDERERS = {
    "line": _render_line,
    "heatmap": _render_heatmap,
    "box": _render_box,
    "scatter": _render_scatter,
    "dashboard": _render_dashboard,
}


#: Zoomable-figure enhancement (r11 — the reference's Plotly charts
#: pan/zoom; `eda.py:84-298` relies on Plotly's default modebar). The
#: SVG figures stay fully readable with scripting disabled; this
#: inline, dependency-free script progressively adds wheel-zoom
#: (cursor-anchored), drag-pan and double-click-reset to every
#: `.viz-root svg` by rewriting the viewBox — the SVG analog of
#: Plotly's axis-rescale, keeping the zero-dependency stance.
PANZOOM_JS = """
(function () {
  'use strict';
  function enhance(svg) {
    var vb0 = (svg.getAttribute('viewBox') || '').split(/\\s+/).map(Number);
    if (vb0.length !== 4 || vb0.some(isNaN)) return;
    var vb = vb0.slice(), drag = null;
    svg.style.cursor = 'grab';
    svg.style.touchAction = 'none';
    function apply() { svg.setAttribute('viewBox', vb.join(' ')); }
    function pt(ev) {
      var r = svg.getBoundingClientRect();
      return [vb[0] + (ev.clientX - r.left) / r.width * vb[2],
              vb[1] + (ev.clientY - r.top) / r.height * vb[3]];
    }
    svg.addEventListener('wheel', function (ev) {
      ev.preventDefault();
      var f = ev.deltaY < 0 ? 0.8 : 1.25;
      var z = (vb[2] * f) / vb0[2];
      if (z < 0.05 || z > 1) { vb = vb0.slice(); apply(); return; }
      var p = pt(ev);
      vb = [p[0] - (p[0] - vb[0]) * f, p[1] - (p[1] - vb[1]) * f,
            vb[2] * f, vb[3] * f];
      apply();
    }, { passive: false });
    svg.addEventListener('pointerdown', function (ev) {
      drag = [ev.clientX, ev.clientY, vb[0], vb[1]];
      svg.setPointerCapture(ev.pointerId);
      svg.style.cursor = 'grabbing';
    });
    svg.addEventListener('pointermove', function (ev) {
      if (!drag) return;
      var r = svg.getBoundingClientRect();
      vb[0] = drag[2] - (ev.clientX - drag[0]) / r.width * vb[2];
      vb[1] = drag[3] - (ev.clientY - drag[1]) / r.height * vb[3];
      apply();
    });
    svg.addEventListener('pointerup', function () {
      drag = null; svg.style.cursor = 'grab';
    });
    svg.addEventListener('dblclick', function () {
      vb = vb0.slice(); apply();
    });
  }
  function init() {
    document.querySelectorAll('.viz-root svg').forEach(enhance);
  }
  if (document.readyState === 'loading') {
    document.addEventListener('DOMContentLoaded', init);
  } else { init(); }
})();
"""


def panzoom_script() -> str:
    """The interactive-figure `<script>` element, for pages embedding
    `render_figure` fragments (the serving tier includes it once per
    page; `render_chart_html` documents carry it themselves)."""
    return f"<script>{PANZOOM_JS}</script>"


def render_figure(bundle: dict[str, Any]) -> str:
    """Just the legend+SVG fragment for one bundle — for callers that
    embed a figure inside their own page (the serving tier's category
    view) rather than emitting a standalone document."""
    return _RENDERERS[bundle["kind"]](bundle)


def render_chart_html(name: str, bundle: dict[str, Any]) -> str:
    """One standalone HTML document: title, inline-SVG figure, and the
    verbatim chart bundle as an embedded JSON payload."""
    figure = _RENDERERS[bundle["kind"]](bundle)
    # '</' must not appear raw inside a <script> block: a data string
    # containing '</script>' would terminate the element mid-payload.
    # '<\/' is identical JSON (escaped solidus), so json.loads of the
    # embedded text is unchanged.
    payload = json.dumps(_json_safe(bundle), ensure_ascii=False) \
        .replace("</", "<\\/")
    return (
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
        f"<title>{html.escape(name)}</title>"
        f"<style>{_CSS}</style></head>\n"
        f"<body><div class=\"viz-root\"><h1>{html.escape(name)}</h1>"
        f"{figure}</div>\n"
        f"<script type=\"application/json\" id=\"chart-data\">{payload}"
        f"</script>\n{panzoom_script()}</body></html>\n")


def write_chart_html_artifacts(kpi_monthly: DataFrame,
                               out_dir: str) -> dict[str, str]:
    """S11 HTML sink — persist the six chart bundles as standalone HTML
    files with the reference's artifact basenames (``eda.py:84-243``).
    Returns {basename: path}. One Spark collect total (chart_bundle);
    rendering is driver-side string assembly."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, bundle in chart_bundle(kpi_monthly).items():
        p = os.path.join(out_dir, f"{name}.html")
        with open(p, "w", encoding="utf-8") as f:
            f.write(render_chart_html(name, bundle))
        paths[name] = p
    return paths
