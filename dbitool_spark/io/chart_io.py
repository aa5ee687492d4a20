"""Chart sink (reference TODO:77-78: "Implement a graph module to
extract data and create a chart: internal perl chart class, gnuplot
or graphviz").

All three of the TODO's suggested backends, pure stdlib text
emission (the engine's own-codec discipline — xlsx/bson/jpeg — in
its simplest form, since SVG / gnuplot scripts / DOT are text):

- **internal chart class** -> ``bar_chart_svg`` / ``line_chart_svg``:
  deterministic SVG documents. Every bar carries ``data-key`` /
  ``data-value`` attributes alongside its computed pixel geometry, so
  the chart is self-describing: ``parse_svg_bars`` recovers the exact
  input values AND the layout arithmetic is re-checkable from the
  same document (the driver entry does both — a green row proves the
  geometry, not just that an SVG got written).
- **gnuplot** -> ``gnuplot_script``: a runnable .gp script with the
  data inlined as a heredoc datablock ($data << EOD), parseable back
  by ``parse_gnuplot_datablock``.
- **graphviz** -> ``dot_graph``: a DOT digraph from (src, dst,
  weight) edges.

Scale shape: a chart is a driver-side document with one writer, the
same inherently-bounded edge as the single-document JSON sink —
guarded by memorylimit (io/json_io.py:122 pattern). The AGGREGATION
that produces the handful of plotted points is ordinary distributed
Spark upstream; only the plotted points cross the driver edge. A
chart with >memorylimit marks is a modeling error, not a scale case.
"""

from __future__ import annotations

import math
import re as _re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

from dbitool_spark.io import _atomic

DEFAULT_MEMORY_LIMIT = 100_000


def bounded_rows(
    df: DataFrame,
    cols: list[str],
    *,
    max_rows: int = DEFAULT_MEMORY_LIMIT,
    what: str = "chart",
) -> list:
    """Bounded column fetch — ONE limit(n+1) job; the single
    memorylimit-guarded driver edge every chart backend goes
    through."""
    rows = df.select(*cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise MemoryError(
            f"{what} is a bounded edge: >{max_rows} rows "
            "(reference memorylimit semantics); aggregate first"
        )
    return rows


def chart_rows(
    df: DataFrame,
    label_col: str,
    value_col: str,
    *,
    max_rows: int = DEFAULT_MEMORY_LIMIT,
) -> list[tuple[str, float]]:
    """Bounded (label, value) fetch. Non-finite values are rejected
    here, at the driver edge, so no backend ever has to emit "nan"
    into a document that claims to be parseable by construction."""
    out = [
        (str(r[0]), float(r[1]))
        for r in bounded_rows(df, [label_col, value_col], max_rows=max_rows)
    ]
    bad = next((lbl for lbl, v in out if not math.isfinite(v)), None)
    if bad is not None:
        raise ValueError(
            f"chart value for {bad!r} is not finite; filter NaN/inf "
            "upstream (a non-finite mark has no geometry)"
        )
    return out


def _xml_safe(s: str) -> str:
    """XML 1.0 cannot carry most control characters AT ALL (escaped or
    not); a label containing them would make the document unparseable.
    Replace each with U+FFFD so the chart stays well-formed — lossy by
    necessity, and only for characters no chart could render anyway."""
    def ok(c: str) -> bool:
        o = ord(c)
        return (
            o in (0x9, 0xA, 0xD)
            or 0x20 <= o <= 0xD7FF
            or 0xE000 <= o <= 0xFFFD
            or 0x10000 <= o <= 0x10FFFF
        )

    return "".join(c if ok(c) else "\N{REPLACEMENT CHARACTER}" for c in s)


def _label_safe(s: str) -> str:
    """Shared label sanitation for ALL backends: XML-invalid chars
    (they cannot appear in SVG at all) plus every line-break form
    (\n, \r, U+0085, U+2028, U+2029 — they would corrupt the
    line-oriented gnuplot/DOT documents; a multi-line axis label is a
    modeling error regardless) become U+FFFD. One rule -> the same label text
    renders identically in every backend, and every emitted document
    is parseable by construction."""
    out = _xml_safe(s)
    for brk in ("\n", "\r", "\x85", "\u2028", "\u2029"):
        out = out.replace(brk, "\N{REPLACEMENT CHARACTER}")
    return out


def _fmt_num(v: float) -> str:
    """Stable numeric text: integers without a trailing .0, floats via
    repr (round-trippable)."""
    if float(v).is_integer():
        return str(int(v))
    return repr(float(v))


def bar_chart_svg(
    rows: list[tuple[str, float]],
    *,
    width: int = 640,
    height: int = 400,
    margin: int = 40,
    title: str | None = None,
) -> str:
    """Vertical bar chart. Layout contract (pinned by tests and the
    driver entry): plot area is (width-2*margin) x (height-2*margin);
    bar i of n gets x = margin + i*slot + slot/8, width = slot*3/4
    with slot = plot_w/n; bar height = value/max_value * plot_h,
    y = height - margin - bar_height. Rounding: 2 decimal places.
    Zero/negative values render as zero-height bars (bar charts are
    for magnitudes; use line_chart_svg for signed series)."""
    if not rows:
        raise ValueError("bar_chart_svg needs at least one (label, value) row")
    if not all(math.isfinite(v) for _, v in rows):
        raise ValueError(
            "bar_chart_svg values must be finite; filter NaN/inf upstream"
        )
    plot_w = width - 2 * margin
    plot_h = height - 2 * margin
    max_v = max(max(v for _, v in rows), 0.0)
    slot = plot_w / len(rows)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
    ]
    if title:
        title = _label_safe(title)
        parts.append(
            f'<title>{escape(title)}</title>'
            f'<text x="{width / 2:.2f}" y="{margin / 2:.2f}" '
            f'text-anchor="middle">{escape(title)}</text>'
        )
    parts.append(
        f'<line x1="{margin}" y1="{height - margin}" x2="{width - margin}" '
        f'y2="{height - margin}" stroke="black"/>'
    )
    for i, (label, value) in enumerate(rows):
        label = _label_safe(label)
        h = 0.0 if max_v <= 0 else max(value, 0.0) / max_v * plot_h
        x = margin + i * slot + slot / 8
        y = height - margin - h
        parts.append(
            f'<rect x="{x:.2f}" y="{y:.2f}" width="{slot * 0.75:.2f}" '
            f'height="{h:.2f}" data-key={quoteattr(label)} '
            f'data-value={quoteattr(_fmt_num(value))} fill="steelblue"/>'
        )
        parts.append(
            f'<text x="{x + slot * 0.375:.2f}" y="{height - margin + 15:.2f}" '
            f'text-anchor="middle" font-size="10">{escape(label)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def line_chart_svg(
    points: list[tuple[float, float]],
    *,
    width: int = 640,
    height: int = 400,
    margin: int = 40,
    title: str | None = None,
) -> str:
    """Polyline chart over numeric (x, y) points, linearly scaled to
    the plot area (degenerate ranges pin to the area's center)."""
    if not points:
        raise ValueError("line_chart_svg needs at least one (x, y) point")
    pts = sorted((float(x), float(y)) for x, y in points)
    if not all(math.isfinite(x) and math.isfinite(y) for x, y in pts):
        raise ValueError(
            "line_chart_svg points must be finite; 'nan' is not in the "
            "SVG number grammar — filter NaN/inf upstream"
        )
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    plot_w = width - 2 * margin
    plot_h = height - 2 * margin

    def sx(x: float) -> float:
        return margin + (plot_w / 2 if x1 == x0 else (x - x0) / (x1 - x0) * plot_w)

    def sy(y: float) -> float:
        return height - margin - (
            plot_h / 2 if y1 == y0 else (y - y0) / (y1 - y0) * plot_h
        )

    coords = " ".join(f"{sx(x):.2f},{sy(y):.2f}" for x, y in pts)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
    ]
    if title:
        parts.append(f"<title>{escape(_label_safe(title))}</title>")
    parts.append(
        f'<polyline points="{coords}" fill="none" stroke="steelblue"/>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def parse_svg_bars(svg_text: str) -> list[tuple[str, float, float]]:
    """Recover (key, value, rendered_height_px) from a bar_chart_svg
    document — the round-trip + geometry-audit half."""
    ns = {"svg": "http://www.w3.org/2000/svg"}
    root = ET.fromstring(svg_text)
    out = []
    for rect in root.findall("svg:rect", ns):
        key = rect.get("data-key")
        val = rect.get("data-value")
        if key is None or val is None:
            continue
        out.append((key, float(val), float(rect.get("height", "0"))))
    return out


def gnuplot_script(
    rows: list[tuple[str, float]],
    *,
    title: str = "dbitool chart",
    style: str = "boxes",
    output: str | None = None,
) -> str:
    """Runnable gnuplot script with an inline $data heredoc block.
    Labels are quoted (they plot via xticlabels), values use the
    stable numeric repr shared with the SVG emitter."""
    def gq(s: str) -> str:
        # one quoting rule for every double-quoted gnuplot string
        # (labels, title, output path) — backslashes and quotes would
        # otherwise break the script's syntax
        return _label_safe(s).replace("\\", "\\\\").replace('"', '\\"')

    lines = ["$data << EOD"]
    for label, value in rows:
        lines.append(f'"{gq(label)}" {_fmt_num(value)}')
    lines.append("EOD")
    if output:
        lines.append("set terminal svg")
        lines.append(f'set output "{gq(output)}"')
    lines.append(f'set title "{gq(title)}"')
    lines.append("set style fill solid")
    lines.append(f"plot $data using 2:xticlabels(1) with {style} notitle")
    return "\n".join(lines) + "\n"


def parse_gnuplot_datablock(text: str) -> list[tuple[str, float]]:
    """Parse the $data heredoc back to (label, value) rows."""
    out: list[tuple[str, float]] = []
    in_block = False
    for line in text.splitlines():
        if line.startswith("$data <<"):
            in_block = True
            continue
        if in_block:
            if line.strip() == "EOD":
                break
            label, _, val = line.rpartition(" ")
            label = label.strip()
            if label.startswith('"') and label.endswith('"'):
                label = _re.sub(r"\\(.)", r"\1", label[1:-1])
            out.append((label, float(val)))
    return out


def dot_graph(
    edges: list[tuple[str, str, float]],
    *,
    name: str = "dbitool",
    directed: bool = True,
) -> str:
    """Graphviz DOT document from weighted (src, dst, weight) edges."""
    kind, arrow = ("digraph", "->") if directed else ("graph", "--")

    def q(s: str) -> str:
        s = _label_safe(s)
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'

    lines = [f"{kind} {q(name)} {{"]
    for src, dst, w in edges:
        lines.append(f"  {q(src)} {arrow} {q(dst)} [label={q(_fmt_num(w))}];")
    lines.append("}")
    return "\n".join(lines) + "\n"


def write_chart(text: str, path: str) -> None:
    """Atomic single-file write (shared tmp+rename helper)."""
    _atomic.write_text(path, text)
