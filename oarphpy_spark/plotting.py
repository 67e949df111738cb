"""Rendering layer for the histogram operators.

The reference rendered histogram-with-examples through bokeh
(reference ``oarphpy/plotting.py:128-365``, golden-PNG-tested). Here
the data plane (operators.histogram — oracle-checked DataFrames) stays
separate from rendering, and the renderer is dependency-free HTML/SVG:
deterministic output, no native libs, diffable in tests.

Only the rendering layer collects — and it collects the already-
bounded histogram result (num_bins rows), never the source table.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame

from oarphpy_spark.util.misc import stable_hash


def hash_to_rgb(x) -> tuple[int, int, int]:
    """Stable value -> color (reference ``oarphpy/plotting.py:20-35``)."""
    h = stable_hash(x)
    return (64 + h % 128, 64 + (h >> 8) % 128, 64 + (h >> 16) % 128)


def render_histogram_html(
    hist_df: DataFrame, title: str = "histogram", width_px: int = 640
) -> str:
    """Render a ``df_histogram`` / ``histogram_with_examples`` result as
    a self-contained HTML snippet (SVG bars + a table of buckets and
    any example keys)."""
    rows = sorted(hist_df.collect(), key=lambda r: r["bucket"])
    if not rows:
        return f"<div><b>{_html.escape(title)}</b> (empty)</div>"
    max_count = max(r["count"] for r in rows) or 1
    bar_w = max(4, width_px // max(len(rows), 1) - 2)
    bars, cells = [], []
    for i, r in enumerate(rows):
        hgt = int(100 * r["count"] / max_count)
        red, grn, blu = hash_to_rgb(int(r["bucket"]))
        bars.append(
            f'<rect x="{i * (bar_w + 2)}" y="{100 - hgt}" width="{bar_w}" '
            f'height="{hgt}" fill="rgb({red},{grn},{blu})">'
            f"<title>bucket {r['bucket']}: {r['count']}</title></rect>"
        )
        example_txt = ""
        if "examples" in r.asDict() and r["examples"] is not None:
            example_txt = _html.escape(
                ", ".join(str(e) for e in list(r["examples"])[:5])
            )
        lo = f"{r['lo']:.4g}" if "lo" in r.asDict() else ""
        hi = f"{r['hi']:.4g}" if "hi" in r.asDict() else ""
        cells.append(
            f"<tr><td>{r['bucket']}</td><td>{lo}</td><td>{hi}</td>"
            f"<td>{r['count']}</td><td>{example_txt}</td></tr>"
        )
    svg = (
        f'<svg width="{width_px}" height="100" role="img">' + "".join(bars) + "</svg>"
    )
    table = (
        "<table><tr><th>bucket</th><th>lo</th><th>hi</th><th>count</th>"
        "<th>examples</th></tr>" + "".join(cells) + "</table>"
    )
    return f"<div><b>{_html.escape(title)}</b>{svg}{table}</div>"
