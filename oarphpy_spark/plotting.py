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


def _example_li(e) -> str:
    """One example list item: PNG/JPEG bytes render as an inline
    thumbnail (base64 data URI, display clamped to 128x128 — the
    reference's histogram-examples HTML embeds images the same way via
    ``img_to_img_tag``, ``oarphpy/plotting.py:74-94``); everything
    else, including non-image bytes, is escaped text."""
    if isinstance(e, (bytes, bytearray, memoryview)):
        from oarphpy_spark.util.images import image_bytes_to_img_tag

        tag = image_bytes_to_img_tag(e)
        if tag is not None:
            return f"<li>{tag}</li>"
        return f"<li>({len(bytes(e))}-byte blob)</li>"
    return f"<li>{_html.escape(str(e))}</li>"


def render_histogram_interactive_html(
    hist_df: DataFrame,
    title: str = "histogram",
    width_px: int = 640,
    height_px: int = 200,
) -> str:
    """Interactive histogram-with-examples as ONE self-contained HTML
    document — hover shows (bucket, range, count, proportion), click a
    bar fills the context box with that bucket's example keys.

    Parity target: the reference's bokeh layer
    (``oarphpy/plotting.py:305-364``) — quad glyphs with a HoverTool
    (Count / Proportion / Value tooltips) and a TapTool whose CustomJS
    writes ``source.data.display[idx]`` into a Div ("Click on a
    histogram bar to show examples"). Redesign rationale: bokeh is a
    heavyweight optional dependency and its output embeds CDN script
    tags; this renderer emits plain SVG + ~20 lines of inline vanilla
    JS, so the artifact is deterministic (golden-file testable, like
    the reference's PNG-compare test ``oarphpy_test/test_plotting.py:
    74-100``), renders offline, and diffs cleanly in review.

    Only the already-bounded histogram result (num_bins rows) is ever
    collected; the source table stays distributed.
    """
    rows = sorted(hist_df.collect(), key=lambda r: r["bucket"])
    safe_title = _html.escape(title)
    if not rows:
        return f"<div><b>{safe_title}</b> (empty)</div>"
    total = sum(r["count"] for r in rows) or 1
    max_count = max(r["count"] for r in rows) or 1
    bar_w = max(4, width_px // max(len(rows), 1) - 2)
    plot_h = max(40, height_px - 20)
    bars, displays = [], []
    for i, r in enumerate(rows):
        d = r.asDict()
        hgt = max(1, int(plot_h * r["count"] / max_count))
        red, grn, blu = hash_to_rgb(int(r["bucket"]))
        lo = f"{d['lo']:.4g}" if d.get("lo") is not None else "?"
        hi = f"{d['hi']:.4g}" if d.get("hi") is not None else "?"
        prop = f"{r['count'] / total:.4f}"
        tooltip = (
            f"bucket {r['bucket']} [{lo}, {hi}) count={r['count']} "
            f"proportion={prop}"
        )
        bars.append(
            f'<rect class="hb" data-idx="{i}" x="{i * (bar_w + 2)}" '
            f'y="{plot_h - hgt}" width="{bar_w}" height="{hgt}" '
            f'fill="rgb({red},{grn},{blu})" fill-opacity="0.5">'
            f"<title>{_html.escape(tooltip)}</title></rect>"
        )
        examples = d.get("examples")
        ex_html = (
            "".join(_example_li(e) for e in list(examples)[:10])
            if examples
            else "<li>(no examples recorded)</li>"
        )
        displays.append(
            f"<b>bucket {r['bucket']}</b> [{lo}, {hi}) "
            f"count={r['count']} proportion={prop}<ul>{ex_html}</ul>"
        )
    import json as _json

    payload = _json.dumps(displays)
    svg = (
        f'<svg id="hsvg" width="{width_px}" height="{plot_h}" role="img">'
        + "".join(bars)
        + "</svg>"
    )
    script = (
        "<script>(function(){"
        f"var D={payload};"
        'var box=document.getElementById("hctx");'
        'document.querySelectorAll("#hsvg .hb").forEach(function(el){'
        'el.addEventListener("click",function(){'
        "box.innerHTML=D[+el.getAttribute('data-idx')];});"
        'el.addEventListener("mouseenter",function(){'
        'el.setAttribute("fill-opacity","1.0");});'
        'el.addEventListener("mouseleave",function(){'
        'el.setAttribute("fill-opacity","0.5");});'
        "});})();</script>"
    )
    ctxbox = (
        f'<div id="hctx" style="width:{width_px}px">'
        "Click on a histogram bar to show examples.</div>"
    )
    return f"<div><b>{safe_title}</b>{svg}{ctxbox}{script}</div>"


def to_bokeh(
    hist_df: DataFrame, title: str = "histogram", width_px: int = 900
):
    """Reference-parity FIGURE-OBJECT adapter: build the live bokeh
    layout the reference's ``HistogramWithExamplesPlotter.run()``
    returned (``oarphpy/plotting.py:305-365``) from a
    ``df_histogram`` / ``histogram_with_examples`` result, so a user
    composing bokeh dashboards gets the same handle they had — quad
    glyphs over a ``ColumnDataSource`` (count / proportion / left /
    right / display columns), a vline ``HoverTool`` with the
    reference's tooltips, and a ``TapTool`` whose CustomJS writes the
    clicked bucket's ``display`` text into a Div, stacked in a
    ``column`` layout.

    bokeh stays an OPTIONAL dependency: the data plane and the
    dependency-free renderers above never import it; this adapter
    raises ``ImportError`` with guidance when bokeh is absent. Only
    the already-bounded histogram result (num_bins rows) is
    collected."""
    try:
        from bokeh.colors import RGB
        from bokeh.layouts import column
        from bokeh.models import (
            ColumnDataSource,
            CustomJS,
            Div,
            HoverTool,
            TapTool,
        )
        from bokeh.plotting import figure
    except ImportError as ex:
        raise ImportError(
            "to_bokeh requires the optional 'bokeh' package; use "
            "render_histogram_interactive_html for the dependency-free "
            "renderer of the same data"
        ) from ex

    rows = sorted(hist_df.collect(), key=lambda r: r["bucket"])
    total = sum(r["count"] for r in rows) or 1
    data = {
        "count": [r["count"] for r in rows],
        "proportion": [r["count"] / total for r in rows],
        "left": [r.asDict().get("lo", i) for i, r in enumerate(rows)],
        "right": [r.asDict().get("hi", i + 1) for i, r in enumerate(rows)],
        "legend": [title] * len(rows),
        "display": [
            "<b>Bucket: {}</b> <br/>{}".format(
                r["bucket"],
                "<br />".join(
                    str(e) for e in list(r.asDict().get("examples") or [])[:5]
                ),
            )
            for r in rows
        ],
    }
    src = ColumnDataSource(data)
    fig = figure(
        title=title,
        tools="tap,pan,wheel_zoom,box_zoom,reset",
        width=width_px,
        x_axis_label=title,
        y_axis_label="Count",
    )
    quads = fig.quad(
        source=src,
        bottom=0,
        top="count",
        left="left",
        right="right",
        color=RGB(*hash_to_rgb(title)),
        fill_alpha=0.5,
        hover_fill_alpha=1.0,
    )
    fig.add_tools(
        HoverTool(
            renderers=[quads],
            mode="vline",
            tooltips=[
                ("Sub-pivot", "@legend"),
                ("Count", "@count"),
                ("Proportion", "@proportion"),
                (f"Value of {title}", "@left"),
            ],
        )
    )
    ctxbox = Div(
        width=width_px,
        text="Click on a histogram bar to show examples.",
    )
    taptool = fig.select(type=TapTool)
    taptool.callback = CustomJS(
        args=dict(ctxbox=ctxbox),
        # Unlike the reference's callback, guard the empty selection:
        # clicking the plot background would otherwise render the
        # string "undefined" into the context box.
        code="""
        const sel = cb_data.source.selected.indices;
        if (sel.length > 0) {
            ctxbox.text = String(cb_data.source.data.display[sel[0]]);
        }
        """,
    )
    return column(fig, ctxbox)
