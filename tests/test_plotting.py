from __future__ import annotations

from pyspark.sql import Row

import pathlib

import pytest

from oarphpy_spark.operators.histogram import df_histogram, histogram_with_examples
from oarphpy_spark.plotting import (
    hash_to_rgb,
    render_histogram_html,
    render_histogram_interactive_html,
)

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def test_hash_to_rgb_stable_and_bounded():
    c1, c2 = hash_to_rgb("a"), hash_to_rgb("a")
    assert c1 == c2
    assert all(64 <= v < 192 for v in c1)
    assert hash_to_rgb("a") != hash_to_rgb("b")


def test_render_histogram_html(spark):
    df = spark.createDataFrame([Row(a=i) for i in range(101)])
    html = render_histogram_html(df_histogram(df, "a", 4), title="a-hist")
    assert "<svg" in html and "<table>" in html
    assert html.count("<rect") == 4
    assert "a-hist" in html
    # deterministic output
    assert html == render_histogram_html(df_histogram(df, "a", 4), title="a-hist")


def test_render_with_examples(spark):
    df = spark.createDataFrame([Row(a=i, k=i * 10) for i in range(50)])
    h = histogram_with_examples(df, "a", [0.0, 25.0, 50.0], example_cols=["k"], n_examples=3)
    html = render_histogram_html(h, title="ex")
    assert html.count("<rect") == 2
    assert "Row(" in html or "," in html  # example cells populated


def _interactive_fixture(spark):
    df = spark.createDataFrame([Row(a=i, k=i * 10) for i in range(50)])
    h = histogram_with_examples(
        df, "a", [0.0, 25.0, 50.0], example_cols=["k"], n_examples=3
    )
    return render_histogram_interactive_html(h, title="iex", width_px=320)


def test_render_interactive_structure(spark):
    html = _interactive_fixture(spark)
    # hover: per-bar tooltip + JS opacity handlers; tap: context box fill
    assert html.count('<rect class="hb"') == 2
    assert "mouseenter" in html and "addEventListener" in html
    assert 'id="hctx"' in html and "Click on a histogram bar" in html
    assert "proportion=" in html
    # examples payload rides inside the document (tap-to-show data)
    assert "<li>" in html


def test_render_interactive_golden(spark):
    """Golden-file compare — the same artifact-regression strategy as
    the reference's PNG-compare test (oarphpy_test/test_plotting.py:
    74-100), on a deterministic HTML artifact instead of pixels.

    A MISSING golden is a hard failure (a silently regenerated golden
    would make the test vacuously pass). After an intentional renderer
    change, regenerate with::

        OARPHPY_SPARK_REGEN_GOLDENS=1 python -m pytest \
            tests/test_plotting.py::test_render_interactive_golden
    """
    import os

    html = _interactive_fixture(spark)
    golden = GOLDEN_DIR / "hist_interactive_golden.html"
    if os.environ.get("OARPHPY_SPARK_REGEN_GOLDENS") == "1":
        GOLDEN_DIR.mkdir(exist_ok=True)
        golden.write_text(html)
    assert golden.exists(), (
        f"golden file missing: {golden} — regenerate with "
        "OARPHPY_SPARK_REGEN_GOLDENS=1 pytest tests/test_plotting.py"
    )
    assert html == golden.read_text()


def test_to_bokeh_layout_parity(spark):
    """Skipped-unless-bokeh: the figure-object adapter must return the
    reference's layout shape (column of [figure, Div], quad glyphs
    over a source carrying count/proportion/left/right/display, tap
    callback wired to the Div) — reference plotting.py:305-365."""
    bokeh = pytest.importorskip("bokeh")  # noqa: F841 — optional dep
    from bokeh.models import Div
    from bokeh.plotting import figure as _Figure  # noqa: N813

    from oarphpy_spark.operators.histogram import df_histogram
    from oarphpy_spark.plotting import to_bokeh

    df = spark.range(100).selectExpr("cast(id as double) AS x")
    layout = to_bokeh(df_histogram(df, "x", 10), title="x")
    fig, ctxbox = layout.children
    assert isinstance(ctxbox, Div)
    quads = [
        r for r in fig.renderers
        if type(r.glyph).__name__ == "Quad"
    ]
    assert quads, fig.renderers
    data = quads[0].data_source.data
    assert len(data["count"]) == 10
    assert abs(sum(data["proportion"]) - 1.0) < 1e-9
    assert all(k in data for k in ("left", "right", "display", "legend"))


def test_to_bokeh_import_error_without_bokeh(spark, monkeypatch):
    """Without bokeh the adapter raises a guided ImportError and the
    dependency-free renderers stay importable/usable."""
    import builtins
    import sys

    if "bokeh" in sys.modules:
        pytest.skip("bokeh installed; the guided-error path is moot")
    from oarphpy_spark.operators.histogram import df_histogram
    from oarphpy_spark.plotting import to_bokeh

    real_import = builtins.__import__

    def no_bokeh(name, *a, **k):
        if name.startswith("bokeh"):
            raise ImportError(f"No module named {name!r}")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_bokeh)
    df = spark.range(10).selectExpr("cast(id as double) AS x")
    with pytest.raises(ImportError, match="render_histogram_interactive"):
        to_bokeh(df_histogram(df, "x", 5))
