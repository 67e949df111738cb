from __future__ import annotations

from pyspark.sql import Row

import pathlib

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
