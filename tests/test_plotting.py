from __future__ import annotations

from pyspark.sql import Row

from oarphpy_spark.operators.histogram import df_histogram, histogram_with_examples
from oarphpy_spark.plotting import hash_to_rgb, render_histogram_html


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
