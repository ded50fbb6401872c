"""CreatePlot / DeriveHTMLPython analogs (lynxkite_spark/plot.py)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from lynxkite_spark.plot import (
    create_plot,
    derive_html,
    histogram_plot,
    plot_to_json,
)


def test_create_plot_vega_lite_spec(spark):
    df = spark.range(100).select(
        F.col("id").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )
    spec = create_plot(df, mark="point", x="x", y="y", color="grp")
    assert spec["mark"] == "point"
    assert spec["encoding"]["x"]["type"] == "quantitative"
    assert spec["encoding"]["color"]["type"] == "nominal"
    assert len(spec["data"]["values"]) == 100
    assert spec["truncated"] is False
    json.loads(plot_to_json(spec))  # serializable

    capped = create_plot(df, x="x", y="y", limit=10)
    assert len(capped["data"]["values"]) == 10 and capped["truncated"] is True


def test_histogram_plot_bins_spark_side(spark):
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    spec = histogram_plot(df, "v", bins=10)
    vals = spec["data"]["values"]
    assert len(vals) == 10
    assert sum(v["count"] for v in vals) == 1000
    assert all(v["count"] == 100 for v in vals)  # uniform data, even bins

    # degenerate: constant column
    const = spark.range(5).select(F.lit(3.0).alias("v"))
    s2 = histogram_plot(const, "v")
    assert s2["data"]["values"][0]["count"] == 5


def test_derive_html(spark):
    df = spark.range(3).select(F.col("id"))
    html = derive_html(df, lambda pdf: f"<b>{int(pdf['id'].sum())}</b>")
    assert html == "<b>3</b>"


def test_histogram_plot_step_and_nulls(spark):
    """r4 review: bin step must equal the bin WIDTH (not the first
    bin's end), and the degenerate single-bin branch must count only
    non-null rows like the normal branch does."""
    df = spark.range(1000).select(
        (F.col("id") % 20 * 5 + 100).cast("double").alias("v"))
    spec = histogram_plot(df, "v", bins=20)
    step = spec["encoding"]["x"]["bin"]["step"]
    v0 = spec["data"]["values"][0]
    assert step == pytest.approx(v0["bin_end"] - v0["bin_start"])
    assert step == pytest.approx((195.0 - 100.0) / 20)

    const = spark.createDataFrame(
        [(3.0,), (3.0,), (None,)], "v double")
    s2 = histogram_plot(const, "v")
    assert s2["data"]["values"][0]["count"] == 2  # nulls excluded
    assert "step" not in s2["encoding"]["x"]["bin"]  # no width defined


def test_create_plot_decimal_is_quantitative(spark):
    df = spark.range(5).select(
        F.col("id").cast("decimal(10,2)").alias("price"))
    spec = create_plot(df, x="price")
    assert spec["encoding"]["x"]["type"] == "quantitative"
