"""Visualization outputs — CreatePlot.scala / DeriveHTMLPython.scala
re-expressed for a headless engine: the deliverable is a JSON/HTML
artifact built from a BOUNDED sample of a DataFrame, never a rendering
pipeline (the reference compiles a Vegas DSL to Vega-Lite JSON and ships
it to the frontend; DeriveHTMLPython returns an HTML string computed by
user Python).

Scale contract: plots are driver-side BY DESIGN — a plot of more than
``limit`` points is a smear, so the collect is capped and the cap is
explicit in the artifact (`truncated` flag).  All heavy reduction
(aggregation, binning) should happen in the DataFrame BEFORE plotting;
``histogram_plot`` shows the pattern (the aggregation is Spark-side, only
the bin table is collected).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def create_plot(
    df: DataFrame,
    mark: str = "point",
    x: str | None = None,
    y: str | None = None,
    color: str | None = None,
    limit: int = 10_000,
) -> dict:
    """CreatePlot.scala analog: a Vega-Lite v5 spec with inline data
    from a deterministic bounded sample of ``df`` (sort on the encoded
    columns → TakeOrdered, no full sort).  Returns the spec as a dict;
    ``json.dumps`` it for the artifact."""
    cols = [c for c in (x, y, color) if c]
    if not cols:
        cols = df.columns[:2]
        x = x or cols[0]
        y = y or (cols[1] if len(cols) > 1 else None)
    sample = df.select(*dict.fromkeys(cols)).sort(*dict.fromkeys(cols))
    rows = sample.limit(limit + 1).collect()
    truncated = len(rows) > limit
    rows = rows[:limit]

    def enc_type(col: str) -> str:
        dt = dict(df.dtypes)[col]
        if dt in ("double", "float", "int", "bigint", "smallint",
                  "tinyint") or dt.startswith("decimal"):
            return "quantitative"
        if dt in ("date", "timestamp"):
            return "temporal"
        return "nominal"

    encoding = {}
    if x:
        encoding["x"] = {"field": x, "type": enc_type(x)}
    if y:
        encoding["y"] = {"field": y, "type": enc_type(y)}
    if color:
        encoding["color"] = {"field": color, "type": enc_type(color)}
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "data": {"values": [r.asDict(recursive=True) for r in rows]},
        "mark": mark,
        "encoding": encoding,
        "truncated": truncated,
    }


def histogram_plot(df: DataFrame, col: str, bins: int = 20) -> dict:
    """The scale-correct plot pattern: binning is a Spark aggregation
    (map-side combinable), only ``bins`` rows reach the driver."""
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is None or hi is None or hi == lo:
        width = 0.0
        count = df.where(F.col(col).isNotNull()).count()
        values = [{"bin_start": lo, "bin_end": hi, "count": count}]
    else:
        width = (hi - lo) / bins
        binned = (
            df.where(F.col(col).isNotNull())
            .select(
                F.least(
                    F.floor((F.col(col) - F.lit(lo)) / F.lit(width)),
                    F.lit(bins - 1),
                ).cast("long").alias("_bin")
            )
            .groupBy("_bin")
            .count()
            .collect()
        )
        by_bin = {r["_bin"]: r["count"] for r in binned}
        values = [
            {"bin_start": lo + i * width, "bin_end": lo + (i + 1) * width,
             "count": by_bin.get(i, 0)}
            for i in range(bins)
        ]
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "x": {"field": "bin_start", "type": "quantitative",
                  "bin": {"binned": True, "step": width} if width
                  else {"binned": True}},
            "x2": {"field": "bin_end"},
            "y": {"field": "count", "type": "quantitative"},
        },
    }


def derive_html(df: DataFrame, fn, limit: int = 10_000) -> str:
    """DeriveHTMLPython.scala analog: user Python turns a bounded
    pandas sample into an HTML string (the reference runs the code in a
    Python subprocess and stores the HTML as a scalar)."""
    pdf = df.limit(limit).toPandas()
    out = fn(pdf)
    if not isinstance(out, str):
        raise TypeError(f"derive_html fn must return str, got {type(out)}")
    return out


def plot_to_json(spec: dict) -> str:
    return json.dumps(spec, sort_keys=True, default=str)
