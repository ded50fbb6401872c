"""Attribute operators, filter language, aggregations (SURVEY.md §2.5-2.6)."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.graph import example_graph
from lynxkite_spark.operators.aggregate import (
    aggregate_from_edges,
    aggregate_on_neighbors,
    aggregate_to_segmentation,
    global_aggregate,
    histogram,
)
from lynxkite_spark.operators.attributes import (
    add_constant,
    add_ranking,
    bundle_into_vector,
    correlate,
    fallback,
    filter_by_table,
    filter_vertices,
    hash_attribute,
    one_hot_encode,
)


def test_filter_language(spark):
    g = example_graph(spark)
    v = g.vertices
    assert filter_vertices(v, age=">20").count() == 2  # 20.3, 50.3
    assert filter_vertices(v, age="[18,21)").count() == 2  # 18.2, 20.3
    assert filter_vertices(v, gender="Male").count() == 3
    assert filter_vertices(v, name="regex(^A)").count() == 1
    assert filter_vertices(v, gender="!Male").count() == 1
    assert filter_vertices(v, income="*").count() == 2  # defined values only
    assert filter_vertices(v, age="<=2").count() == 1
    assert filter_vertices(v, age=">20", gender="Male").count() == 2  # AND


def test_filter_by_table(spark):
    g = example_graph(spark)
    keys = spark.createDataFrame([(0,), (3,)], "id long")
    assert filter_by_table(g.vertices, keys).count() == 2
    assert filter_by_table(g.vertices, keys, keep=False).count() == 2


def test_aggregate_on_neighbors(spark):
    """'Aggregate on neighbors' on the example graph
    (AttributePropagationOperations.scala:17-155): average in-neighbor age."""
    g = example_graph(spark)
    got = {r["id"]: r["avg_age"] for r in aggregate_on_neighbors(g, "age", "avg", "in").collect()}
    # in-nbrs: 0←{1,2}, 1←{0,2}: avg(18.2,50.3)=34.25, avg(20.3,50.3)=35.3
    assert got[0] == pytest.approx(34.25)
    assert got[1] == pytest.approx(35.3)
    assert 2 not in got and 3 not in got  # partial attribute, like the reference


def test_aggregate_weighted_and_from_edges(spark):
    g = example_graph(spark)
    got = {
        r["id"]: r["wavg"]
        for r in aggregate_on_neighbors(
            g, "age", "weighted_average", "in", weight_attr="age", alias="wavg"
        ).collect()
    }
    # weight = neighbor's own age here (weights live on the value vertex)
    assert got[0] == pytest.approx((18.2 * 18.2 + 50.3 * 50.3) / (18.2 + 50.3), rel=1e-9)

    sums = {r["id"]: r["sum_weight"] for r in aggregate_from_edges(g, "weight", "sum", "dst").collect()}
    assert sums == {0: pytest.approx(5.0), 1: pytest.approx(5.0)}


def test_aggregate_to_segmentation_and_global(spark):
    g = example_graph(spark)
    bt = spark.createDataFrame([(0, 0), (1, 0), (2, 0), (3, 3)], "id long, segment long")
    got = {r["segment"]: r["avg_age"] for r in aggregate_to_segmentation(bt, g.vertices, "age", "avg").collect()}
    assert got[0] == pytest.approx((20.3 + 18.2 + 50.3) / 3)
    assert got[3] == pytest.approx(2.0)
    assert global_aggregate(g.vertices, "income", "sum") == pytest.approx(3000.0)
    assert global_aggregate(g.vertices, "age", "count") == 4


def test_histogram(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    h = histogram(df, "x", buckets=10).collect()
    assert len(h) == 10
    assert all(r["count"] == 10 for r in h)


def test_attribute_helpers(spark):
    g = example_graph(spark)
    v = add_constant(g.vertices, "k", 7)
    assert v.select("k").distinct().first()["k"] == 7
    r = add_ranking(g.vertices, "age_rank", "age")
    got = {x["id"]: x["age_rank"] for x in r.collect()}
    assert got == {3: 0, 1: 1, 0: 2, 2: 3}
    fb = fallback(g.vertices, "income2", "income", "age")
    assert {x["id"]: x["income2"] for x in fb.collect()}[1] == pytest.approx(18.2)
    h1 = hash_attribute(g.vertices, "name", salt="s1").select("name_hashed").collect()
    h2 = hash_attribute(g.vertices, "name", salt="s2").select("name_hashed").collect()
    assert {r[0] for r in h1} != {r[0] for r in h2}  # salted
    vec = bundle_into_vector(g.vertices, ["age", "income"]).first()["vector"]
    assert len(vec) == 2
    oh = one_hot_encode(g.vertices, "gender", ["Male", "Female"]).collect()
    assert all(sum(r["gender_onehot"]) == 1.0 for r in oh)
    assert correlate(g.vertices, "age", "income") == pytest.approx(1.0)


def test_majority_matches_counter_twin(spark):
    """Property check of the run-length mode: 300 random groups vs a
    Counter-based twin — smallest-value tie-break, NULL skipping, and
    the fraction gate at 0.0/0.5/1.0 all agree."""
    import random
    from collections import Counter, defaultdict

    from lynxkite_spark.operators.aggregate import AGGREGATORS, majority

    random.seed(7)
    rows = []
    for g in range(300):
        k = random.randint(0, 6)
        for _ in range(k):
            rows.append((g, random.choice(["a", "b", "c", "aa", ""])))
        if k == 0:
            rows.append((g, None))
    df = spark.createDataFrame(rows, "g int, v string")
    out = {
        r["g"]: (r["m50"], r["m100"], r["m0"])
        for r in df.groupBy("g")
        .agg(
            AGGREGATORS["majority_50"](F.col("v"), F.lit(1.0)).alias("m50"),
            AGGREGATORS["majority_100"](F.col("v"), F.lit(1.0)).alias("m100"),
            majority(0.0)(F.col("v"), F.lit(1.0)).alias("m0"),
        )
        .collect()
    }

    def twin(vals, frac):
        vals = [v for v in vals if v is not None]
        if not vals:
            return ""
        c = Counter(vals)
        m = max(c.values())
        winner = min(v for v in c if c[v] == m)
        return winner if m >= frac * len(vals) else ""

    byg = defaultdict(list)
    for g, v in rows:
        byg[g].append(v)
    for g, vals in byg.items():
        assert out[g] == (twin(vals, 0.5), twin(vals, 1.0), twin(vals, 0.0)), g


def test_aggregator_catalog_tail(spark):
    """Majority(frac), Concatenate, Elementwise* (Aggregate.scala:395-498)."""
    from lynxkite_spark.operators.aggregate import AGGREGATORS, majority
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "x"), (2, "y")], "g long, v string"
    )
    out = df.groupBy("g").agg(
        AGGREGATORS["majority_50"](F.col("v"), F.lit(1.0)).alias("m50"),
        AGGREGATORS["majority_100"](F.col("v"), F.lit(1.0)).alias("m100"),
        majority(0.4)(F.col("v"), F.lit(1.0)).alias("m40"),
    )
    got = {r["g"]: (r["m50"], r["m100"], r["m40"]) for r in out.collect()}
    # g=1: mode a (2/3 >= .5 -> a; < 1.0 -> ""); g=2 ties x,y (1/2 each):
    # deterministic smallest wins at 0.5 and 0.4, "" at 1.0
    assert got == {1: ("a", "", "a"), 2: ("x", "", "x")}

    vec = spark.createDataFrame(
        [(1, [1.0, 10.0]), (1, [3.0, 20.0]), (2, [5.0, 5.0])],
        "g long, v array<double>",
    )
    out = vec.groupBy("g").agg(
        AGGREGATORS["elementwise_sum"](F.col("v"), F.lit(1.0)).alias("s"),
        AGGREGATORS["elementwise_avg"](F.col("v"), F.lit(1.0)).alias("a"),
        AGGREGATORS["elementwise_min"](F.col("v"), F.lit(1.0)).alias("lo"),
        AGGREGATORS["elementwise_max"](F.col("v"), F.lit(1.0)).alias("hi"),
        AGGREGATORS["concatenate"](F.col("v"), F.lit(1.0)).alias("cat"),
    )
    got = {r["g"]: r for r in out.collect()}
    assert got[1]["s"] == [4.0, 30.0]
    assert got[1]["a"] == [2.0, 15.0]
    assert got[1]["lo"] == [1.0, 10.0]
    assert got[1]["hi"] == [3.0, 20.0]
    assert sorted(got[1]["cat"]) == [1.0, 3.0, 10.0, 20.0]
    assert got[2]["s"] == [5.0, 5.0] == got[2]["a"] == got[2]["lo"] == got[2]["hi"]


def test_derive_expression_and_python(spark):
    """DeriveScala/DerivePython analogs: SQL-expression and pandas-UDF
    derives with the reference's only-on-defined null semantics."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lynxkite_spark.operators.attributes import derive, derive_python

    df = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, None, 5.0), (3, 4.0, None)],
        "id long, a double, b double",
    )
    out = {r["id"]: r["s"] for r in derive(df, "s", "a + b").collect()}
    assert out == {1: 5.0, 2: None, 3: None}  # undefined inputs -> undefined
    out2 = {r["id"]: r["s"] for r in derive(df, "s", "coalesce(a, 0) + b", only_on_defined=False).collect()}
    assert out2[2] == 5.0

    def hyp(a: pd.Series, b: pd.Series) -> pd.Series:
        return (a**2 + b**2) ** 0.5

    out3 = {
        r["id"]: r["h"]
        for r in derive_python(df, "h", hyp, ["a", "b"]).collect()
    }
    assert abs(out3[1] - (4 + 9) ** 0.5) < 1e-12
    assert out3[2] is None and out3[3] is None
    plan = derive_python(df, "h", hyp, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython


def test_derive_table_python(spark):
    """DeriveTablePython analog: whole-table user Python via
    mapInPandas — schema pinned by the declared DDL, row counts may
    shrink (filter) or grow (explode), and the exchange is Arrow
    (MapInPandas node), never row-at-a-time Python."""
    import pandas as pd

    from lynxkite_spark.operators.attributes import derive_table_python

    df = spark.createDataFrame(
        [(i, f"word {'x ' * i}") for i in range(10)],
        "id long, text string",
    )

    def filt(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["text"].str.strip().str.split(r"\s+", regex=True).str.len()
        out = pd.DataFrame({"id": pdf["id"], "n": n.astype("int64")})
        return out[out["n"] >= 5]

    got = {r["id"]: r["n"] for r in
           derive_table_python(df, filt, "id long, n long",
                               input_cols=["id", "text"]).collect()}
    assert got == {i: i + 1 for i in range(4, 10)}

    # row-growing derivation (explode-style)
    def dup(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([pdf[["id"]], pdf[["id"]]])

    assert derive_table_python(df, dup, "id long").count() == 20

    out = derive_table_python(df, filt, "id long, n long", input_cols=["id", "text"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_create_graph_in_python(spark):
    import pandas as pd

    from lynxkite_spark.operators.attributes import create_graph_in_python
    from lynxkite_spark.operators.degrees import degree

    def build():
        v = pd.DataFrame({"id": [0, 1, 2], "name": ["a", "b", "c"]})
        e = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})
        return v, e

    g = create_graph_in_python(
        spark, build, "id long, name string", "src long, dst long")
    assert g.vertices.count() == 3 and g.edges.count() == 3
    degs = {r["id"]: r["degree"] for r in degree(g, direction="out").collect()}
    assert degs == {0: 1, 1: 1, 2: 1}
