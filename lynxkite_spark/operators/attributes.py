"""Attribute (column) operators + filter predicate language
(SURVEY.md §2.5; reference files cited per function).

Everything here is a thin, documented wrapper over a Spark SQL
expression — the point is parity of *semantics* with the reference's
attribute operations, with Catalyst doing the execution work.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def add_constant(df: DataFrame, name: str, value) -> DataFrame:
    """AddConstantAttribute.scala."""
    return df.withColumn(name, F.lit(value))


def add_random(df: DataFrame, name: str, seed: int, dist: str = "uniform") -> DataFrame:
    """AddRandomAttribute.scala — seeded uniform/gaussian."""
    gen = F.rand(seed) if dist == "uniform" else F.randn(seed)
    return df.withColumn(name, gen)


def add_ranking(
    df: DataFrame, name: str, key: str, ascending: bool = True, id_col: str = "id"
) -> DataFrame:
    """AddRankingAttribute.scala — rank starting at 0 by a sort key.

    Scale shape: NOT a global window (that is one reducer sorting
    everything). Rows are range-partitioned on (key, id) — a total
    order, so equal keys can't straddle a rank boundary ambiguously —
    ranked per partition, then shifted by the cumulative count of the
    preceding partitions (one tiny driver-side prefix sum over
    partition counts). Every partition sorts in parallel; the output is
    identical to the global row_number for any partitioning."""
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    order = [
        F.col(key).asc() if ascending else F.col(key).desc(),
        F.col(id_col).asc(),
    ]
    parted = df.repartitionByRange(n_part, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.localCheckpoint(eager=True)  # pin partitioning: _pid must
    # agree between the counts pass and the rank pass
    counts = {
        r["_pid"]: r["n"]
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    local = F.row_number().over(W.partitionBy("_pid").orderBy(*order)) - 1
    return (
        parted.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(name, (local + F.coalesce("_off", F.lit(0))).cast("int"))
        .drop("_pid", "_off")
    )


def fallback(df: DataFrame, name: str, primary: str, default: str) -> DataFrame:
    """AttributeFallback.scala — fill missing from another attribute."""
    return df.withColumn(name, F.coalesce(F.col(primary), F.col(default)))


def hash_attribute(df: DataFrame, col: str, salt: str, name: str | None = None) -> DataFrame:
    """HashVertexAttribute.scala:1-4 — salted SHA-256."""
    return df.withColumn(
        name or f"{col}_hashed",
        F.sha2(F.concat(F.lit(salt), F.col(col).cast("string")).cast("binary"), 256),
    )


def convert_to_double(df: DataFrame, col: str) -> DataFrame:
    """Conversions.scala — attr→Double."""
    return df.withColumn(col, F.col(col).cast("double"))


def convert_to_string(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("string"))


def bundle_into_vector(df: DataFrame, cols: list[str], name: str = "vector") -> DataFrame:
    """'Bundle vertex attributes into a Vector'
    (VertexAttributeOperations.scala:387)."""
    return df.withColumn(name, F.array(*[F.col(c).cast("double") for c in cols]))


def one_hot_encode(df: DataFrame, col: str, categories: list[str], name: str | None = None) -> DataFrame:
    """'One-hot encode attribute' (VertexAttributeOperations.scala:431)."""
    return df.withColumn(
        name or f"{col}_onehot",
        F.array(*[F.when(F.col(col) == c, 1.0).otherwise(0.0) for c in categories]),
    )


def correlate(df: DataFrame, a: str, b: str) -> float:
    """CorrelateAttributes.scala — Pearson correlation (defined-for-both rows)."""
    return df.where(F.col(a).isNotNull() & F.col(b).isNotNull()).agg(F.corr(a, b)).first()[0]


# ---------------------------------------------------------------- filters

_INTERVAL = re.compile(r"^([\[\(])\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*([\]\)])$")
_CMP = re.compile(r"^(<=|>=|<>|<|>|==|=)\s*(.+)$")


def parse_filter(col: Column, spec: str) -> Column:
    """The reference's UI filter predicate language
    (/root/reference/app/.../controllers/FEFilters.scala:154-247 and
    graph_operations/AttributeFilters.scala:67-160):

      ``*`` match-all · ``!expr`` negation · ``a,b,c`` one-of ·
      ``>x <=x`` comparisons · ``[a,b] (a,b)`` intervals ·
      ``regex(pat)`` regular expression match.
    """
    spec = spec.strip()
    if spec == "*":
        return col.isNotNull()
    if spec.startswith("!"):
        return ~parse_filter(col, spec[1:])
    if spec.startswith("regex(") and spec.endswith(")"):
        return col.rlike(spec[6:-1])
    m = _INTERVAL.match(spec)
    if m:
        lo_open, lo, hi, hi_open = m.groups()
        lo_c = col > float(lo) if lo_open == "(" else col >= float(lo)
        hi_c = col < float(hi) if hi_open == ")" else col <= float(hi)
        return lo_c & hi_c
    m = _CMP.match(spec)
    if m:
        op, val = m.groups()
        v = _coerce(val)
        return {
            "<": col < v, "<=": col <= v, ">": col > v, ">=": col >= v,
            "=": col == v, "==": col == v, "<>": col != v,
        }[op]
    if "," in spec:
        return col.isin([_coerce(x.strip()) for x in spec.split(",")])
    return col == _coerce(spec)


def _coerce(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def filter_vertices(df: DataFrame, **specs: str) -> DataFrame:
    """VertexAttributeFilter (AttributeFilters.scala:11-65): AND of
    per-attribute specs; rows where the attribute is NULL never match
    (reference models missing values as absent keys)."""
    out = df
    for colname, spec in specs.items():
        out = out.where(parse_filter(F.col(colname), spec))
    return out


def filter_by_table(df: DataFrame, keys: DataFrame, on: str = "id", keep: bool = True) -> DataFrame:
    """FilterByTable.scala — semi/anti join filter."""
    return df.join(keys, on, "left_semi" if keep else "left_anti")


def derive(
    df: DataFrame,
    name: str,
    expr: str,
    only_on_defined: bool = True,
    inputs: list[str] | None = None,
) -> DataFrame:
    """DeriveScala.scala analog: derive a new attribute from a SQL
    expression over existing attributes — the expression compiles into
    whole-stage codegen, the direct equivalent of the reference
    compiling Scala against typed attributes.

    ``only_on_defined`` mirrors DeriveScala.scala:37-44: when True the
    result is null (undefined) wherever any referenced input is null;
    ``inputs`` lists the referenced columns (defaults to every column
    mentioned in the expression that exists on the DataFrame)."""
    col = F.expr(expr)
    if only_on_defined:
        import re as _re

        deps = inputs
        if deps is None:
            tokens = set(_re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr))
            deps = [c for c in df.columns if c in tokens]
        if deps:
            defined = F.lit(True)
            for d in deps:
                defined = defined & F.col(d).isNotNull()
            col = F.when(defined, col)
    return df.withColumn(name, col)


def derive_python(
    df: DataFrame,
    name: str,
    fn,
    input_cols: list[str],
    return_type: str = "double",
    only_on_defined: bool = True,
) -> DataFrame:
    """DerivePython analog (the reference ships rows to a Python
    subprocess via Sphynx; here the function is an Arrow-vectorized
    pandas UDF over typed Series — batched, never per-row)."""
    udf = F.pandas_udf(fn, return_type)
    col = udf(*[F.col(c) for c in input_cols])
    if only_on_defined and input_cols:
        defined = F.lit(True)
        for d in input_cols:
            defined = defined & F.col(d).isNotNull()
        col = F.when(defined, col)
    return df.withColumn(name, col)


def partition_attribute(
    df: DataFrame, attr: str, role: str = "role"
) -> tuple[DataFrame, DataFrame]:
    """PartitionAttribute.scala:23-40 — split one attribute into (test,
    train) by a string role attribute: each side carries ``attr`` only
    where its role matches (elsewhere the attribute is undefined, i.e.
    the row is absent, matching the reference's partial attributes).
    Returns (test_df, train_df), both DataFrame[id, attr] — two filtered
    projections, no shuffle, filters pushed to the scan."""
    base = df.where(F.col(attr).isNotNull() & F.col(role).isNotNull())
    test = base.where(F.col(role) == "test").select("id", attr)
    train = base.where(F.col(role) == "train").select("id", attr)
    return test, train


def derive_table_python(
    df: DataFrame,
    fn,
    output_schema: str,
    input_cols: list[str] | None = None,
) -> DataFrame:
    """DeriveTablePython.scala analog: arbitrary user Python producing a
    whole new table from an input table.  The reference ships the table
    to a Python subprocess on Sphynx (single-node pandas) and pins the
    output schema from declared outputFields; here ``fn`` is
    ``pandas.DataFrame -> pandas.DataFrame`` applied per Arrow batch via
    ``mapInPandas`` — the user code runs on every executor in parallel,
    and ``output_schema`` (a DDL string, e.g. ``"id long, score
    double"``) is the declared-fields contract.

    Per-batch semantics are the scale contract: ``fn`` sees a bounded
    batch, never the whole table, so driver memory is never the limit
    (the reference's single-process pandas IS limited this way).  Row
    counts may change (filter/explode-style derivations are fine).
    ``input_cols`` prunes the scan to the named columns first —
    keep it tight so column pruning reaches the parquet reader."""

    def run(batches):
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    src = df.select(*input_cols) if input_cols else df
    return src.mapInPandas(run, schema=output_schema)


def derive_table_from_graph_python(
    graph,
    fn,
    output_schema: str,
) -> DataFrame:
    """DeriveTableFromGraphPython.scala analog: user Python over a
    graph's vertices producing a table.  The reference hands the whole
    graph to one Python process; at Spark scale only the vertex side
    streams through ``fn`` per batch.  The edge table is NOT visible
    inside ``fn`` (a DataFrame captured in a mapInPandas closure cannot
    be used on an executor) — for edge-dependent derivations aggregate
    edges onto vertex columns first (operators.aggregate) or compose
    the DataFrame API directly.  ``fn`` is ``(vertices_batch:
    pandas.DataFrame) -> pandas.DataFrame``."""
    return derive_table_python(graph.vertices, fn, output_schema)


def create_graph_in_python(spark, fn, vertex_schema: str, edge_schema: str):
    """CreateGraphInPython.scala analog: user Python code builds a graph
    from nothing (the reference runs ``code`` in a Python process and
    reads back vs/es/attrs; here ``fn`` returns two pandas DataFrames).
    ``fn() -> (vertices_pdf, edges_pdf)``; edges must have src/dst.
    Driver-side by design — this is a constructor for small/synthetic
    graphs (the reference's use case), not a distributed op; for
    distributed generation use operators.generators."""
    from ..graph import Graph

    v_pdf, e_pdf = fn()
    v = spark.createDataFrame(v_pdf, schema=vertex_schema)
    e = spark.createDataFrame(e_pdf, schema=edge_schema)
    assert "src" in e.columns and "dst" in e.columns, "edges need src/dst"
    return Graph(vertices=v, edges=e)
