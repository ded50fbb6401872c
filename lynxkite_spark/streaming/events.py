"""Event-stream operators.

The reference is a pure batch system — no watermarks, stream windows, or
stateful streaming anywhere (SURVEY.md §1.5); its closest notions are
event-sequence segmentation (SegmentByEventSequence.scala) and interval
bucketing. We provide both the batch equivalents (windowed aggregation,
gap-based sessionization — used by the correctness gate on the ``events``
table) and the Structured Streaming forms of the same plans, so the
engine covers streaming ingestion at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per event type (batch form).
    Returns [window_start, event_type, n_events, sum_value]."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col(type_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (SegmentByEventSequence-style event
    grouping, done the SQL way): a new session starts when the gap to the
    user's previous event exceeds ``gap_minutes``. Session id = running
    count of session starts per user. Returns the events annotated with
    ``session_id`` (per-user, 1-based)."""
    w = W.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_minutes * 60),
        1,
    ).otherwise(0)
    return events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    ).drop("_new")


def streaming_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """The same windowed aggregation as ``windowed_event_counts`` but as a
    Structured Streaming query over a file source: readStream → watermark
    → windowed agg. Caller attaches the sink (writeStream). Late rows
    beyond the watermark are dropped — state stays bounded."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )


def streaming_sessionize(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    gap_minutes: int = 30,
    user_col: str = "user_id",
):
    """Custom STATEFUL streaming operator: per-user gap sessionization
    with ``applyInPandasWithState`` — the streaming twin of
    :func:`sessionize`. Per user the state holds (last event epoch,
    session start epoch, events in session, sessions closed so far);
    each micro-batch folds its events in timestamp order, emitting a row
    per CLOSED session; the open session stays in state across batches
    and is flushed on state timeout.

    Scale shape: state is four longs per user key, partitioned by the
    stream's groupBy — no per-key history is retained, so state size is
    O(active users), not O(events)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            last, start, n, closed = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], closed + 1, start, last, n)],
                columns=["user_id", "session_id", "start_ts", "end_ts", "n_events"],
            )
            return
        ts = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["epoch"])
        ts.sort()
        if state.exists:
            last, start, n, closed = state.get
        else:
            last, start, n, closed = None, None, 0, 0
        out = []
        for t in ts:
            if last is not None and t - last > gap:
                closed += 1
                out.append((key[0], closed, start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            n += 1
            last = t
        state.update((last, start, n, closed))
        state.setTimeoutDuration(gap * 1000)
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "start_ts", "end_ts", "n_events"]
        )

    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withColumn("epoch", F.unix_timestamp("ts"))
    )
    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, session_id long, start_ts long, end_ts long, n_events long"
        ),
        stateStructType="last long, start long, n long, closed long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    key_cols: list[str] | None = None,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
):
    """Streaming twin of functions.dedup.exact_duplicates for a
    continuously-arriving document feed: keep the first occurrence of
    each content key, drop later exact duplicates.

    Spark-first shape: a sha2 content key (32 bytes of state per
    distinct document, never the text) + ``dropDuplicatesWithinWatermark``
    so the dedup state ages out with the watermark instead of growing
    forever — the property that makes this runnable indefinitely on a
    100 TB/day feed.  Caller attaches the sink."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if key_cols is None:
        stream = stream.withColumn(
            "_content_key", F.sha2(F.col(text_col).cast("binary"), 256)
        )
        key_cols = ["_content_key"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
