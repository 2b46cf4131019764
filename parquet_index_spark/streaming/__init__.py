"""Structured Streaming operators over the events stream.

The reference has no streaming at all (SURVEY §2B flags this as an
extension). These helpers express the engine's event-time semantics as
standard Structured Streaming plans: file-source readStream, watermarked
tumbling/session windows, and an availableNow batch-parity mode used by the
tests (stream results must equal the batch computation on the same data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),        # nanoseconds (nanosAsLong)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _with_event_time(df: DataFrame) -> DataFrame:
    """ns-long -> TimestampType event_time (µs precision).

    Integer division: `/ 1000` is double division whose rounding drifts one
    microsecond from the truncation parquet readers apply to ns values."""
    return df.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000")))


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 10) -> DataFrame:
    import os
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if os.path.isfile(path):
        # the file-stream source only accepts directories; narrow the parent
        # dir to just this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return _with_event_time(reader.parquet(path))


def windowed_event_counts(events: DataFrame, window_duration: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type — the canonical
    late-data-tolerant streaming aggregation."""
    return (events.withWatermark("event_time", watermark)
            .groupBy(F.window("event_time", window_duration).alias("win"),
                     F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time session windows per user (session_window gap semantics —
    the streaming analog of workload.sessionize_events)."""
    return (events.withWatermark("event_time", watermark)
            .groupBy(F.session_window("event_time", gap).alias("sess"),
                     F.col("user_id"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    "n_events"))


def dedup_stream(events: DataFrame, keys: list,
                 watermark: str = None) -> DataFrame:
    """Streaming exact dedup: emit each distinct key combination once, at
    first arrival. Projects down to the keys BEFORE deduplicating so the
    dedup state holds only keys (at 100 TB the state store carries a few
    bytes per distinct key, not whole events).

    With a watermark, uses dropDuplicatesWithinWatermark — state for a key
    is dropped once the watermark passes it, the unbounded-state-safe mode
    for endless streams; duplicates arriving later than the watermark
    re-emit. Without one, classic dropDuplicates keeps all keys forever
    (exact global dedup, bounded-input runs only)."""
    if watermark is not None:
        keyed = (events.withWatermark("event_time", watermark)
                 .select(*keys, "event_time")
                 .dropDuplicatesWithinWatermark(keys))
    else:
        keyed = events.select(*keys).dropDuplicates(keys)
    return keyed.select(*keys)


def event_funnel_join(events: DataFrame, from_type: str, to_type: str,
                      max_delay: str = "30 minutes",
                      watermark: str = "2 hours",
                      how: str = "inner") -> DataFrame:
    """Stream-stream interval join: for each ``from_type`` event, the
    ``to_type`` events by the same user within ``max_delay`` afterwards —
    the funnel/attribution primitive (click -> purchase).

    Both sides carry watermarks and the join condition bounds event time on
    both ends, so Spark can expire join state: a from-event's state lives
    at most watermark + max_delay. Without the time bound the state store
    would grow forever — the stream-stream-join scale contract.

    ``how="left_outer"`` adds the DROP-OFF rows: a from-event with no
    to-event in its window emits once with NULL to_id, as soon as the
    watermark passes from_time + max_delay (only then is "no match"
    final). Outer output therefore trails the watermark; rows whose
    window is not yet below the watermark remain pending in state. The
    engine's global watermark is the MIN over both sides' watermarks
    (each side advances by its own max event time seen), so the decided
    set after an availableNow drain is exactly: from-events with
    from_time + max_delay < min(max from_time, max to_time) - watermark
    (validated empirically; tests + the driver oracle pin it).
    left_outer output keeps from_time so callers can apply that cutoff."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    src = (events.filter(F.col("event_type") == from_type)
           .select(F.col("user_id"),
                   F.col("event_id").alias("from_id"),
                   F.col("event_time").alias("from_time"))
           .withWatermark("from_time", watermark))
    dst = (events.filter(F.col("event_type") == to_type)
           .select(F.col("user_id").alias("__dst_user"),
                   F.col("event_id").alias("to_id"),
                   F.col("event_time").alias("to_time"))
           .withWatermark("to_time", watermark))
    joined = src.join(
        dst,
        F.expr(f"user_id = __dst_user AND to_time >= from_time "
               f"AND to_time <= from_time + interval {max_delay}"),
        how)
    if how == "left_outer":
        return joined.select("user_id", "from_id", "to_id", "from_time")
    return joined.select("user_id", "from_id", "to_id")


USER_TOTALS_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("max_event_id", T.LongType()),
])

USER_TOTALS_STATE = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("max_event_id", T.LongType()),
])


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running totals that survive across micro-batches.

    This is the pattern for operators Structured Streaming lacks natively
    (SURVEY guidance): arbitrary per-key state + Arrow-batched updates.
    Emits the updated running totals for each user seen in a batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd
        n, total, max_id = (state.get if state.exists else (0, 0.0, -1))
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            max_id = max(max_id, int(pdf["event_id"].max()))
        state.update((n, total, max_id))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n],
            "total_value": [total], "max_event_id": [max_id]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                update, USER_TOTALS_OUTPUT, USER_TOTALS_STATE,
                "update", GroupStateTimeout.NoTimeout))


def write_parquet_sink(stream_df: DataFrame, path: str, checkpoint: str,
                       timeout: int = 300) -> None:
    """Drain a (non-aggregated) stream into a parquet file sink with
    exactly-once semantics: the checkpoint + the sink's _spark_metadata
    commit log make replayed micro-batches idempotent, so a restart never
    duplicates rows — the durable-pipeline counterpart of the memory-sink
    harness. availableNow-triggered; raises instead of returning a
    partially written table on timeout."""
    q = (stream_df.writeStream.format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"availableNow drain into {path!r} exceeded {timeout}s; "
            "parquet sink would be partial")


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str = "complete") -> DataFrame:
    """Drain all available input through the streaming engine into a memory
    sink and return the result as a DataFrame (batch-parity harness)."""
    q = (stream_df.writeStream.format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    # awaitTermination(timeout) returns False on timeout — reading the sink
    # then would yield a silently partial table (round-1 ADVICE)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"availableNow drain of {query_name!r} exceeded 300s; "
            "memory sink would be partial")
    return stream_df.sparkSession.table(query_name)
