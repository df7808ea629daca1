"""Structured Streaming layer (SURVEY.md §7 step 4; reference parity A9).

The reference's streaming support is a micro-batch *sink*: Structured
Streaming ``Sink.addBatch`` feeding the bulk-write path, with a
checkpoint-backed commit log for exactly-once
(``spark/sql-20/.../sql/streaming/EsSparkSqlStreamingSink.scala``,
``EsCommitProtocol.scala`` — path citations per SURVEY.md §0; append-only,
batch skipped when its batchId is already committed).  Spark gives the same
guarantee natively: a file sink + ``checkpointLocation`` keeps its own
write-ahead commit log, so re-running a query over the same source resumes
after the last committed batch instead of duplicating it.  ``sink_index``
below is therefore a thin, documented veneer — the parity point is the
guarantee, not custom code.

On top of the sink parity this module provides the streaming operator
surface from §2.C: event replay from files, watermarked tumbling/sliding/
session windows, streaming dedup, and a custom stateful operator via
``transformWithStateInPandas``-style ``applyInPandasWithState``.

Scale notes (100 TB/day stream):
- File-source replay here stands in for Kafka; everything downstream is
  source-agnostic (same DataFrame ops).
- Watermarks bound state: windowed aggregations and dedup evict state older
  than the watermark, so executor state size is O(window x key cardinality),
  not O(stream length).
- ``maxFilesPerTrigger``/``maxBytesPerTrigger`` is the file-source
  backpressure knob (the analogue of the reference's scroll/bulk batch
  sizing, es.batch.size.* — ConfigurationOptions.java).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events fixture as a file-source stream (micro-batch replay).

    Structured Streaming needs a fixed schema up front, but the fixture's
    ``ts`` physical type has changed across driver testdata generations
    (TIMESTAMP(NANOS) in rounds 1-2 — unreadable by Spark 4 without the
    nanos-as-long legacy conf — plain TIMESTAMP(MICROS) now).  Probe the
    directory with a one-footer batch read and pick the matching schema:
    nanos-long gets the floor-to-micros conversion corpus/_util.tbl applies,
    so batch recomputation stays a valid oracle either way; native
    timestamps stream through untouched."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_is_long = dict(spark.read.parquet(events_dir).dtypes).get("ts") == "bigint"
    schema = _events_schema(T.LongType() if ts_is_long else T.TimestampType())
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(events_dir)
    if ts_is_long:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type (§2.C streaming).
    Late rows (older than watermark) are dropped — ES-side has no analogue;
    the reference simply indexes whatever arrives (A9 append-only)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_rates(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour", watermark: str = "4 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based), watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup with watermark-bounded state (§2.C:
    ``dropDuplicates([id], withWatermark)`` — state evicted past watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicates(keys or ["event_id"])


_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def running_user_totals(events: DataFrame, state_ttl_ms: int = 0) -> DataFrame:
    """CUSTOM stateful operator (§2.C `(flat)MapGroupsWithState` analogue):
    per-user running event count/value total via applyInPandasWithState.

    Arrow-batched per group; state is two numbers per user -> executor state
    O(distinct users).  ``state_ttl_ms`` > 0 sets a processing-time timeout
    that clears idle users' state (state-TTL watch-list item, SURVEY.md §7)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn, _RUNNING_SCHEMA, _STATE_SCHEMA, "update", timeout
    )


def sink_index(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    available_now: bool = True,
    fmt: str = "parquet",
):
    """A9 parity sink: checkpointed file sink = the reference's commit-log
    exactly-once (batchId-skip) behavior, natively.  Returns the started
    StreamingQuery; caller awaits termination."""
    writer = (
        stream.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_aggregate(
    stream: DataFrame,
    catalog,
    dest: str,
    key_cols: list[str],
    aggs: dict,
    checkpoint: str,
    available_now: bool = True,
):
    """Incrementally-maintained rollup index (the hypertable
    continuous-aggregate / materialized-view pattern): a streaming
    aggregation holds the running totals per key; each micro-batch emits
    the UPDATED totals for keys that changed (update output mode), and
    foreachBatch upserts exactly those rows into ``dest`` keyed on the
    group columns.  Reading ``dest`` at any time gives current totals
    without touching raw data.

    Exactly-once: the aggregation state + batch ids live in the
    checkpoint; a replayed batch re-upserts the same totals (idempotent).
    Scale: per-batch work is O(changed keys), dest merge is one hash join
    on the key — raw events are read once, ever.  Use mergeable aggregates
    (count/sum/min/max; avg = sum/count at read time)."""
    agg_df = stream.groupBy(*key_cols).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # Hash a struct of the keys: concat_ws null-skips, so distinct
        # tuples like (null, "a") and ("a", null) collide and silently
        # merge unrelated groups' totals.  to_json keeps field boundaries
        # and renders nulls explicitly; sha2 bounds the key width.
        keyed = batch_df.withColumn(
            "_cagg_id", F.sha2(F.to_json(F.struct(*key_cols)), 256)
        )
        catalog.write_index(keyed, dest, operation="upsert", id_col="_cagg_id")

    writer = (
        agg_df.writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_batches(
    stream: DataFrame, checkpoint: str, output_mode: str = "update"
) -> "list[tuple[int, list]]":
    """Drain a stream with foreachBatch, collecting (batchId, rows) —
    test/debug harness for update-mode queries that file sinks can't take."""
    out: list[tuple[int, list]] = []

    def collect_batch(df: DataFrame, batch_id: int) -> None:
        out.append((batch_id, df.collect()))

    q = (
        stream.writeStream.foreachBatch(collect_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out
