"""Live Structured-Streaming corpus entries: unlike corpus/streaming_batch.py
(batch recomputation of the window shapes), these actually run
readStream -> writeStream to completion (availableNow) and return the sink's
contents, so the driver's correctness gate exercises the real streaming
engine — watermark hold-back semantics included, encoded in the DuckDB
oracle itself."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import TS_FMT_DUCK, TS_FMT_SPARK
from elasticsearch_hadoop_spark.streaming.pipeline import (
    dedup_stream,
    sink_index,
    stream_events,
    tumbling_counts,
)


def _replay_dir(sf_dir: str, copies: int = 1) -> str:
    d = tempfile.mkdtemp(prefix="ehs_stream_")
    for i in range(copies):
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-{i:03d}.parquet")
    return d


def _run(stream_df) -> "str":
    out = tempfile.mkdtemp(prefix="ehs_sink_")
    ckpt = tempfile.mkdtemp(prefix="ehs_ckpt_")
    q = sink_index(stream_df, out + "/data", ckpt, available_now=True)
    q.awaitTermination()
    return out + "/data"


@query(
    "stream_live_tumbling",
    oracle=f"""
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS wm FROM events),
agg AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, event_type,
         count(*) AS n, round(sum(value), 4) AS sum_value
  FROM events GROUP BY 1, 2)
SELECT strftime(w, '{TS_FMT_DUCK}') AS w_start, event_type, n, sum_value
FROM agg, wm WHERE w + INTERVAL 1 HOUR <= wm.wm
ORDER BY w_start, event_type
""",
)
def stream_live_tumbling(spark, sf_dir):
    """End-to-end streaming tumbling-window aggregation with a 2h watermark,
    availableNow trigger, checkpointed parquet sink (A9 parity).  The oracle
    reproduces append-mode semantics: only windows whose end the final
    watermark (max ts - 2h) has passed are emitted."""
    src = _replay_dir(sf_dir)
    out = _run(tumbling_counts(stream_events(spark, src), window="1 hour", watermark="2 hours"))
    got = spark.read.parquet(out)
    return got.select(
        F.date_format("w_start", TS_FMT_SPARK).alias("w_start"),
        "event_type",
        "n",
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("w_start", "event_type")


@query(
    "stream_live_dedup",
    oracle=f"""
SELECT event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s, user_id, event_type
FROM events ORDER BY event_id
""",
)
def stream_live_dedup(spark, sf_dir):
    """Streaming exact dedup: the source directory carries every event twice
    (two files, one per micro-batch); watermarked dropDuplicates must emit
    each event_id exactly once.  Oracle: the original single-copy table."""
    src = _replay_dir(sf_dir, copies=2)
    stream = dedup_stream(
        stream_events(spark, src, max_files_per_trigger=1), keys=["event_id"]
    )
    out = _run(stream)
    got = spark.read.parquet(out)
    return got.select(
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
        "user_id",
        "event_type",
    ).orderBy("event_id")
