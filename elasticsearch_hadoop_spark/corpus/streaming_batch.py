"""Streaming-semantics corpus, batch-checkable form.

Structured Streaming queries (tumbling/sliding/session windows, keyed
dedup) produce, after all data arrives, exactly the batch computation over
the full input — that equivalence is what lets the DuckDB oracle check
them.  The REAL streaming path (readStream over file micro-batches,
watermarks, append mode, checkpoint recovery) runs in
tests/test_streaming.py and elasticsearch_hadoop_spark/streaming/;
the driver's oracle sees the batch twin (SURVEY.md §5 t2 approach,
"Oracle: batch recomputation over the same data").

DuckDB `time_bucket` and Spark `F.window` both align buckets to epoch-
aligned multiples for hour/minute intervals -> identical bucket starts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "stream_tumbling_window",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def stream_tumbling_window(spark, sf_dir):
    """Tumbling 1h windows per event_type (streaming: readStream + window +
    watermark; identical result after stream end)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "stream_sliding_window",
    oracle="""
WITH slid AS (
  SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                 time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS wstart,
         user_id, value
  FROM events
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n,
       round(avg(value), 6) AS avg_value
FROM slid
GROUP BY 1
ORDER BY 1
""",
)
def stream_sliding_window(spark, sf_dir):
    """Sliding 2h windows, 1h slide: every event lands in 2 windows (the
    duplication is explicit in the oracle's unnest)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "avg_value",
        )
        .orderBy("window_start")
    )


@query(
    "stream_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM islands
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def stream_session_window(spark, sf_dir):
    """Session windows (30-min gap) per user.  Spark session_window end =
    last event + gap; the oracle's gaps-and-islands SQL reproduces exactly
    that."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "stream_event_rates",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def stream_event_rates(spark, sf_dir):
    """Per-type event stats — the running-aggregate (update-mode) shape."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
        )
        .orderBy("event_type")
    )
