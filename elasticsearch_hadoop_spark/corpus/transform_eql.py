"""Transforms + EQL corpus: the `_transform` API's pivot/latest modes
(transform.py) and EQL sequence funnels (eql.py), hash-checked against
SQL oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import TS_US_FMT_DUCK, TS_US_FMT_SPARK, tbl
from elasticsearch_hadoop_spark.eql import eql_sequence
from elasticsearch_hadoop_spark.transform import transform_latest, transform_pivot


@query(
    "transform_pivot_monthly",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       o_orderstatus AS status,
       round(sum(o_totalprice), 2) AS total,
       count(o_orderkey) AS n,
       round(avg(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY 1, 2
ORDER BY month, status
""",
)
def transform_pivot_monthly(spark, sf_dir):
    """ES transform pivot: date_histogram x terms group_by with
    sum/value_count/avg aggregations — one hash aggregate with map-side
    partials; the continuous-mode dest index is this frame + the catalog
    sink."""
    orders = tbl(spark, sf_dir, "orders")
    out = transform_pivot(
        orders,
        {
            "group_by": {
                "month": {
                    "date_histogram": {
                        "field": "o_orderdate",
                        "calendar_interval": "1M",
                    }
                },
                "status": {"terms": {"field": "o_orderstatus"}},
            },
            "aggregations": {
                "total": {"sum": {"field": "o_totalprice"}},
                "n": {"value_count": {"field": "o_orderkey"}},
                "avg_price": {"avg": {"field": "o_totalprice"}},
            },
        },
    )
    return out.select(
        F.date_format("month", "yyyy-MM-dd").alias("month"),
        "status",
        F.round("total", 2).alias("total"),
        "n",
        F.round("avg_price", 6).alias("avg_price"),
    ).orderBy("month", "status")


@query(
    "transform_latest_events",
    oracle=f"""
SELECT user_id, event_id, event_type,
       strftime(ts, '{TS_US_FMT_DUCK}') AS ts,
       round(value, 6) AS value
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
ORDER BY user_id
""",
)
def transform_latest_events(spark, sf_dir):
    """ES transform latest: newest event per user — one shuffle on the
    unique_key, per-group top-1 via WindowGroupLimit (no global sort);
    event_id tiebreaker makes equal-timestamp results deterministic."""
    ev = tbl(spark, sf_dir, "events")
    out = transform_latest(ev, unique_key="user_id", sort="ts", tiebreaker="event_id")
    return out.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", TS_US_FMT_SPARK).alias("ts"),
        F.round("value", 6).alias("value"),
    ).orderBy("user_id")


@query(
    "eql_funnel_sequence",
    oracle=f"""
WITH a AS (
    SELECT e.user_id, e.ts AS ts1,
           (SELECT min(c.ts) FROM events c
            WHERE c.event_type = 'click' AND c.user_id = e.user_id
              AND c.ts > e.ts) AS ts2
    FROM events e WHERE e.event_type = 'view'
), b AS (
    SELECT a.user_id, a.ts1, a.ts2,
           (SELECT min(p.ts) FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = a.user_id
              AND p.ts > a.ts2) AS ts3
    FROM a WHERE a.ts2 IS NOT NULL
)
SELECT user_id,
       strftime(ts1, '{TS_US_FMT_DUCK}') AS view_ts,
       strftime(ts2, '{TS_US_FMT_DUCK}') AS click_ts,
       strftime(ts3, '{TS_US_FMT_DUCK}') AS purchase_ts
FROM b
WHERE ts3 IS NOT NULL AND ts3 <= ts1 + INTERVAL 6 HOUR
ORDER BY user_id, view_ts
""",
)
def eql_funnel_sequence(spark, sf_dir):
    """EQL: sequence by user_id [view] [click] [purchase] with
    maxspan=6h — forward earliest-match via two union-tag window carries
    (one shuffle on user_id each), never a pairwise range join; the
    oracle's correlated min() subqueries restate the same semantics."""
    ev = tbl(spark, sf_dir, "events")
    seq = eql_sequence(
        ev,
        by="user_id",
        ts="ts",
        steps=[
            {"term": {"event_type": "view"}},
            {"term": {"event_type": "click"}},
            {"term": {"event_type": "purchase"}},
        ],
        maxspan="6 hours",
    )
    return seq.select(
        "user_id",
        F.date_format("step1_ts", TS_US_FMT_SPARK).alias("view_ts"),
        F.date_format("step2_ts", TS_US_FMT_SPARK).alias("click_ts"),
        F.date_format("step3_ts", TS_US_FMT_SPARK).alias("purchase_ts"),
    ).orderBy("user_id", "view_ts")


@query(
    "eql_sequence_until",
    oracle=f"""
WITH a AS (
    SELECT e.user_id, e.ts AS ts1,
           (SELECT min(c.ts) FROM events c
            WHERE c.event_type = 'purchase' AND c.user_id = e.user_id
              AND c.ts > e.ts) AS ts2,
           (SELECT min(x.ts) FROM events x
            WHERE x.event_type = 'error' AND x.user_id = e.user_id
              AND x.ts > e.ts) AS tu
    FROM events e WHERE e.event_type = 'view'
)
SELECT user_id,
       strftime(ts1, '{TS_US_FMT_DUCK}') AS view_ts,
       strftime(ts2, '{TS_US_FMT_DUCK}') AS purchase_ts
FROM a
WHERE ts2 IS NOT NULL AND (tu IS NULL OR tu >= ts2)
ORDER BY user_id, view_ts
""",
)
def eql_sequence_until(spark, sf_dir):
    """EQL ``sequence by user_id [view] [purchase] until [error]``
    (eql.eql_sequence until=): an error event landing strictly between
    the view and its earliest following purchase expires the pending
    sequence — one extra union-tag window carry per transition on the
    same shuffle key, never a pairwise join.  The oracle restates the
    semantics with correlated min() subqueries: earliest purchase after
    the view, earliest error after the view, keep when no error precedes
    the purchase (ties survive, the documented deterministic rule)."""
    ev = tbl(spark, sf_dir, "events")
    seq = eql_sequence(
        ev,
        by="user_id",
        ts="ts",
        steps=[
            {"term": {"event_type": "view"}},
            {"term": {"event_type": "purchase"}},
        ],
        until={"term": {"event_type": "error"}},
    )
    return seq.select(
        "user_id",
        F.date_format("step1_ts", TS_US_FMT_SPARK).alias("view_ts"),
        F.date_format("step2_ts", TS_US_FMT_SPARK).alias("purchase_ts"),
    ).orderBy("user_id", "view_ts")
