"""Transform sync/retention (continuous-mode window + dest retention)."""

import pytest


def test_sync_window_and_retention(spark):
    import datetime

    from elasticsearch_hadoop_spark.transform import (
        TransformError,
        apply_retention,
        run_transform,
        sync_window,
    )

    base = datetime.datetime(2024, 1, 10, 0, 0, 0)
    now = base.replace(tzinfo=datetime.timezone.utc).timestamp()
    rows = [
        (1, base - datetime.timedelta(days=9), 1.0),   # old
        (2, base - datetime.timedelta(days=2), 2.0),   # mid
        (3, base - datetime.timedelta(seconds=30), 3.0),  # inside delay
        (4, base - datetime.timedelta(hours=1), 4.0),  # recent
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp, v double")
    sync = {"time": {"field": "ts", "delay": "60s"}}
    # no checkpoint: everything up to now-delay (the in-delay row waits)
    got = {r["id"] for r in sync_window(df, sync, now=now).collect()}
    assert got == {1, 2, 4}
    # checkpoint at -3d: only rows after it, still excluding the delay
    ckpt = base - datetime.timedelta(days=3)
    got2 = {r["id"] for r in sync_window(df, sync, last_checkpoint=ckpt,
                                         now=now).collect()}
    assert got2 == {2, 4}
    # retention: drop result rows older than max_age
    kept = {r["id"] for r in apply_retention(
        df, {"time": {"field": "ts", "max_age": "3d"}}, now=now).collect()}
    assert kept == {2, 3, 4}
    # composed through run_transform: sync window -> latest -> retention
    body = {
        "sync": sync,
        "latest": {"unique_key": ["id"], "sort": "ts"},
        "retention_policy": {"time": {"field": "ts", "max_age": "3d"}},
    }
    out = {r["id"] for r in run_transform(df, body, now=now,
                                          last_checkpoint=ckpt).collect()}
    assert out == {2, 4}
    with pytest.raises(TransformError, match="sync needs"):
        sync_window(df, {"time": {}}, now=now)
    with pytest.raises(TransformError, match="retention_policy needs"):
        apply_retention(df, {"time": {"field": "ts"}}, now=now)
    with pytest.raises(TransformError, match="bad duration"):
        sync_window(df, {"time": {"field": "ts", "delay": "soon"}}, now=now)
