"""Async-search veneer (async_search.py): submit/poll/get lifecycle,
wait windows, keep_on_completion, cancellation, expiry."""

import time

import pytest

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.async_search import AsyncSearch, AsyncSearchError


def test_submit_and_poll_lifecycle(spark):
    a = AsyncSearch(spark)
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    rec = a.submit(df, wait_for_completion_timeout=30.0)
    assert rec["is_running"] is False and rec["is_partial"] is False
    assert rec["response"]["total"] == 100
    assert rec["response"]["columns"] == ["id", "x"]
    # still retrievable (keep_on_completion default True)
    again = a.get(rec["id"])
    assert again["response"]["total"] == 100
    st = a.status(rec["id"])
    assert st == {"id": rec["id"], "is_running": False, "is_partial": False}


def test_slow_query_is_running_then_completes(spark):
    a = AsyncSearch(spark)

    def build():
        time.sleep(1.0)
        return spark.range(5)

    rec = a.submit(build)  # no wait window
    assert rec["is_running"] is True and "response" not in rec
    got = a.get(rec["id"], wait_for_completion_timeout=30.0)
    assert got["is_running"] is False
    assert got["response"]["total"] == 5


def test_keep_on_completion_false_not_stored(spark):
    a = AsyncSearch(spark)
    rec = a.submit(spark.range(3), wait_for_completion_timeout=30.0,
                   keep_on_completion=False)
    # the complete response came back on submit; like ES, nothing is
    # stored past that point
    assert rec["response"]["total"] == 3
    with pytest.raises(AsyncSearchError):
        a.get(rec["id"])

    # slow path: completion observed by get(), which then consumes it
    import time as _t

    def build():
        _t.sleep(0.5)
        return spark.range(4)

    rec2 = a.submit(build, keep_on_completion=False)
    got = a.get(rec2["id"], wait_for_completion_timeout=30.0)
    assert got["response"]["total"] == 4
    with pytest.raises(AsyncSearchError):
        a.get(rec2["id"])


def test_error_surfaces_in_response(spark):
    a = AsyncSearch(spark)

    def boom():
        raise RuntimeError("bad plan")

    rec = a.submit(boom, wait_for_completion_timeout=30.0)
    assert rec["is_running"] is False
    assert "bad plan" in rec["error"]


def test_delete_cancels_and_forgets(spark):
    a = AsyncSearch(spark)

    def build():
        time.sleep(5.0)
        return spark.range(5)

    rec = a.submit(build)
    assert a.delete(rec["id"]) == {"id": rec["id"], "acknowledged": True}
    with pytest.raises(AsyncSearchError):
        a.status(rec["id"])
    with pytest.raises(AsyncSearchError):
        a.delete("as-ghost")


def test_delete_cancels_queued_search(spark):
    # fill the single worker so the second search is QUEUED, then delete
    # it — future.cancel() must stop it from ever running
    ran = []
    a = AsyncSearch(spark, max_workers=1)

    def slow():
        time.sleep(2.0)
        return spark.range(1)

    def should_never_run():
        ran.append(True)
        return spark.range(1)

    first = a.submit(slow)
    queued = a.submit(should_never_run)
    a.delete(queued["id"])
    a.get(first["id"], wait_for_completion_timeout=30.0)
    time.sleep(0.5)  # give the pool a chance to (wrongly) start it
    assert ran == []


def test_expire_drops_old_completed(spark):
    a = AsyncSearch(spark)
    rec = a.submit(spark.range(2), wait_for_completion_timeout=30.0)
    assert a.expire(older_than_seconds=3600) == []
    dropped = a.expire(older_than_seconds=0.0, now=time.time() + 10)
    assert dropped == [rec["id"]]
    with pytest.raises(AsyncSearchError):
        a.get(rec["id"])


def test_max_rows_caps_the_collect(spark):
    a = AsyncSearch(spark)
    rec = a.submit(spark.range(100), wait_for_completion_timeout=30.0,
                   max_rows=7)
    assert rec["response"]["total"] == 7
