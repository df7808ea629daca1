"""Watcher-style alerting (watcher.py): execute_watch fidelity, the
percolator bulk path, scheduling bookkeeping, and error contract."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.catalog import Catalog
from elasticsearch_hadoop_spark.watcher import (
    WatcherError,
    due_watches,
    execute_watch,
    parse_interval,
    run_watches,
)


@pytest.fixture()
def logs(spark):
    return spark.createDataFrame(
        [("error", "h1", 500), ("error", "h2", 502), ("ok", "h1", 200),
         ("error", "h1", 503), ("warn", "h3", 300)],
        "level string, host string, code int",
    )


def test_execute_watch_condition_and_logging(spark, logs):
    watch = {
        "input": {"search": {"request": {
            "indices": ["logs"],
            "body": {"query": {"term": {"level": "error"}}},
        }}},
        "condition": {"compare": {"ctx.payload.hits.total": {"gte": 3}}},
        "actions": {"note": {"logging": {
            "text": "saw {{ctx.payload.hits.total}} errors"}}},
    }
    rec = execute_watch(watch, frames={"logs": logs})
    assert rec["condition_met"] is True
    assert rec["payload"]["hits"]["total"] == 3
    assert rec["actions"] == [
        {"name": "note", "type": "logging", "text": "saw 3 errors"}
    ]
    # condition not met -> no actions
    watch["condition"]["compare"]["ctx.payload.hits.total"] = {"gte": 4}
    rec2 = execute_watch(watch, frames={"logs": logs})
    assert rec2["condition_met"] is False and rec2["actions"] == []


def test_execute_watch_aggs_payload(spark, logs):
    watch = {
        "input": {"search": {"request": {
            "indices": ["logs"],
            "body": {"aggs": {"by_level": {"terms": {"field": "level"}}}},
        }}},
        "condition": {"always": {}},
    }
    rec = execute_watch(watch, frames={"logs": logs})
    got = {r["by_level"]: r["doc_count"] for r in rec["payload"]["aggregations"]}
    assert got == {"error": 3, "ok": 1, "warn": 1}


def test_execute_watch_index_action(spark, logs, tmp_path):
    cat = Catalog(spark, str(tmp_path / "indices"))
    watch = {
        "id": "err-watch",
        "input": {"search": {"request": {
            "indices": ["logs"],
            "body": {"query": {"range": {"code": {"gte": 500}}}},
        }}},
        "condition": {"compare": {"ctx.payload.hits.total": {"gt": 0}}},
        "actions": {"store": {"index": {"index": "alerts"}}},
    }
    rec = execute_watch(watch, frames={"logs": logs}, catalog=cat)
    assert rec["actions"] == [{"name": "store", "type": "index",
                              "index": "alerts"}]
    alerts = cat.read_index("alerts").collect()
    assert len(alerts) == 1
    assert alerts[0]["watch_id"] == "err-watch"
    assert alerts[0]["hits_total"] == 3


def test_run_watches_percolator_path(spark, logs):
    watches = spark.createDataFrame(
        [
            ("errs", '{"term": {"level": "error"}}', 1),
            ("many_errs", '{"term": {"level": "error"}}', 5),
            ("h3", '{"term": {"host": "h3"}}', None),
            ("nothing", '{"term": {"level": "fatal"}}', 1),
        ],
        "_id string, query string, min_hits int",
    )
    fired = {r["watch_id"]: r["hit_count"]
             for r in run_watches(logs, watches, min_hits_col="min_hits").collect()}
    # errs fires at 3 hits; many_errs needs 5 and stays quiet; h3 defaults
    # to min_hits 1; 'nothing' matches no docs
    assert fired == {"errs": 3, "h3": 1}
    # without thresholds every matched watch fires
    fired2 = {r["watch_id"] for r in run_watches(logs, watches).collect()}
    assert fired2 == {"errs", "many_errs", "h3"}


def test_due_watches_and_intervals():
    assert parse_interval("5m") == 300.0
    watches = {
        "a": {"trigger": {"schedule": {"interval": "5m"}}},
        "b": {"trigger": {"schedule": {"interval": "1h"}}},
        "c": {},  # no schedule: always due
    }
    state = {"a": 1000.0, "b": 1000.0}
    assert due_watches(watches, state, now=1400.0) == ["a", "c"]
    assert due_watches(watches, state, now=1000.0 + 3600) == ["a", "b", "c"]
    with pytest.raises(WatcherError):
        parse_interval("one eon")


def test_watcher_error_contract(spark, logs):
    with pytest.raises(WatcherError, match="input.search.request"):
        execute_watch({}, frames={})
    with pytest.raises(WatcherError, match="unknown index"):
        execute_watch(
            {"input": {"search": {"request": {"indices": ["ghost"]}}}},
            frames={"logs": logs},
        )
    base = {"input": {"search": {"request": {"indices": ["logs"]}}}}
    with pytest.raises(WatcherError, match="unsupported condition"):
        execute_watch({**base, "condition": {"script": {}}}, frames={"logs": logs})
    with pytest.raises(WatcherError, match="unsupported compare op"):
        execute_watch(
            {**base, "condition": {"compare": {"ctx.payload.hits.total":
                                               {"approx": 1}}}},
            frames={"logs": logs},
        )
    with pytest.raises(WatcherError, match="unsupported action"):
        execute_watch(
            {**base, "actions": {"x": {"webhook": {"url": "http://x"}}}},
            frames={"logs": logs},
        )
    with pytest.raises(WatcherError, match="needs a catalog"):
        execute_watch(
            {**base, "actions": {"x": {"index": {"index": "alerts"}}}},
            frames={"logs": logs},
        )


def test_action_throttling(spark, logs):
    watch = {
        "id": "w1",
        "input": {"search": {"request": {
            "indices": ["logs"],
            "body": {"query": {"term": {"level": "error"}}},
        }}},
        "condition": {"always": {}},
        "actions": {"note": {"throttle_period": "5m",
                             "logging": {"text": "errors!"}}},
    }
    state: dict = {}
    r1 = execute_watch(watch, frames={"logs": logs}, state=state, now=1000.0)
    assert r1["actions"][0]["type"] == "logging"
    assert state == {"w1/note": 1000.0}
    # inside the 5m window: throttled, not executed, stamp unchanged
    r2 = execute_watch(watch, frames={"logs": logs}, state=state, now=1200.0)
    assert r2["actions"] == [{"name": "note", "type": "logging",
                             "throttled": True}]
    assert state == {"w1/note": 1000.0}
    # window elapsed: fires again
    r3 = execute_watch(watch, frames={"logs": logs}, state=state, now=1000.0 + 301)
    assert r3["actions"][0].get("throttled") is None
    assert state == {"w1/note": 1301.0}
    # a malformed multi-type action raises WatcherError, not ValueError
    bad = dict(watch)
    bad["actions"] = {"x": {"logging": {"text": "a"}, "index": {"index": "i"}}}
    with pytest.raises(WatcherError, match="exactly one action type"):
        execute_watch(bad, frames={"logs": logs})


def test_watch_tick_per_streaming_microbatch(spark, tmp_path):
    """The documented deployment shape: run_watches as a foreachBatch
    tick — each micro-batch is percolated against the stored watches in
    one pass and firings accumulate in a driver-side list (stand-in for
    an alert sink)."""
    import shutil

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                src / "part-000.parquet")
    watches = spark.createDataFrame(
        [("clicks", '{"term": {"event_type": "click"}}', 1),
         ("ghost", '{"term": {"event_type": "no-such"}}', 1)],
        "_id string, query string, min_hits int",
    )
    fired: list = []

    def tick(batch_df, batch_id):
        for r in run_watches(batch_df, watches,
                             min_hits_col="min_hits").collect():
            fired.append((batch_id, r["watch_id"], r["hit_count"]))

    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src)).schema
        ).parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(tick).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    # the batch oracle: the same percolation over the full frame
    batch = spark.read.parquet(str(src))
    want = {(r["watch_id"], r["hit_count"])
            for r in run_watches(batch, watches,
                                 min_hits_col="min_hits").collect()}
    got = {(w, n) for _b, w, n in fired}
    assert got == want and want == {("clicks", batch.filter(
        F.col("event_type") == "click").count())}


def test_ack_suppresses_until_condition_false(spark, logs):
    from elasticsearch_hadoop_spark.watcher import ack_watch

    watch = {
        "id": "w1",
        "input": {"search": {"request": {
            "indices": ["logs"],
            "body": {"query": {"term": {"level": "error"}}},
        }}},
        "condition": {"compare": {"ctx.payload.hits.total": {"gte": 3}}},
        "actions": {"note": {"logging": {"text": "errors!"}}},
    }
    state: dict = {}
    rec = execute_watch(watch, frames={"logs": logs}, state=state, now=0.0)
    assert rec["actions"][0]["type"] == "logging"
    ack_watch(state, "w1", ["note"])
    rec2 = execute_watch(watch, frames={"logs": logs}, state=state, now=10.0)
    assert rec2["actions"] == [{"name": "note", "type": "logging", "acked": True}]
    # condition false -> ack resets (ES awaits_successful_execution)
    calm = logs.filter("level = 'ok'")
    rec3 = execute_watch(watch, frames={"logs": calm}, state=state, now=20.0)
    assert rec3["condition_met"] is False
    assert not any(k.endswith("#ack") for k in state)
    rec4 = execute_watch(watch, frames={"logs": logs}, state=state, now=30.0)
    assert rec4["actions"][0] == {"name": "note", "type": "logging",
                                  "text": "errors!"}


def test_state_roundtrip_through_catalog(spark, logs, tmp_path):
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.watcher import (
        ack_watch,
        load_watcher_state,
        save_watcher_state,
    )

    cat = Catalog(spark, str(tmp_path / "idx"))
    assert load_watcher_state(cat) == {}  # missing index -> first run
    state = {"w1/note": 123.5}
    ack_watch(state, "w1", ["mail"])
    save_watcher_state(cat, state)
    assert load_watcher_state(cat) == {"w1/note": 123.5, "w1/mail#ack": True}

    # a persisted throttle window survives the "restart"
    watch = {
        "id": "w1",
        "input": {"search": {"request": {
            "indices": ["logs"],
            "body": {"query": {"term": {"level": "error"}}},
        }}},
        "condition": {"compare": {"ctx.payload.hits.total": {"gte": 1}}},
        "actions": {"note": {"throttle_period": "1h",
                             "logging": {"text": "hi"}}},
    }
    reloaded = load_watcher_state(cat)
    rec = execute_watch(watch, frames={"logs": logs}, state=reloaded, now=200.0)
    assert rec["actions"] == [{"name": "note", "type": "logging",
                               "throttled": True}]
    rec2 = execute_watch(watch, frames={"logs": logs}, state=reloaded, now=7200.0)
    assert rec2["actions"][0]["text"] == "hi"
