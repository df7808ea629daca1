"""Structured Streaming tests (SURVEY.md §7 step 4): every streaming query is
checked against batch recomputation over the same data (the oracle), and the
sink is checked for exactly-once on checkpoint re-run (A9 parity)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.streaming.pipeline import (
    dedup_stream,
    run_batches,
    running_user_totals,
    session_windows,
    sink_index,
    stream_events,
    tumbling_counts,
)


@pytest.fixture()
def events_dir(sf_dir, tmp_path):
    """Fixture events parquet replayed from a scratch dir (so the stream
    source sees a plain directory of files)."""
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def rows_set(rows, cols):
    return {tuple(r[c] for c in cols) for r in rows}


def test_tumbling_counts_vs_batch(spark, sf_dir, events_dir, tmp_path):
    stream = tumbling_counts(stream_events(spark, events_dir))
    q = sink_index(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))

    ev = tbl(spark, sf_dir, "events")
    expect = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    cols = ["w_start", "event_type", "n"]
    got_set, expect_all = rows_set(got.collect(), cols), rows_set(expect.collect(), cols)
    # append mode emits a window only once the watermark passes its end, so
    # windows inside the final watermark delay (2h) are correctly withheld
    # at end-of-stream — the oracle is "everything emitted is right, and
    # every watermark-finalized window was emitted"
    import datetime as dt

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(hours=2)
    must_emit = {
        t
        for t in expect_all
        if t[0] + dt.timedelta(hours=1) < wm  # w_end strictly before watermark
    }
    assert got_set <= expect_all
    assert must_emit <= got_set


def test_sink_exactly_once_on_rerun(spark, events_dir, tmp_path):
    """Re-starting the same query over the same checkpoint must not duplicate
    output — the native analogue of the reference's batchId commit-log skip
    (EsSinkMetadataLog)."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for _ in range(2):  # second run: source exhausted, commit log says done
        q = sink_index(tumbling_counts(stream_events(spark, events_dir)), out, ckpt)
        q.awaitTermination()
    n1 = spark.read.parquet(out).count()
    q = sink_index(tumbling_counts(stream_events(spark, events_dir)), out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == n1


def test_streaming_dedup(spark, sf_dir, tmp_path, events_dir):
    """Duplicate the source file -> every event arrives twice across two
    batches; watermarked dropDuplicates must emit each exactly once."""
    shutil.copy(f"{events_dir}/part-000.parquet", f"{events_dir}/part-001.parquet")
    stream = dedup_stream(
        stream_events(spark, events_dir, max_files_per_trigger=1), keys=["event_id"]
    )
    q = sink_index(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))
    n_batch = tbl(spark, sf_dir, "events").count()
    assert got.count() == n_batch
    assert got.select("event_id").distinct().count() == n_batch


def test_session_windows_vs_batch(spark, sf_dir, events_dir, tmp_path):
    stream = session_windows(stream_events(spark, events_dir), gap="30 minutes")
    q = sink_index(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))

    ev = tbl(spark, sf_dir, "events")
    expect = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    cols = ["session_start", "user_id", "n_events"]
    import datetime as dt

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(hours=2)
    got_set = rows_set(got.collect(), cols)
    expect_rows = expect.collect()
    expect_all = rows_set(expect_rows, cols)
    must_emit = rows_set([r for r in expect_rows if r["session_end"] < wm], cols)
    assert got_set <= expect_all
    assert must_emit <= got_set


def test_running_user_totals_stateful(spark, sf_dir, events_dir, tmp_path):
    """applyInPandasWithState: final per-user totals (last update per user)
    must equal the batch groupBy."""
    stream = running_user_totals(stream_events(spark, events_dir))
    batches = run_batches(stream, str(tmp_path / "ckpt"), output_mode="update")
    last: dict[int, tuple] = {}
    for _, rows in batches:
        for r in rows:
            last[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))

    ev = tbl(spark, sf_dir, "events")
    expect = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("total"))
        .collect()
    }
    assert last == expect


def test_continuous_aggregate_maintains_rollup(spark, sf_dir, events_dir, tmp_path):
    """Incremental rollup: two micro-batches (maxFilesPerTrigger=1 over two
    files) upsert running per-type totals into a catalog index; final state
    equals the batch aggregate, and a checkpointed rerun changes nothing."""
    import shutil as _sh

    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus._util import tbl
    from elasticsearch_hadoop_spark.streaming.pipeline import continuous_aggregate

    # second micro-batch = the same raw file again (duplicate events —
    # totals must accumulate across batches, proving the merge is
    # incremental rather than last-batch-wins)
    _sh.copy(f"{events_dir}/part-000.parquet", f"{events_dir}/part-001.parquet")

    cat = Catalog(spark, str(tmp_path / "caggidx"))
    ckpt = str(tmp_path / "cagg_ckpt")
    aggs = {"n": F.count(F.lit(1)), "total": F.sum("value")}

    q = continuous_aggregate(
        stream_events(spark, events_dir, max_files_per_trigger=1),
        cat, "rollup", ["event_type"], aggs, ckpt,
    )
    q.awaitTermination(120)

    got = {
        r["event_type"]: (r["n"], round(r["total"], 6))
        for r in cat.read_index("rollup").collect()
    }
    # plain batch read — ts is unused here, and forcing the legacy
    # nanos-long EVENTS_SCHEMA onto the now-micros fixture would silently
    # coerce timestamps to 1970-era values (see stream_events's probe)
    expect_df = (
        spark.read.parquet(events_dir)
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    expect = {r["event_type"]: (r["n"], round(r["total"], 6)) for r in expect_df.collect()}
    assert got == expect

    # exactly-once: rerun with same checkpoint is a no-op
    q2 = continuous_aggregate(
        stream_events(spark, events_dir, max_files_per_trigger=1),
        cat, "rollup", ["event_type"], aggs, ckpt,
    )
    q2.awaitTermination(120)
    got2 = {
        r["event_type"]: (r["n"], round(r["total"], 6))
        for r in cat.read_index("rollup").collect()
    }
    assert got2 == expect
