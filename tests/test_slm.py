"""SLM policies (slm.py): execute + retention over catalog snapshots,
with explicit deterministic `now` everywhere."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.catalog import Catalog, IndexExistsError
from elasticsearch_hadoop_spark.slm import (
    SlmError,
    execute_slm_policy,
    get_slm_policy,
    put_slm_policy,
    resolve_snapshot_name,
    slm_retention_tick,
    validate_slm_policy,
)

DAY = 86400.0
T0 = 1704067200.0  # 2024-01-01 00:00:00 UTC


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "indices"))
    df = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    c.write_index(df, "logs-a", mode="overwrite")
    return c


def _policy(tmp_path, **retention):
    return {
        "schedule": "0 30 1 * * ?",
        "name": "<nightly-{now/d}>",
        "repository": str(tmp_path / "repo"),
        "config": {"indices": "logs-*"},
        "retention": retention,
    }


def test_resolve_snapshot_name_date_math():
    assert resolve_snapshot_name("<nightly-{now/d}>", T0) == (
        "nightly-2024.01.01-1704067200"
    )
    assert resolve_snapshot_name("<s-{now/d}-x>", T0 + DAY) == (
        "s-2024.01.02-x-1704153600"
    )
    assert resolve_snapshot_name("plain-name", T0) == "plain-name"


def test_validate_policy_errors(tmp_path):
    with pytest.raises(SlmError, match="needs 'repository'"):
        validate_slm_policy({"name": "<x-{now/d}>"})
    with pytest.raises(SlmError, match="unknown retention"):
        validate_slm_policy({"name": "n", "repository": "r",
                             "retention": {"keep": 3}})
    with pytest.raises(SlmError, match="below min_count"):
        validate_slm_policy({"name": "n", "repository": "r",
                             "retention": {"min_count": 5, "max_count": 2}})


def test_execute_snapshots_matched_indices(cat, tmp_path):
    put_slm_policy(cat, "nightly", _policy(tmp_path, max_count=10))
    out = execute_slm_policy(cat, "nightly", now=T0)
    assert out["indices"] == ["logs-a"]
    assert out["snapshot_name"].startswith("nightly-2024.01.01")
    snaps = cat.list_snapshots(str(tmp_path / "repo"))
    assert [s["index"] for s in snaps] == ["logs-a"]
    hist = get_slm_policy(cat, "nightly")["snapshots"]
    assert len(hist) == 1 and hist[0]["taken_at"] == T0
    with pytest.raises(SlmError, match="no SLM policy"):
        execute_slm_policy(cat, "nope", now=T0)


def test_retention_expire_after_respects_min_count(cat, tmp_path):
    put_slm_policy(cat, "p", _policy(tmp_path, expire_after="2d", min_count=2))
    names = [
        execute_slm_policy(cat, "p", now=T0 + i * DAY)["snapshot_name"]
        for i in range(4)
    ]
    # at T0+10d all four exceed 2d — min_count keeps the newest 2, so
    # exactly the two OLDEST drop
    dropped = slm_retention_tick(cat, "p", now=T0 + 10 * DAY)
    assert dropped == names[:2]
    kept = [s["snapshot"] for s in get_slm_policy(cat, "p")["snapshots"]]
    assert kept == names[2:]
    # the dropped snapshot dirs are gone, kept ones remain
    repo = str(tmp_path / "repo")
    for d in dropped:
        assert not os.path.exists(os.path.join(repo, d))
    for k in kept:
        assert os.path.exists(os.path.join(repo, k))
    # idempotent: a re-tick drops nothing further
    assert slm_retention_tick(cat, "p", now=T0 + 10 * DAY) == []


def test_retention_max_count_trims_oldest_regardless_of_age(cat, tmp_path):
    put_slm_policy(cat, "p", _policy(tmp_path, max_count=2))
    names = [
        execute_slm_policy(cat, "p", now=T0 + i * DAY)["snapshot_name"]
        for i in range(3)
    ]
    dropped = slm_retention_tick(cat, "p", now=T0 + 3 * DAY)
    assert dropped == [names[0]]
    kept = [s["snapshot"] for s in get_slm_policy(cat, "p")["snapshots"]]
    assert kept == names[1:]


def test_restore_from_slm_snapshot_roundtrip(cat, tmp_path):
    put_slm_policy(cat, "p", _policy(tmp_path, max_count=5))
    snap = execute_slm_policy(cat, "p", now=T0)["snapshot_name"]
    cat.restore_index(str(tmp_path / "repo"), snap, "logs-a", rename_to="logs-restored")
    got = {(r["k"], r["v"]) for r in cat.read_index("logs-restored").collect()}
    assert got == {(i, i * 3) for i in range(10)}


def test_unsupported_date_math_rejected_at_put(cat, tmp_path):
    """Review r9b-3: a valid-ES-but-unimplemented date-math name must
    fail at PUT time, never mint a literal '<...{now/M}>' directory."""
    pol = _policy(tmp_path, max_count=2)
    pol["name"] = "<nightly-{now/M}>"
    with pytest.raises(SlmError, match="date-math"):
        put_slm_policy(cat, "bad", pol)


def test_execute_cleans_up_partial_snapshot(cat, tmp_path, spark):
    """Review r9b-7: a failure mid-execution must remove the already-
    written index dirs so the snapshot name is not wedged forever."""
    df = spark.range(5).select(F.col("id").alias("k"))
    cat.write_index(df, "logs-b", mode="overwrite")
    pol = _policy(tmp_path, max_count=5)
    put_slm_policy(cat, "p", pol)
    repo = str(tmp_path / "repo")
    # pre-create the second index's snapshot dir so snapshot_index raises
    # for logs-b AFTER logs-a succeeded
    snap = "nightly-2024.01.01-1704067200"
    os.makedirs(os.path.join(repo, snap, "logs-b"))
    with pytest.raises(Exception):
        execute_slm_policy(cat, "p", now=T0)
    # the partially-written logs-a dir was cleaned up; no history entry
    assert not os.path.exists(os.path.join(repo, snap, "logs-a"))
    assert get_slm_policy(cat, "p")["snapshots"] == []
    # the same now retries cleanly once the obstruction is gone
    os.rmdir(os.path.join(repo, snap, "logs-b"))
    out = execute_slm_policy(cat, "p", now=T0)
    assert sorted(out["indices"]) == ["logs-a", "logs-b"]


def test_execute_cleans_up_in_flight_partial_write(cat, tmp_path, spark, monkeypatch):
    """ADVICE r9-2: when snapshot_index itself raises MID-WRITE (the
    parquet write creates repo/<snap>/<idx>/ before finishing), the
    failure cleanup must remove the in-flight index's partial directory
    too — not just the `done` ones — or a same-`now` retry (the module's
    advertised idempotent-tick pattern) hits IndexExistsError forever."""
    df = spark.range(5).select(F.col("id").alias("k"))
    cat.write_index(df, "logs-b", mode="overwrite")
    put_slm_policy(cat, "p", _policy(tmp_path, max_count=5))
    repo = str(tmp_path / "repo")
    snap = "nightly-2024.01.01-1704067200"

    real = Catalog.snapshot_index

    def failing(self, name, repo_, snapshot):
        if name == "logs-b":
            # mimic a write that dies after creating the destination
            os.makedirs(os.path.join(repo_, snapshot, name), exist_ok=True)
            raise RuntimeError("disk full mid-write")
        return real(self, name, repo_, snapshot)

    monkeypatch.setattr(Catalog, "snapshot_index", failing)
    with pytest.raises(RuntimeError, match="disk full"):
        execute_slm_policy(cat, "p", now=T0)
    # BOTH the completed logs-a dir and the partial logs-b dir are gone
    assert not os.path.exists(os.path.join(repo, snap, "logs-a"))
    assert not os.path.exists(os.path.join(repo, snap, "logs-b"))
    assert get_slm_policy(cat, "p")["snapshots"] == []
    # the same explicit now retries cleanly with the real implementation
    monkeypatch.setattr(Catalog, "snapshot_index", real)
    out = execute_slm_policy(cat, "p", now=T0)
    assert sorted(out["indices"]) == ["logs-a", "logs-b"]


def test_execute_failure_keeps_foreign_obstruction(cat, tmp_path):
    """The flip side: when snapshot_index raises on its exists-check, the
    obstruction directory was NOT created by this call and must survive
    the cleanup (it may be someone else's real snapshot data)."""
    pol = _policy(tmp_path, max_count=5)
    put_slm_policy(cat, "p", pol)
    repo = str(tmp_path / "repo")
    snap = "nightly-2024.01.01-1704067200"
    foreign = os.path.join(repo, snap, "logs-a")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "keep.txt"), "w") as fh:
        fh.write("not yours")
    # the exact exception matters: a vacuous earlier failure (bad policy,
    # empty pattern) would skip the cleanup path this test pins
    with pytest.raises(IndexExistsError):
        execute_slm_policy(cat, "p", now=T0)
    assert os.path.exists(os.path.join(foreign, "keep.txt"))


def test_execute_cleans_up_on_save_failure(cat, tmp_path, monkeypatch):
    """Review r10a-1: a history-write (_save) failure AFTER every
    snapshot succeeded must also trigger the cleanup — completed dirs
    with no history entry are the wedged state (invisible to retention,
    same-now retry blocked) the all-or-nothing guard exists to prevent.
    The emptied snapshot parent dir goes too (r10a-4)."""
    import elasticsearch_hadoop_spark.slm as slm_mod

    put_slm_policy(cat, "p", _policy(tmp_path, max_count=5))
    repo = str(tmp_path / "repo")
    snap = "nightly-2024.01.01-1704067200"

    real_save = slm_mod._save
    calls = {"n": 0}

    def failing_save(catalog, state):
        calls["n"] += 1
        if calls["n"] == 1:  # the execute's save; later saves work
            raise OSError("disk full writing _slm.json")
        return real_save(catalog, state)

    monkeypatch.setattr(slm_mod, "_save", failing_save)
    with pytest.raises(OSError, match="disk full"):
        execute_slm_policy(cat, "p", now=T0)
    # dirs cleaned AND the snapshot-named parent removed
    assert not os.path.exists(os.path.join(repo, snap))
    assert get_slm_policy(cat, "p")["snapshots"] == []
    # same explicit now retries cleanly once saving works again
    out = execute_slm_policy(cat, "p", now=T0)
    assert out["snapshot_name"] == snap
