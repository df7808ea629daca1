"""Round-8 pending corpus queries: each must already hash-match its
DuckDB oracle through the driver-equivalent harness, so registering them
in round 8 is a PRIORITY edit, not new risk.  Also pins that load_all
does NOT import the pending module (the round-7 graded window is full).

Imports the pending module through a module-scoped fixture that REMOVES
its REGISTRY entries on teardown — never importlib.reload (it rebinds
REGISTRY and breaks every later load_all() in the session)."""

import math
import sys

import pytest

import tests.oracle_harness as oh

PENDING = ["ingest_circle_geogrid", "writepath_pit_search_after",
           "ingest_geohash_decode", "esql_match_colon"]

_MOD = "elasticsearch_hadoop_spark.corpus.round8_pending"


@pytest.fixture(scope="module")
def pending_registry():
    from elasticsearch_hadoop_spark.corpus import REGISTRY

    preexisting = set(REGISTRY)
    import elasticsearch_hadoop_spark.corpus.round8_pending  # noqa: F401

    yield REGISTRY
    for n in set(REGISTRY) - preexisting:
        REGISTRY.pop(n, None)
    sys.modules.pop(_MOD, None)


def test_pending_module_not_wired_into_load_all():
    import inspect

    from elasticsearch_hadoop_spark import corpus

    src = inspect.getsource(corpus.load_all)
    assert "round8_pending" not in src, (
        "round8_pending reached load_all — if this is the round-8 "
        "registration, move these queries into PRIORITY, give them graded "
        "window slots, and delete this pending scaffolding"
    )
    assert all(n not in corpus.PRIORITY for n in PENDING)


@pytest.mark.parametrize("name", PENDING)
def test_pending_query_matches_oracle(name, pending_registry, spark, sf_dir, duck):
    ok, msg = oh.compare(pending_registry[name], spark, sf_dir, duck)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", PENDING)
def test_pending_oracle_floats_rounded(name, pending_registry, duck):
    res = duck.execute(pending_registry[name].oracle)
    for row in res.fetchall()[:2000]:
        for v in row:
            if isinstance(v, float) and math.isfinite(v):
                assert round(v, 6) == v, (name, v)
