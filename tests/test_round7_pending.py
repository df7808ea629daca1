"""Round-7 pending corpus queries: each must already hash-match its
DuckDB oracle through the driver-equivalent harness, so registering them
in round 7 is a PRIORITY edit, not new risk.  Also pins that load_all
does NOT import the pending module (the round-6 graded window is
frozen).

Importing the pending module fills the shared REGISTRY, which other
tests (registration order, spread gate) iterate — so this module
imports it through a module-scoped fixture that REMOVES the pending
entries again on teardown.  No importlib.reload: reloading the corpus
package rebinds REGISTRY and breaks every later load_all() in the
session (found the hard way — two spread-gate tests failed only in the
full run)."""

import sys

import pytest

import tests.oracle_harness as oh

PENDING = [
    "esql_inlinestats", "esql_fork", "aggs_categorize_text",
    "aggs_fis_multi_field", "watcher_bulk_fire", "ingest_round6_chain",
    "ingest_user_agent", "ingest_geoip", "writepath_ilm_tick",
    "search_async_roundtrip", "esql_cidr_match",
    "transform_sync_retention", "esql_from_metadata", "ingest_terminate_reroute",
    "esql_date_mv_functions", "query_dsl_geo_shape", "esql_mv_sort_slice",
    "multimodal_bmp_decode",
]

_MOD = "elasticsearch_hadoop_spark.corpus.round7_pending"


@pytest.fixture(scope="module")
def pending_registry():
    from elasticsearch_hadoop_spark.corpus import REGISTRY

    preexisting = set(REGISTRY)
    import elasticsearch_hadoop_spark.corpus.round7_pending  # noqa: F401

    yield REGISTRY
    # leave the session REGISTRY exactly as found
    for n in set(REGISTRY) - preexisting:
        REGISTRY.pop(n, None)
    sys.modules.pop(_MOD, None)


def test_pending_module_not_wired_into_load_all():
    import inspect

    from elasticsearch_hadoop_spark import corpus

    src = inspect.getsource(corpus.load_all)
    assert "round7_pending" not in src, (
        "round7_pending reached load_all — if this is the round-7 "
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
    # the same float lint test_oracle_lint applies to registered oracles:
    # every float the oracle emits must already be round(_, 6)-stable
    import math

    res = duck.execute(pending_registry[name].oracle)
    for row in res.fetchall()[:2000]:
        for v in row:
            if isinstance(v, float) and math.isfinite(v):
                assert round(v, 6) == v, (name, v)
