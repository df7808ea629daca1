"""Round-7 pending corpus queries: each must already hash-match its
DuckDB oracle through the driver-equivalent harness, so registering them
in round 7 is a PRIORITY edit, not new risk.  Also pins that the module
is NOT registered this round (the graded window is frozen)."""

import pytest

import tests.oracle_harness as oh


def _pending_specs():
    from elasticsearch_hadoop_spark.corpus import REGISTRY
    from elasticsearch_hadoop_spark.corpus import round7_pending  # noqa: F401

    names = [
        "esql_inlinestats", "esql_fork", "aggs_categorize_text",
        "aggs_fis_multi_field", "watcher_bulk_fire", "ingest_round6_chain",
        "ingest_user_agent", "ingest_geoip", "writepath_ilm_tick",
        "search_async_roundtrip",
    ]
    return [REGISTRY[n] for n in names]


def test_pending_module_not_registered_by_load_all():
    # load_all must NOT pick these up while the round-6 freeze holds —
    # an unregistered pending module is the whole point
    import importlib

    import elasticsearch_hadoop_spark.corpus as corpus

    importlib.reload(corpus)  # fresh REGISTRY without the pending import
    names = set(corpus.load_all())
    assert "esql_inlinestats" not in names
    assert "watcher_bulk_fire" not in names
    # restore: re-import pending for the parametrized tests below
    import elasticsearch_hadoop_spark.corpus.round7_pending  # noqa: F401


@pytest.mark.parametrize("spec", _pending_specs(), ids=lambda s: s.name)
def test_pending_query_matches_oracle(spec, spark, sf_dir, duck):
    ok, msg = oh.compare(spec, spark, sf_dir, duck)
    assert ok, f"{spec.name}: {msg}"
