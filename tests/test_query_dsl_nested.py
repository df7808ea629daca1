"""`nested` query clause: the whole inner query must match the SAME array
element — the semantic that distinguishes ES nested docs from flattened
fields, and the reason a naive two-filter translation is wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query


@pytest.fixture(scope="module")
def orders_nested(spark):
    rows = [
        # doc 1: cheap widget + pricey gadget — NO single item is a pricey widget
        Row(oid=1, items=[Row(label="widget", price=5.0), Row(label="gadget", price=50.0)]),
        # doc 2: a genuinely pricey widget
        Row(oid=2, items=[Row(label="widget", price=99.0)]),
        # doc 3: empty items
        Row(oid=3, items=[]),
        # doc 4: null items
        Row(oid=4, items=None),
    ]
    return spark.createDataFrame(
        rows, "oid int, items array<struct<label: string, price: double>>"
    )


NESTED_Q = {
    "nested": {
        "path": "items",
        "query": {
            "bool": {
                "must": [
                    {"term": {"items.label": "widget"}},
                    {"range": {"items.price": {"gte": 10}}},
                ]
            }
        },
    }
}


def test_nested_matches_same_element_only(orders_nested):
    got = {r["oid"] for r in orders_nested.filter(compile_query(NESTED_Q)).collect()}
    # doc 1 would match a FLATTENED translation (has a widget, has a >=10
    # price) but must NOT match nested semantics
    assert got == {2}


def test_nested_bare_field_names(orders_nested):
    q = {"nested": {"path": "items", "query": {"term": {"label": "gadget"}}}}
    got = {r["oid"] for r in orders_nested.filter(compile_query(q)).collect()}
    assert got == {1}


def test_nested_empty_and_null_arrays_never_match(orders_nested):
    q = {"nested": {"path": "items", "query": {"match_all": {}}}}
    got = {r["oid"] for r in orders_nested.filter(compile_query(q)).collect()}
    assert got == {1, 2}  # 3 (empty) and 4 (null) excluded


def test_nested_composes_in_bool(orders_nested):
    q = {"bool": {"must_not": [NESTED_Q], "must": [{"exists": {"field": "items"}}]}}
    got = {r["oid"] for r in orders_nested.filter(compile_query(q)).collect()}
    assert got == {1, 3}


def test_nested_requires_path_and_query():
    with pytest.raises(QueryDslError):
        compile_query({"nested": {"path": "items"}})


def test_outer_fields_still_resolve_after_nested(orders_nested):
    """The resolver stack must pop cleanly: an outer clause compiled after
    a nested one resolves against top-level columns again."""
    q = {"bool": {"should": [NESTED_Q, {"term": {"oid": 3}}], "minimum_should_match": 1}}
    got = {r["oid"] for r in orders_nested.filter(compile_query(q)).collect()}
    assert got == {2, 3}
