"""Differential property test: the Column-compiled query DSL
(`query_dsl.compile_query`, the Spark execution path) against the
doc-level Python evaluator (`es_datasource.match_doc`, the pushdown
path) — two independent implementations of the same ES subset, driven
by hypothesis-generated queries over a fixed document pool.  A
divergence means a filter pushed into the esdocs source would return
different rows than the same filter evaluated post-scan by Spark —
exactly the class of bug the reference's integration suite hunts."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.query_dsl import compile_query
from elasticsearch_hadoop_spark.sources.es_datasource import match_doc

DOCS = [
    {"doc_id": i, "name": n, "score": s, "tag": t}
    for i, (n, s, t) in enumerate(
        [
            ("alpha beta", 1, "a"),
            ("beta gamma", 2, "b"),
            ("gamma alpha beta", 3, "a"),
            ("delta", 4, None),
            ("alpha", 5, "c"),
            ("Beta Alpha", 2, "b"),
            ("epsilon zeta", 0, "a"),
            ("", 3, "b"),
        ]
    )
]


@pytest.fixture(scope="module")
def table(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.LongType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(d["doc_id"], d["name"], d["score"], d["tag"]) for d in DOCS], schema
    )
    df.cache().count()
    return df


# ---- strategies: the leaf clauses both evaluators support --------------------

_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "zeta", "missing"])
_tags = st.sampled_from(["a", "b", "c", "z"])
_nums = st.integers(min_value=-1, max_value=6)

term_q = st.one_of(
    _tags.map(lambda v: {"term": {"tag": v}}),
    _nums.map(lambda v: {"term": {"score": v}}),
)
terms_q = st.lists(_tags, min_size=1, max_size=3).map(
    lambda vs: {"terms": {"tag": vs}}
)
range_q = st.tuples(_nums, _nums, st.booleans(), st.booleans()).map(
    lambda t: {
        "range": {
            "score": {
                ("gte" if t[2] else "gt"): min(t[0], t[1]),
                ("lte" if t[3] else "lt"): max(t[0], t[1]),
            }
        }
    }
)
exists_q = st.sampled_from(["tag", "name", "score"]).map(
    lambda f: {"exists": {"field": f}}
)
prefix_q = st.sampled_from(["al", "be", "ga", "x"]).map(
    lambda p: {"prefix": {"name": p}}
)
wildcard_q = st.sampled_from(["al*", "*eta", "a?pha*", "*amma*"]).map(
    lambda p: {"wildcard": {"name": p}}
)
match_q = st.tuples(
    st.lists(_words, min_size=1, max_size=2), st.sampled_from(["or", "and"])
).map(lambda t: {"match": {"name": {"query": " ".join(t[0]), "operator": t[1]}}})
match_msm_q = st.tuples(
    st.lists(_words, min_size=1, max_size=3),
    st.sampled_from([1, 2, 3, -1, "50%", "66%", "100%", "-25%"]),
).map(lambda t: {"match": {"name": {"query": " ".join(t[0]),
                                    "minimum_should_match": t[1]}}})
phrase_q = st.sampled_from(
    ["alpha beta", "beta gamma", "gamma beta", "alpha"]
).map(lambda p: {"match_phrase": {"name": p}})
# zero-token and punctuation-laced query text: both evaluators must agree
# on the MatchNoDocs / zero_terms_query=all rewrite (round-6 fix) and on
# the analyzer's punctuation stripping
match_zero_q = st.tuples(
    st.sampled_from(["", "...", "!!! ---", "alpha!!!", "++beta++ gamma"]),
    st.sampled_from(["or", "and"]),
    st.sampled_from(["none", "all"]),
).map(
    lambda t: {
        "match": {
            "name": {
                "query": t[0],
                "operator": t[1],
                "zero_terms_query": t[2],
            }
        }
    }
)
phrase_zero_q = st.sampled_from(["", "??", "alpha!beta"]).map(
    lambda p: {"match_phrase": {"name": {"query": p}}}
)
# fuzzy match: per-token edit budgets (AUTO or fixed) — "zeta" is 1 edit
# from "beta", "alpha" 2 from "alXXa", so the pool exercises real hits
match_fuzzy_q = st.tuples(
    st.lists(st.sampled_from(["alpha", "beta", "zeta", "bta", "alpa"]),
             min_size=1, max_size=2),
    st.sampled_from(["AUTO", 0, 1, 2]),
    st.sampled_from(["or", "and"]),
).map(
    lambda t: {
        "match": {
            "name": {
                "query": " ".join(t[0]),
                "fuzziness": t[1],
                "operator": t[2],
            }
        }
    }
)

leaf = st.one_of(
    term_q, terms_q, range_q, exists_q, prefix_q, wildcard_q, match_q,
    match_msm_q, phrase_q, match_zero_q, phrase_zero_q, match_fuzzy_q
)


def bool_q(children):
    return st.tuples(
        st.lists(children, max_size=2),
        st.lists(children, max_size=2),
        st.lists(children, max_size=1),
        st.lists(children, max_size=2),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    ).map(
        lambda t: {
            "bool": {
                k: v
                for k, v in (
                    ("must", t[0]),
                    ("filter", t[1]),
                    ("must_not", t[2]),
                    ("should", t[3]),
                    ("minimum_should_match", t[4]),
                )
                if v not in ([], None)
            }
        }
    ).filter(lambda q: q["bool"])


query_tree = st.recursive(leaf, bool_q, max_leaves=6)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(q=query_tree)
def test_column_and_doc_evaluators_agree(table, q):
    spark_ids = sorted(
        r["doc_id"] for r in table.filter(compile_query(q)).collect()
    )
    doc_ids = sorted(d["doc_id"] for d in DOCS if match_doc(d, q))
    assert spark_ids == doc_ids, f"query={q}"
