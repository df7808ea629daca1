"""Lucene span-query family: position-aware matching as Column math over
analyzed token positions (query_dsl._span_compile)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query


def _match(spark, texts, query):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    rows = df.filter(compile_query(query)).select("i").collect()
    return sorted(r["i"] for r in rows)


def test_span_term_and_first(spark):
    texts = ["alpha beta gamma", "beta alpha", "gamma delta"]
    assert _match(spark, texts, {"span_term": {"text": "beta"}}) == [0, 1]
    # span_first: span must END within the first `end` positions
    q = {"span_first": {"match": {"span_term": {"text": "beta"}}, "end": 1}}
    assert _match(spark, texts, q) == [1]


def test_span_near_in_order_slop(spark):
    texts = [
        "quick brown fox",          # quick..fox gap 1
        "quick fox",                # gap 0
        "fox quick",                # wrong order
        "quick red sly brown fox",  # gap 3
    ]
    def q(slop):
        return {"span_near": {
            "clauses": [
                {"span_term": {"text": "quick"}},
                {"span_term": {"text": "fox"}},
            ],
            "slop": slop, "in_order": True,
        }}
    assert _match(spark, texts, q(0)) == [1]
    assert _match(spark, texts, q(1)) == [0, 1]
    assert _match(spark, texts, q(3)) == [0, 1, 3]


def test_span_near_three_clause_gap_is_total(spark):
    texts = ["a x b y c", "a b c", "a x x b c"]
    def q(slop):
        return {"span_near": {
            "clauses": [
                {"span_term": {"text": "a"}},
                {"span_term": {"text": "b"}},
                {"span_term": {"text": "c"}},
            ],
            "slop": slop, "in_order": True,
        }}
    assert _match(spark, texts, q(0)) == [1]
    assert _match(spark, texts, q(2)) == [0, 1, 2]  # total intervening <= 2


def test_span_near_unordered_two_clauses(spark):
    texts = ["alpha beta", "beta alpha", "beta gap gap alpha", "alpha"]
    def q(slop, in_order=False):
        return {"span_near": {
            "clauses": [
                {"span_term": {"text": "alpha"}},
                {"span_term": {"text": "beta"}},
            ],
            "slop": slop, "in_order": in_order,
        }}
    assert _match(spark, texts, q(0)) == [0, 1]
    assert _match(spark, texts, q(2)) == [0, 1, 2]


def test_span_near_unordered_n_way(spark):
    """Round-7 generalization past the 2-clause subset: n pairwise
    non-overlapping spans whose bounding window's gap fits the slop."""
    texts = [
        "alpha beta gamma",          # any order, adjacent: gap 0
        "gamma alpha beta",          # permuted: gap 0
        "gamma x alpha y beta",      # window 5, lens 3 -> gap 2
        "alpha beta",                # gamma missing
        "alpha gamma",               # beta missing
        "beta gamma x x x x alpha",  # gap 4
    ]

    def q(slop):
        return {"span_near": {
            "clauses": [
                {"span_term": {"text": "alpha"}},
                {"span_term": {"text": "beta"}},
                {"span_term": {"text": "gamma"}},
            ],
            "slop": slop, "in_order": False,
        }}

    assert _match(spark, texts, q(0)) == [0, 1]
    assert _match(spark, texts, q(2)) == [0, 1, 2]
    assert _match(spark, texts, q(4)) == [0, 1, 2, 5]
    # a repeated clause needs DISTINCT (non-overlapping) occurrences
    rep = {"span_near": {"clauses": [
        {"span_term": {"text": "alpha"}},
        {"span_term": {"text": "alpha"}},
    ], "slop": 5, "in_order": False}}
    assert _match(spark, ["alpha beta alpha", "alpha beta"], rep) == [0]
    # a later span may legally sit INSIDE the current bounding window:
    # the intermediate (a, z) pair has gap 3 > slop 2, but m fills a hole
    # and the final window "a x m x z" has gap 2 — premature slop pruning
    # after the second clause would wrongly drop this match
    hole = {"span_near": {"clauses": [
        {"span_term": {"text": "a"}},
        {"span_term": {"text": "z"}},
        {"span_term": {"text": "m"}},
    ], "slop": 2, "in_order": False}}
    assert _match(spark, ["a x m x z", "a m x x x z"], hole) == [0]
    # combinatorial cap: > 8 unordered clauses reject loudly
    with pytest.raises(QueryDslError, match="product"):
        compile_query({"span_near": {
            "clauses": [{"span_term": {"text": f"t{i}"}} for i in range(9)],
            "in_order": False,
        }})


def test_span_or_and_not(spark):
    texts = ["alpha beta", "gamma beta", "alpha", "delta"]
    q_or = {"span_or": {"clauses": [
        {"span_term": {"text": "alpha"}},
        {"span_term": {"text": "gamma"}},
    ]}}
    assert _match(spark, texts, q_or) == [0, 1, 2]
    # alpha NOT adjacent-followed by beta: exclude alpha spans overlapping
    # a window extended `post` past the span end
    q_not = {"span_not": {
        "include": {"span_term": {"text": "alpha"}},
        "exclude": {"span_term": {"text": "beta"}},
        "post": 1,
    }}
    assert _match(spark, texts, q_not) == [2]


def test_span_containing_within(spark):
    texts = ["big alpha end", "big end alpha", "alpha big end"]
    near = {"span_near": {"clauses": [
        {"span_term": {"text": "big"}},
        {"span_term": {"text": "end"}},
    ], "slop": 1, "in_order": True}}
    q_cont = {"span_containing": {"big": near, "little": {"span_term": {"text": "alpha"}}}}
    # only texts[0]'s (big..end) span (0,3) contains an alpha span; in
    # texts[1] alpha@(2,3) sits past the (0,2) near span, in texts[2]
    # before it
    assert _match(spark, texts, q_cont) == [0]
    q_within = {"span_within": {"big": near, "little": {"span_term": {"text": "alpha"}}}}
    assert _match(spark, texts, q_within) == [0]


def test_span_multi_prefix_and_fuzzy(spark):
    texts = ["prefix match", "pretend nothing", "other"]
    q = {"span_multi": {"match": {"prefix": {"text": "pre"}}}}
    assert _match(spark, texts, q) == [0, 1]
    qf = {"span_near": {"clauses": [
        {"span_multi": {"match": {"fuzzy": {"text": {"value": "matxh"}}}}},
    ], "slop": 0, "in_order": True}}
    with pytest.raises(QueryDslError):
        compile_query(qf)  # span_near needs >= 2 clauses
    qf2 = {"span_multi": {"match": {"fuzzy": {"text": {"value": "matxh"}}}}}
    assert _match(spark, texts, qf2) == [0]


def test_span_field_masking_delegates(spark):
    texts = ["alpha beta"]
    q = {"span_near": {"clauses": [
        {"span_term": {"text": "alpha"}},
        {"field_masking_span": {"query": {"span_term": {"text": "beta"}}, "field": "text"}},
    ], "slop": 0, "in_order": True}}
    assert _match(spark, texts, q) == [0]


def test_span_null_text_is_false(spark):
    df = spark.createDataFrame([(0, None), (1, "alpha")], "i int, text string")
    rows = df.filter(compile_query({"span_term": {"text": "alpha"}})).collect()
    assert [r["i"] for r in rows] == [1]


def test_explain_query_bool_verdicts(spark):
    from elasticsearch_hadoop_spark.query_dsl import explain_query

    df = spark.createDataFrame(
        [(1, "error fatal", 9.0), (2, "ok", 1.0)], "id int, msg string, sev double"
    )
    out = {r["id"]: r for r in explain_query(
        df,
        {"bool": {
            "must": [{"match": {"msg": "error"}}],
            "filter": [{"range": {"sev": {"gte": 5}}}],
            "must_not": [{"term": {"msg": "ok"}}],
        }},
    ).collect()}
    r1 = out[1]
    assert r1["must_0"] and r1["filter_0"] and r1["must_not_0"] and r1["matched"]
    r2 = out[2]
    assert not r2["must_0"] and not r2["filter_0"] and not r2["must_not_0"]
    assert not r2["matched"]
    # non-bool: single clause verdict
    single = explain_query(df, {"term": {"id": 1}}).collect()
    assert {r["id"]: r["term_0"] for r in single} == {1: True, 2: False}


def test_span_two_phase_guard_in_plan(spark):
    """Round-5 hardening (VERDICT r4 item 5): span predicates carry a
    cheap substring pre-guard (Lucene's TwoPhaseIterator split) so the
    position HOFs short-circuit on non-candidate docs, and the compiled
    expression stays bounded.  Pin the guard's presence, its absence for
    unguardable trees, and the semantics staying exact."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta alpha"), (3, "nothing here"),
         (4, None)],
        "id int, text string",
    )
    q = {"span_near": {"clauses": [{"span_term": {"text": "alpha"}},
                                   {"span_term": {"text": "beta"}}],
                       "slop": 0, "in_order": True}}
    pred = compile_query(q)
    # guard is visible in the expression text as Contains over lower()
    expr_text = str(pred._jc)
    assert "contains" in expr_text.lower()
    got = sorted(r["id"] for r in df.filter(pred).collect())
    assert got == [1]
    # a span_multi wildcard leaf voids the guard but still evaluates
    q2 = {"span_near": {"clauses": [
        {"span_multi": {"match": {"wildcard": {"text": "alph*"}}}},
        {"span_term": {"text": "beta"}}], "slop": 0, "in_order": True}}
    got2 = sorted(r["id"] for r in df.filter(compile_query(q2)).collect())
    assert got2 == [1]
    # span_or guard is the OR of alternatives
    q3 = {"span_or": {"clauses": [{"span_term": {"text": "gamma"}},
                                  {"span_term": {"text": "nothing"}}]}}
    got3 = sorted(r["id"] for r in df.filter(compile_query(q3)).collect())
    assert got3 == [1, 3]


def test_span_near_clause_cap(spark):
    from elasticsearch_hadoop_spark.query_dsl import (
        QueryDslError,
        compile_query,
        get_span_near_max_clauses,
        set_span_near_max_clauses,
    )

    def near(n):
        return {"span_near": {"clauses": [{"span_term": {"text": f"t{i}"}}
                                          for i in range(n)],
                              "slop": 1, "in_order": True}}

    cap = get_span_near_max_clauses()
    # the cap is configurable (ADVICE r5): a low override rejects at the
    # new bound, and restoring the default admits the same query
    try:
        set_span_near_max_clauses(4)
        with pytest.raises(QueryDslError, match="exceeds the configured maximum"):
            compile_query(near(5))
        compile_query(near(4))  # at the cap: compiles without raising
        with pytest.raises(ValueError):
            set_span_near_max_clauses(1)
    finally:
        set_span_near_max_clauses(cap)
    compile_query(near(5))  # default cap admits it again


def test_span_plan_size_bounded(spark):
    """Plan-size regression guard: the optimized plan for the bench
    span_near shape (2 two-term trees over documents) must stay bounded —
    a regression that re-inlines the analyzer per leaf (the O(n^2) trap)
    or duplicates trees beyond filter+project blows this up by 10x."""
    import elasticsearch_hadoop_spark.corpus as C

    C.load_all()
    df = C.REGISTRY["query_dsl_span_near"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000, len(plan)
    # the analyzer split appears once per tree per operator (2 trees in
    # the pushed filter + 2 in the project), never per span leaf
    assert plan.count("a-z0-9") <= 8, plan.count("a-z0-9")


def test_sqs_negation_is_must_not(spark):
    """Round-5 semantics fix: a '-' unit is MUST_NOT at the boolean level
    (Lucene SimpleQueryParser) — under default_operator=or, "beta -alpha"
    still excludes alpha docs instead of or-ing in their complement; a
    pure-negative query matches nothing; a lone '-' is dropped."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta only"), (3, "alphabet soup"),
         (4, None)],
        "id int, text string",
    )

    def got(q, op="or"):
        return sorted(r["id"] for r in df.filter(compile_query(
            {"simple_query_string": {
                "query": q, "fields": ["text"], "default_operator": op}}
        )).collect())

    assert got("beta -alpha") == [2]
    assert got("beta -alpha", op="and") == [2]
    assert got("beta | soup -alpha") == [2, 3]  # (beta|soup) AND NOT alpha
    assert got("-alpha") == []                 # pure negative: no match
    assert got("beta -") == [1, 2]             # lone '-' dropped
    assert got('beta -"alpha beta"') == [2]    # negated phrase


def test_msm_percentage_and_negative_forms(spark):
    """minimum_should_match simple forms, computed exactly as Lucene's
    calculateMinShouldMatch: "66%" of 3 clauses -> trunc(1.98) = 1
    required; "-25%" -> 3 + trunc(-0.75) = 3 required; -1 -> 2 required;
    100% -> all 3."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b x"), (3, "a x y"), (4, "x y z")],
        "id int, t string",
    )

    def got(msm):
        q = {"bool": {"should": [{"match": {"t": "a"}}, {"match": {"t": "b"}},
                                 {"match": {"t": "c"}}],
                      "minimum_should_match": msm}}
        return sorted(r["id"] for r in df.filter(compile_query(q)).collect())

    assert got("66%") == [1, 2, 3]     # 1 of 3 required
    assert got("100%") == [1]          # all 3
    assert got("-25%") == [1]          # 3 + trunc(-0.75) = 3 required
    assert got(-1) == [1, 2]           # 3 - 1 = 2 required
    assert got("-100%") == [1, 2, 3, 4]  # 0 required: optional
    # the doc evaluator shares _msm_count — spot-check agreement
    from elasticsearch_hadoop_spark.sources.es_datasource import match_doc

    docs = [{"id": 1, "t": "a b c"}, {"id": 3, "t": "a x y"},
            {"id": 4, "t": "x y z"}]
    q = {"bool": {"should": [{"match": {"t": "a"}}, {"match": {"t": "b"}},
                             {"match": {"t": "c"}}],
                  "minimum_should_match": "66%"}}
    assert [d["id"] for d in docs if match_doc(d, q)] == [1, 3]


def test_match_minimum_should_match(spark):
    """ES `match` minimum_should_match: at least k of the analyzed query
    tokens must be present (OR mode); ignored under operator=and; a count
    above the token count matches nothing (MatchNoDocsQuery)."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "a x y z"), (4, None)],
        "id int, t string",
    )

    def got(spec):
        return sorted(r["id"] for r in df.filter(
            compile_query({"match": {"t": spec}})).collect())

    assert got({"query": "a b c", "minimum_should_match": 2}) == [1, 2]
    assert got({"query": "a b c", "minimum_should_match": "66%"}) == [1, 2, 3]
    assert got({"query": "a b c", "minimum_should_match": 4}) == []
    assert got({"query": "a b c", "minimum_should_match": 2,
                "operator": "and"}) == [1]  # msm ignored under and


def test_multi_match_minimum_should_match(spark):
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    df = spark.createDataFrame(
        [(1, "a b", "c d"), (2, "a x", "y z"), (3, "x y", "z w")],
        "id int, f1 string, f2 string",
    )

    def got(body):
        return sorted(r["id"] for r in df.filter(
            compile_query({"multi_match": body})).collect())

    # best_fields: msm applies per field — doc 1 has 2 of a,b,c in NO
    # single field? f1='a b' holds a,b -> 2 >= 2 matches
    base = {"query": "a b c", "fields": ["f1", "f2"]}
    assert got({**base, "minimum_should_match": 2}) == [1]
    # cross_fields: tokens blend across fields — doc 1 has a,b,c,d
    cf = {**base, "type": "cross_fields"}
    assert got({**cf, "minimum_should_match": 3}) == [1]
    assert got({**cf, "minimum_should_match": 1}) == [1, 2]
    assert got({**cf, "minimum_should_match": 4}) == []


def test_case_insensitive_term_level_option(spark):
    """ES 7.10+ case_insensitive on term/prefix/wildcard/regexp (long
    form) — previously silently ignored; both evaluators honor it now."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query
    from elasticsearch_hadoop_spark.sources.es_datasource import match_doc

    df = spark.createDataFrame(
        [(1, "Alpha"), (2, "ALPHA"), (3, "beta")], "id int, s string"
    )
    queries = [
        {"term": {"s": {"value": "alpha", "case_insensitive": True}}},
        {"prefix": {"s": {"value": "aL", "case_insensitive": True}}},
        {"wildcard": {"s": {"value": "al*a", "case_insensitive": True}}},
        {"regexp": {"s": {"value": "alph.", "case_insensitive": True}}},
    ]
    docs = [{"id": 1, "s": "Alpha"}, {"id": 2, "s": "ALPHA"},
            {"id": 3, "s": "beta"}]
    for q in queries:
        got = sorted(r["id"] for r in df.filter(compile_query(q)).collect())
        assert got == [1, 2], q
        assert [d["id"] for d in docs if match_doc(d, q)] == [1, 2], q
    # without the flag the old exact semantics hold
    strict = {"term": {"s": {"value": "alpha"}}}
    assert df.filter(compile_query(strict)).count() == 0
    assert not any(match_doc(d, strict) for d in docs)


@settings(max_examples=40, deadline=None)
@given(
    tokens=st.lists(st.sampled_from(list("abcx")), min_size=1, max_size=12),
    slop=st.integers(min_value=0, max_value=4),
    terms=st.lists(st.sampled_from(list("abc")), min_size=2, max_size=3),
)
def test_span_near_unordered_matches_bruteforce(spark, tokens, slop, terms):
    """The n-way unordered fold vs a brute-force reference: enumerate
    every way to pick one position per clause, require pairwise-distinct
    positions (single-token spans -> non-overlap == distinct), window
    gap = (max - min + 1) - n <= slop."""
    import itertools

    text = " ".join(tokens)
    pos = {t: [i for i, x in enumerate(tokens) if x == t] for t in set(terms)}
    want = any(
        len(set(combo)) == len(combo)
        and (max(combo) - min(combo) + 1) - len(combo) <= slop
        for combo in itertools.product(*(pos[t] for t in terms))
    ) if all(pos[t] for t in set(terms)) else False
    got = _match(
        spark,
        [text],
        {"span_near": {
            "clauses": [{"span_term": {"text": t}} for t in terms],
            "slop": slop, "in_order": False,
        }},
    ) == [0]
    assert got == want, (text, terms, slop)
