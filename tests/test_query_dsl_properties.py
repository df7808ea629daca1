"""Property-based differential test of the query-DSL compiler (SURVEY.md §7
step 5: "pure function → property-test against the Column-API equivalents").

Hypothesis generates random DSL trees (term/terms/range/prefix/wildcard/
exists/ids/bool to depth 3); each is compiled to a Column and run on a fixed
dense DataFrame, and the surviving _ids must equal those picked by an
independent pure-Python evaluator implementing the documented semantics.
The data is non-null except the `n` column, which IS fuzzed (term clauses
over `n`): the compiler must reproduce ES missing-field semantics — a
NULL-evaluating clause counts as non-matching (0 in N-of should sums,
satisfied must_not), never NULL-poisoning the combinator."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.query_dsl import compile_query

STRINGS = ["", "a", "b", "ab", "ba", "aab", "abb", "bab"]
INTS = [-2, -1, 0, 1, 2, 3]
# multi-token text for match/match_phrase (same vocabulary both sides; the
# standard analyzer and the datasource _TOKEN_RE tokenize these identically)
TEXTS = [
    "quick brown fox",
    "quick dog",
    "brown dog jumps",
    "fox",
    "lazy quick brown",
    "dog fox quick",
    # prefix-token collision: phrase "brown fox" / match "fox" must NOT hit
    # "foxtrot" (token-boundary semantics, not substring)
    "brown foxtrot dog",
]

ROWS = [
    {
        "_id": f"id{i}",
        "s": s,
        "i": n,
        "n": (None if (i % 3 == 0) else i),
        "t": TEXTS[i % len(TEXTS)],
    }
    for i, (s, n) in enumerate((s, n) for s in STRINGS for n in INTS)
]


@pytest.fixture(scope="module")
def table(spark):
    df = spark.createDataFrame(
        [(r["_id"], r["s"], r["i"], r["n"], r["t"]) for r in ROWS],
        "`_id` string, s string, i int, n int, t string",
    )
    df.cache().count()
    return df


# ---- pure-Python reference evaluator ----------------------------------------


def _fv(body):
    ((f, v),) = body.items()
    if isinstance(v, dict) and "value" in v:
        v = v["value"]
    return f, v


def ev(clause, row):
    ((kind, body),) = clause.items()
    if kind == "term":
        f, v = _fv(body)
        return row[f] == v
    if kind == "terms":
        ((f, vs),) = body.items()
        return row[f] in list(vs)
    if kind == "range":
        ((f, bounds),) = body.items()
        x = row[f]
        ops = {
            "gt": lambda a, b: a > b,
            "gte": lambda a, b: a >= b,
            "lt": lambda a, b: a < b,
            "lte": lambda a, b: a <= b,
        }
        return all(ops[op](x, v) for op, v in bounds.items())
    if kind == "exists":
        return row[body["field"]] is not None
    if kind == "prefix":
        f, v = _fv(body)
        return row[f].startswith(str(v))
    if kind == "wildcard":
        f, v = _fv(body)
        pat = "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch) for ch in str(v)
        )
        return re.fullmatch(pat, row[f]) is not None
    if kind == "ids":
        return row["_id"] in list(body["values"])
    if kind == "match_all":
        return True
    if kind == "match":
        ((f, spec),) = body.items()
        op = "or"
        if isinstance(spec, dict):
            op = str(spec.get("operator", "or")).lower()
            spec = spec.get("query")
        qtok = [t for t in re.split(r"[^a-z0-9]+", str(spec).lower()) if t]
        ftok = [t for t in re.split(r"[^a-z0-9]+", str(row[f]).lower()) if t]
        if op == "and":
            return set(qtok) <= set(ftok)
        return bool(set(qtok) & set(ftok))
    if kind == "match_phrase":
        ((f, spec),) = body.items()
        if isinstance(spec, dict):
            spec = spec.get("query")
        qtok = [t for t in re.split(r"[^a-z0-9]+", str(spec).lower()) if t]
        ftok = [t for t in re.split(r"[^a-z0-9]+", str(row[f]).lower()) if t]
        needle = " " + " ".join(qtok) + " "
        hay = " " + " ".join(ftok) + " "
        return needle in hay
    if kind == "bool":
        as_list = lambda x: [] if x is None else (x if isinstance(x, list) else [x])  # noqa: E731
        if not all(ev(c, row) for c in as_list(body.get("must")) + as_list(body.get("filter"))):
            return False
        if any(ev(c, row) for c in as_list(body.get("must_not"))):
            return False
        should = as_list(body.get("should"))
        if should:
            msm = body.get("minimum_should_match")
            if msm is None:
                n_required = 0 if (body.get("must") or body.get("filter")) else 1
            else:
                n_required = int(msm)
            if n_required > len(should):
                return False  # Lucene MatchNoDocsQuery rewrite
            if n_required and sum(ev(c, row) for c in should) < n_required:
                return False
        return True
    if kind == "constant_score":
        return ev(body["filter"], row)
    raise AssertionError(f"unhandled clause {kind}")


# ---- clause strategies -------------------------------------------------------

s_val = st.sampled_from(STRINGS + ["c", "abc"])
i_val = st.sampled_from(INTS + [-7, 9])

term_c = st.one_of(
    s_val.map(lambda v: {"term": {"s": v}}),
    i_val.map(lambda v: {"term": {"i": v}}),
    s_val.map(lambda v: {"term": {"s": {"value": v}}}),
    # nullable column: NULL-evaluating clauses inside an N-of should sum
    # must count as 0, not poison the count (SQL three-valued logic)
    st.sampled_from([1, 4, 7, 10]).map(lambda v: {"term": {"n": v}}),
)
terms_c = st.one_of(
    st.lists(s_val, min_size=1, max_size=3).map(lambda vs: {"terms": {"s": vs}}),
    st.lists(i_val, min_size=1, max_size=3).map(lambda vs: {"terms": {"i": vs}}),
)
range_c = st.dictionaries(
    st.sampled_from(["gt", "gte", "lt", "lte"]), i_val, min_size=1, max_size=2
).map(lambda b: {"range": {"i": b}})
exists_c = st.sampled_from(["s", "i", "n"]).map(lambda f: {"exists": {"field": f}})
prefix_c = st.sampled_from(["", "a", "b", "ab"]).map(lambda v: {"prefix": {"s": v}})
wildcard_c = st.sampled_from(["*", "a*", "*b", "a?b", "?", "a*b", "ab"]).map(
    lambda v: {"wildcard": {"s": v}}
)
ids_c = st.lists(
    st.sampled_from([r["_id"] for r in ROWS[:8]] + ["nope"]), min_size=1, max_size=3
).map(lambda vs: {"ids": {"values": vs}})
m_val = st.sampled_from(
    ["quick", "fox", "brown dog", "quick fox", "cat", "lazy brown", "dog"]
)
match_c = st.one_of(
    m_val.map(lambda v: {"match": {"t": v}}),
    m_val.map(lambda v: {"match": {"t": {"query": v}}}),
    st.tuples(m_val, st.sampled_from(["and", "or"])).map(
        lambda t: {"match": {"t": {"query": t[0], "operator": t[1]}}}
    ),
)
phrase_c = st.one_of(
    m_val.map(lambda v: {"match_phrase": {"t": v}}),
    m_val.map(lambda v: {"match_phrase": {"t": {"query": v}}}),
)
leaf = st.one_of(
    term_c, terms_c, range_c, exists_c, prefix_c, wildcard_c, ids_c,
    match_c, phrase_c,
    st.just({"match_all": {}}),
)


def bool_of(children):
    @st.composite
    def build(draw):
        body = {}
        for key in ("must", "filter", "should", "must_not"):
            if draw(st.booleans()):
                body[key] = draw(st.lists(children, min_size=1, max_size=3))
        if body.get("should") and draw(st.booleans()):
            # integer N-of semantics, incl. N > len(should) (clamped) and
            # the string-integer spelling ES accepts
            n = draw(st.sampled_from([1, 2, 3, "1", "2"]))
            body["minimum_should_match"] = n
        if not body:
            body["must"] = [draw(children)]
        node = {"bool": body}
        # occasionally wrap in the scoring no-op — compiler, reference
        # evaluator, and match_doc must all see through it
        if draw(st.booleans()) and draw(st.booleans()):
            node = {"constant_score": {"filter": node}}
        return node

    return build()


clause = st.recursive(leaf, bool_of, max_leaves=6)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(q=clause)
def test_compiler_matches_reference_evaluator(table, q):
    got = {r["_id"] for r in table.filter(compile_query(q)).select("_id").collect()}
    expect = {r["_id"] for r in ROWS if ev(q, r)}
    assert got == expect, f"query {q}: spark={sorted(got)} expect={sorted(expect)}"
    # three-way: the esdocs datasource's Python-side evaluator implements
    # the same subset — all three implementations must agree
    from elasticsearch_hadoop_spark.sources.es_datasource import match_doc

    via_docs = {r["_id"] for r in ROWS if match_doc(r, q)}
    assert via_docs == expect, f"match_doc diverges on {q}: {sorted(via_docs)}"
