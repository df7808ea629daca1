"""Property-based differential test of the ES|QL expression translator
(`esql._translate_expr` via the full pipeline): hypothesis generates
string literals — including ones containing ``==``, ``!=``, whitelisted
function names, and wildcard metacharacters — plus LIKE/RLIKE patterns,
and checks the compiled WHERE against a Python reference implementing
the documented semantics (exact equality on literal CONTENT; Lucene-style
``*``/``?`` LIKE wildcards with ``%``/``_`` literal; fully-anchored
RLIKE).  This pins the round-5 literal-masking rewrite: no operator or
function-name rewrite may ever touch quoted content."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.esql import esql

# characters the mask regex admits inside literals (no quotes of either
# kind — the masker normalizes double->single and can't hold embedded
# doubles — no backslashes, no NULs) plus the hazard substrings the old
# translator corrupted
_CHARS = st.text(
    alphabet="abcxyz019 =!<>*?%_().,-+/",
    min_size=0,
    max_size=12,
).filter(lambda s: "\\" not in s and '"' not in s and "'" not in s)
_HAZARDS = st.sampled_from(
    ["a==b", "x!=y", "round(", "like", "concat(x)", "a = b", "*", "?",
     "100%", "_x_", "<= 5", "it is"]
)
_LIT = st.one_of(_CHARS, _HAZARDS)


@pytest.fixture(scope="module")
def corpus(spark):
    """One column of candidate strings the generated predicates run over —
    a fixed pool guaranteeing collisions with generated literals."""
    pool = [
        "a==b", "a = b", "x!=y", "round(", "like", "100%", "_x_", "*",
        "?", "ab", "abc", "abcd", "a?c", "a*c", "", "it is", "<= 5",
        "foo", "foobar", "f_o", "fxo",
    ]
    df = spark.createDataFrame([(s,) for s in pool], "s string")
    df.cache().count()
    return df, pool


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(lit=_LIT)
def test_equality_matches_literal_content(corpus, lit):
    df, pool = corpus
    got = esql(
        f'FROM t | WHERE s == "{lit}" | STATS n = COUNT(*)', tables={"t": df}
    ).collect()[0]["n"]
    assert got == sum(1 for s in pool if s == lit), f"lit={lit!r}"
    got_ne = esql(
        f'FROM t | WHERE s != "{lit}" | STATS n = COUNT(*)', tables={"t": df}
    ).collect()[0]["n"]
    assert got_ne == sum(1 for s in pool if s != lit), f"lit={lit!r}"


_PAT = st.text(alphabet="abfxoc*?%_ ", min_size=0, max_size=8).filter(
    lambda s: "\\" not in s
)


def _esql_like_ref(pat: str, s: str) -> bool:
    rx = "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pat
    )
    return re.fullmatch(rx, s) is not None


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pat=_PAT)
def test_like_matches_lucene_wildcard_reference(corpus, pat):
    df, pool = corpus
    got = sorted(
        r["s"]
        for r in esql(
            f'FROM t | WHERE s LIKE "{pat}" | KEEP s', tables={"t": df}
        ).collect()
    )
    expect = sorted(s for s in pool if _esql_like_ref(pat, s))
    assert got == expect, f"pat={pat!r}"


_RX = st.text(alphabet="abfxoc.", min_size=1, max_size=6).map(
    lambda s: s + (".*" if s.endswith(".") else "")
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rx=_RX)
def test_rlike_is_whole_string_match(corpus, rx):
    df, pool = corpus
    got = sorted(
        r["s"]
        for r in esql(
            f'FROM t | WHERE s RLIKE "{rx}" | KEEP s', tables={"t": df}
        ).collect()
    )
    expect = sorted(s for s in pool if re.fullmatch(rx, s) is not None)
    assert got == expect, f"rx={rx!r}"


@settings(max_examples=200, deadline=None)
@given(
    e=st.lists(
        st.sampled_from(
            list("abcxyz_0123456789 +-*/%(),.<>=!\"'|&:[]")
            + ["CASE(", "MV_SUM(", "MV_SORT(", "CIDR_MATCH(", "DATE_DIFF(",
               "LOCATE(", "BUCKET(", "LIKE ", "RLIKE ", '"a*b"', "'lit'",
               "==", "!=", "xs", "ip"]
        ),
        min_size=1,
        max_size=40,
    ).map("".join)
)
def test_translate_expr_raises_only_typed_errors(e):
    """The whole rewrite pipeline on arbitrary junk: either a string
    comes back or EsqlError is raised — never a raw ValueError /
    KeyError / IndexError leaking compiler internals (the unbalanced
    paren scanners and CIDR parsing used to)."""
    from elasticsearch_hadoop_spark.esql import EsqlError, _translate_expr

    try:
        out = _translate_expr(e)
        assert isinstance(out, str)
    except EsqlError:
        pass


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=10**6),
    d=st.floats(min_value=0.1, max_value=10**4, allow_nan=False).map(
        lambda f: round(f, 3)
    ),
)
def test_float_literal_arithmetic_plans_as_double(spark, n, d):
    """ES|QL float literals are doubles (r6 red-query root cause): any
    unsuffixed decimal literal in arithmetic must yield a DOUBLE column,
    never DECIMAL(p,s) — `bigint / 1024.0` used to plan as decimal(28,6)
    and hash-diverge from the engine on every row."""
    from elasticsearch_hadoop_spark.esql import _translate_expr

    sql = _translate_expr(f"n / {d!r}")
    dtype = (
        spark.range(1)
        .selectExpr(f"CAST(id + {n} AS BIGINT) AS n")
        .selectExpr(f"({sql}) AS out")
        .schema["out"]
        .dataType.simpleString()
    )
    assert dtype == "double", f"{d!r}: {sql} planned as {dtype}"


def test_compile_script_float_literal_is_double(spark):
    """Same rule for painless-lite: the ingest `script` processor's
    `ctx.kchars = ctx.n_chars / 1000.0` must produce a double."""
    from elasticsearch_hadoop_spark.runtime_fields import compile_script

    col = compile_script("emit(doc['n'].value / 1000.0)")
    df = spark.range(3).selectExpr("CAST(id * 406 AS BIGINT) AS n")
    out = df.select(col.alias("kchars"))
    assert out.schema["kchars"].dataType.simpleString() == "double"
    # and string literals are untouched by the rewrite
    col2 = compile_script("emit(doc['s'].value == '1.5' ? 2.5 : 0.5)")
    out2 = df.selectExpr("'1.5' AS s").select(col2.alias("x"))
    assert out2.schema["x"].dataType.simpleString() == "double"
    assert out2.collect()[0]["x"] == 2.5
