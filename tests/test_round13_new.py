"""Round-13 surface tests: the widened `?q=` URI-lite grammar
(wildcard / range / comparison leaf kinds, `query_dsl.uri_leaf_kind`)
and the scored-QSTR constant-score leaves — unit coverage of every
kind plus a hypothesis differential against a pure-Python evaluator
(the house rule: every new Column-math surface gets a property test
against a Python reference before it ships)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.query_dsl import (
    QueryDslError,
    compile_query,
    uri_leaf_kind,
    uri_query_parts,
    uri_wildcard_like,
)


# ---------- uri_leaf_kind classification ----------


@pytest.mark.parametrize(
    "value,kind,payload",
    [
        ("hello", "term", "hello"),
        ('"hello"', "term", "hello"),
        ('"a*b"', "term", "a*b"),  # quotes force a literal term
        ('"a TO b"', "term", "a TO b"),
        ("va*", "wildcard", "va*"),
        ("v?", "wildcard", "v?"),
        ("*", "wildcard", "*"),
        (">5", "cmp", (">", 5)),
        (">=5.5", "cmp", (">=", 5.5)),
        ("<x", "cmp", ("<", "x")),
        ("<=2024-01-01", "cmp", ("<=", "2024-01-01")),
        ("[1 TO 5]", "range", (True, 1, 5, True)),
        ("{1 TO 5}", "range", (False, 1, 5, False)),
        ("{100 TO 400]", "range", (False, 100, 400, True)),
        ("[a TO b}", "range", (True, "a", "b", False)),
        ("[* TO 5]", "range", (True, None, 5, True)),
        ("[5 TO *]", "range", (True, 5, None, True)),
        ("[* TO *]", "range", (True, None, None, True)),
        ("[1 to 5]", "range", (True, 1, 5, True)),  # TO is case-insensitive
    ],
)
def test_uri_leaf_kind(value, kind, payload):
    assert uri_leaf_kind(value) == (kind, payload)


def test_uri_bound_typing():
    """int bounds stay exact, floats parse, everything else is a string;
    quoted bounds FORCE a string (the lexical escape hatch for keyword
    columns holding digits — the schema-free builder can't read the
    column type the way ES reads its mapping)."""
    assert uri_leaf_kind(">5") == ("cmp", (">", 5))
    assert isinstance(uri_leaf_kind(">5")[1][1], int)
    assert uri_leaf_kind(">5.25") == ("cmp", (">", 5.25))
    assert uri_leaf_kind(">abc") == ("cmp", (">", "abc"))
    assert uri_leaf_kind('>"5"') == ("cmp", (">", "5"))
    assert uri_leaf_kind('["1" TO "5"]') == ("range", (True, "1", "5", True))


def test_uri_bound_rejects_python_only_numeric_spellings():
    """nan/inf/Infinity bounds refuse LOUDLY — 'stays a lexical
    string' is no protection, because Spark's comparison coercion
    casts the string back to double on a numeric column
    (case-insensitively) and `n < nan` silently matches every row
    under NaN-is-largest ordering (review r13c, verified live).
    Underscore spellings stay lexical strings (no coercion hazard:
    '1_0' does not cast to a number)."""
    for bad in (">nan", ">inf", ">Infinity", "<NaN", ">=-inf", "[nan TO 5]"):
        with pytest.raises(QueryDslError, match="NaN/Infinity"):
            uri_leaf_kind(bad)
    # quoted keeps a literal string bound expressible
    assert uri_leaf_kind('>"nan"') == ("cmp", (">", "nan"))
    assert uri_leaf_kind(">1_000") == ("cmp", (">", "1_000"))
    assert uri_leaf_kind("[1_0 TO 2]") == ("range", (True, "1_0", 2, True))
    # exact spellings still type
    assert uri_leaf_kind(">+5") == ("cmp", (">", 5))
    assert uri_leaf_kind(">-5.5") == ("cmp", (">", -5.5))
    assert uri_leaf_kind(">1e3") == ("cmp", (">", 1000.0))


def test_uri_quoted_bound_with_wildcard_chars_is_literal():
    """review r13c regression: the wildcard-in-bound refusal must not
    see QUOTED bounds — quotes force the literal text."""
    assert uri_leaf_kind('>"5*"') == ("cmp", (">", "5*"))
    assert uri_leaf_kind('["src1*" TO "src2*"]') == (
        "range",
        (True, "src1*", "src2*", True),
    )
    assert uri_leaf_kind('["*" TO b]') == ("range", (True, "*", "b", True))


def test_uri_bound_range_overflow_refuses_loudly():
    """Past-int64 integer bounds and double-overflow float bounds raise
    the typed error instead of leaking Py4JError from F.lit (found by
    the printable-input fuzz + a directed probe)."""
    with pytest.raises(QueryDslError, match="out of int64 range"):
        uri_leaf_kind(">" + "9" * 30)
    with pytest.raises(QueryDslError, match="out of int64 range"):
        uri_leaf_kind("[-" + "9" * 25 + " TO 5]")
    with pytest.raises(QueryDslError, match="overflows double"):
        uri_leaf_kind(">1e400")
    # int64 edges and big doubles stay fine
    assert uri_leaf_kind(f">{2**63 - 1}") == ("cmp", (">", 2**63 - 1))
    assert uri_leaf_kind(f">{-(2**63)}") == ("cmp", (">", -(2**63)))
    assert uri_leaf_kind(">1e30") == ("cmp", (">", 1e30))


def test_uri_wildcard_in_bound_refuses_loudly(spark):
    """A wildcard inside a range/comparison bound has no Lucene meaning
    — loud refusal beats a puzzling lexical/cast comparison on '5*'."""
    with pytest.raises(QueryDslError, match="bound cannot contain wildcards"):
        uri_leaf_kind(">5*")
    with pytest.raises(QueryDslError, match="bound cannot contain wildcards"):
        uri_leaf_kind("[a* TO b]")
    with pytest.raises(QueryDslError, match="bound cannot contain wildcards"):
        compile_query("n:>5*")
    # the exact '*' open bound stays legal, and escaped wildcards in a
    # bound are literal characters
    assert uri_leaf_kind("[* TO 5]") == ("range", (True, None, 5, True))
    assert uri_leaf_kind(r"[a\* TO b]") == ("range", (True, "a*", "b", True))


def test_uri_escaped_wildcards_are_literal():
    """Lucene \\* / \\? escapes mean the literal character: a value of
    only escaped wildcards is a TERM; a mixed value stays a wildcard
    whose LIKE pattern keeps the escaped char literal."""
    assert uri_leaf_kind(r"foo\*") == ("term", "foo*")
    assert uri_leaf_kind(r"fo\?o") == ("term", "fo?o")
    assert uri_leaf_kind(r"a\*b*")[0] == "wildcard"
    assert uri_wildcard_like(r"a\*b*") == "a*b%"
    assert uri_wildcard_like(r"\?x?") == "?x_"
    assert uri_wildcard_like("a\\") == "a\\\\"  # trailing lone backslash


def test_uri_query_parts_keeps_raw_values():
    parts = uri_query_parts('a:"x y" AND b:[1 TO 2] OR c:d*')
    assert parts == [
        ("AND", "a", '"x y"'),
        ("AND", "b", "[1 TO 2]"),
        ("OR", "c", "d*"),
    ]


def test_wildcard_like_escapes_metacharacters():
    assert uri_wildcard_like("a*b") == "a%b"
    assert uri_wildcard_like("a?b") == "a_b"
    assert uri_wildcard_like("a%b*") == "a\\%b%"
    assert uri_wildcard_like("a_b?") == "a\\_b_"
    # backslash is Lucene's escape: \b resolves to the literal b, and a
    # literal backslash is written \\ (then LIKE-escaped to \\\\)
    assert uri_wildcard_like("a\\b*") == "ab%"
    assert uri_wildcard_like("a\\\\b*") == "a\\\\b%"


def test_uri_error_contract_still_loud():
    with pytest.raises(QueryDslError, match="field:value"):
        compile_query("no-colon-here")
    with pytest.raises(QueryDslError, match="field:value"):
        compile_query("   ")  # blank input fails the pair check, loudly


# ---------- compiled behavior on a tiny frame ----------


@pytest.fixture()
def kinds_df(spark):
    rows = [
        (0, "alpha", 0),
        (1, "alps", 3),
        (2, "a%b", 5),
        (3, "beta", 7),
        (4, "b", 10),
    ]
    return spark.createDataFrame(rows, "id int, s string, n int")


def _ids(df, q):
    return sorted(r["id"] for r in df.filter(compile_query(q)).collect())


def test_uri_wildcard_filters(kinds_df):
    assert _ids(kinds_df, "s:al*") == [0, 1]
    assert _ids(kinds_df, "s:?lps") == [1]
    assert _ids(kinds_df, "s:a*a") == [0]
    # LIKE metacharacters in the value are literal: a%b matches ONLY a%b
    assert _ids(kinds_df, "s:a%b") == [2]
    assert _ids(kinds_df, "s:a?b") == [2]  # ? spans the % char
    assert _ids(kinds_df, "s:*") == [0, 1, 2, 3, 4]


def test_uri_quoted_value_is_literal(kinds_df):
    assert _ids(kinds_df, 's:"al*"') == []  # no wildcard inside quotes
    assert _ids(kinds_df, 's:"a%b"') == [2]


def test_uri_range_and_cmp_filters(kinds_df):
    assert _ids(kinds_df, "n:[3 TO 7]") == [1, 2, 3]
    assert _ids(kinds_df, "n:{3 TO 7}") == [2]
    assert _ids(kinds_df, "n:{3 TO 7]") == [2, 3]
    assert _ids(kinds_df, "n:[* TO 3]") == [0, 1]
    assert _ids(kinds_df, "n:[5 TO *]") == [2, 3, 4]
    assert _ids(kinds_df, "n:[* TO *]") == [0, 1, 2, 3, 4]
    assert _ids(kinds_df, "n:>7") == [4]
    assert _ids(kinds_df, "n:>=7") == [3, 4]
    assert _ids(kinds_df, "n:<3") == [0]
    assert _ids(kinds_df, "n:<=3") == [0, 1]
    # string range compares lexically ("beta" > "b", so id 3 is out)
    assert _ids(kinds_df, "s:[alpha TO b]") == [0, 1, 4]


def test_uri_quoted_bounds_compare_lexically(kinds_df):
    """Digit values in a STRING column: unquoted bounds would compare
    numerically (and ANSI-crash on non-numeric rows); quoted bounds are
    the documented lexical escape hatch."""
    df = kinds_df.sparkSession.createDataFrame(
        [(0, "10"), (1, "9"), (2, "abc")], "id int, v string"
    )
    # lexical: "10" < "5", "9" > "5", "abc" > "5"
    assert sorted(
        r["id"] for r in df.filter(compile_query('v:>"5"')).collect()
    ) == [1, 2]
    assert sorted(
        r["id"] for r in df.filter(compile_query('v:["1" TO "5"]')).collect()
    ) == [0]


def test_uri_escaped_wildcard_filters(kinds_df):
    # s values: alpha alps a%b beta b — r"b\*" is the literal term "b*"
    # (matches nothing), while "b*" matches beta and b
    assert _ids(kinds_df, r"s:b\*") == []
    assert _ids(kinds_df, "s:b*") == [3, 4]


def test_uri_exists_pseudo_field(spark):
    """ES query_string `_exists_:field` — non-null test on the NAMED
    field; a non-term value under _exists_ refuses loudly; under
    METADATA _score it pays the constant 1.0 (ES wraps FieldExistsQuery
    in constant_score)."""
    from elasticsearch_hadoop_spark.esql import esql

    df = spark.createDataFrame(
        [(0, "en", 5), (1, None, 9), (2, "fr", None)],
        "id int, lang string, n int",
    )
    got = sorted(
        r["id"] for r in df.filter(compile_query("_exists_:lang AND n:>1")).collect()
    )
    assert got == [0]
    with pytest.raises(QueryDslError, match="_exists_ takes a field name"):
        compile_query("_exists_:la*")
    out = {
        r["id"]: r["_score"]
        for r in esql(
            'FROM t METADATA _score | WHERE QSTR("_exists_:lang OR n:>8")'
            " | KEEP id, _score",
            tables={"t": df},
        ).collect()
    }
    assert out == {
        0: pytest.approx(1.0),
        1: pytest.approx(1.0),
        2: pytest.approx(1.0),
    }


def test_uri_mixed_kinds_left_assoc(kinds_df):
    # ((s like al% AND n<=3) OR n>=10)
    assert _ids(kinds_df, "s:al* AND n:<=3 OR n:>=10") == [0, 1, 4]


# ---------- hypothesis differential vs pure Python ----------

_S_VALUES = ["alpha", "alps", "a%b", "beta", "b_c", "x", "a*b"]
_S_LEAVES = [
    "s:alpha", 's:"beta"', "s:al*", "s:?lps", "s:a?b", "s:*a*",
    "s:[alpha TO beta]", "s:{alpha TO beta}", "s:>beta", "s:<=b_c",
    r"s:a\*b", r"s:a\*b*", r"s:\?lps",
]
_N_LEAVES = [
    "n:3", "n:>4", "n:>=4", "n:<9", "n:<=9",
    "n:[2 TO 11]", "n:{2 TO 11}", "n:[2 TO 11}", "n:[* TO 6]", "n:[6 TO *]",
]


def _py_leaf(leaf: str, s, n) -> bool:
    field, value = leaf.split(":", 1)
    v = s if field == "s" else n
    if v is None:
        # SQL three-valued logic: every leaf kind over NULL is
        # not-true — including [* TO *], which compiles to isNotNull
        return False
    kind, payload = uri_leaf_kind(value)
    if kind == "term":
        return v == payload if field == "s" else str(v) == payload
    if kind == "wildcard":
        # escape-aware translation: \x is the literal x, bare */? live
        rx, i = [], 0
        while i < len(payload):
            ch = payload[i]
            if ch == "\\" and i + 1 < len(payload):
                rx.append(re.escape(payload[i + 1]))
                i += 2
                continue
            rx.append(".*" if ch == "*" else "." if ch == "?" else re.escape(ch))
            i += 1
        return re.fullmatch("".join(rx), str(v)) is not None
    if kind == "cmp":
        op, b = payload
        return {">": v > b, ">=": v >= b, "<": v < b, "<=": v <= b}[op]
    lo_incl, lo, hi, hi_incl = payload
    ok = True
    if lo is not None:
        ok = ok and (v >= lo if lo_incl else v > lo)
    if hi is not None:
        ok = ok and (v <= hi if hi_incl else v < hi)
    return ok


@given(
    leaves=st.lists(
        st.sampled_from(_S_LEAVES + _N_LEAVES), min_size=1, max_size=4
    ),
    ops=st.lists(st.sampled_from(["AND", "OR"]), min_size=3, max_size=3),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_uri_grammar_differential(spark, leaves, ops):
    """Every leaf-kind combination under left-associative AND/OR folding
    matches the pure-Python evaluator over the full value grid."""
    q = leaves[0]
    for leaf, op in zip(leaves[1:], ops):
        q += f" {op} {leaf}"
    rows = [
        (i * 16 + n, s, n) for i, s in enumerate(_S_VALUES) for n in range(13)
    ]
    # NULL rows: every leaf kind over NULL is not-true (SQL 3VL; the
    # AND/OR fold has no NOT, so null==False is exact for the fold too)
    rows += [(1000, None, 5), (1001, "alpha", None), (1002, None, None)]
    df = spark.createDataFrame(rows, "id int, s string, n int")
    got = {r["id"] for r in df.filter(compile_query(q)).collect()}
    exp = set()
    for rid, s, n in rows:
        acc = None
        for op, field, value in uri_query_parts(q):
            hit = _py_leaf(f"{field}:{value}", s, n)
            acc = hit if acc is None else (acc and hit if op == "AND" else acc or hit)
        if acc:
            exp.add(rid)
    assert got == exp, (q, sorted(got), sorted(exp))


@given(
    q=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40,
    )
)
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_uri_grammar_error_contract_fuzz(spark, q):
    """Arbitrary printable input either compiles to a Column or raises
    the typed QueryDslError — never any other exception (the es.query
    veneer is user-facing syntax; a raw regex/cast traceback there is a
    bug)."""
    from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

    try:
        compile_query(q)
    except QueryDslError:
        pass


# ---------- scored QSTR constant-score leaves ----------


def test_qstr_constant_score_leaves(spark):
    """Non-term leaves pay a gated constant 1.0 (Lucene constant_score
    rewrite); term leaves keep BM25; a doc matching only constants gets
    an exact integer score."""
    from elasticsearch_hadoop_spark.esql import esql

    rows = [
        (0, "en", 500, "src10"),  # term + range + wildcard
        (1, "en", 100, "other"),  # term only
        (2, "fr", 450, "src11"),  # range + wildcard -> exactly 2.0
        (3, "fr", 420, "other"),  # range only -> exactly 1.0
        (4, "fr", 100, "other"),  # nothing -> filtered out
    ]
    df = spark.createDataFrame(rows, "id int, lang string, n int, src string")
    out = {
        r["id"]: r["_score"]
        for r in esql(
            "FROM t METADATA _score"
            ' | WHERE QSTR("lang:en OR n:[400 TO *] OR src:src1*")'
            " | KEEP id, _score",
            tables={"t": df},
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[2] == pytest.approx(2.0)
    assert out[3] == pytest.approx(1.0)
    bm25_en = out[1]  # term-only doc isolates the BM25 part
    assert bm25_en > 0.0
    assert out[0] == pytest.approx(bm25_en + 2.0)


def test_qstr_all_constant_leaves_scores_without_stats(spark):
    """A QSTR of ONLY non-term leaves exercises the empty-leaves path of
    bm25_score_multi (no stats scan at all)."""
    from elasticsearch_hadoop_spark.esql import esql

    df = spark.createDataFrame(
        [(0, 5), (1, 9), (2, 12)], "id int, n int"
    )
    out = {
        r["id"]: r["_score"]
        for r in esql(
            'FROM t METADATA _score | WHERE QSTR("n:>8 OR n:[* TO 6]")'
            " | KEEP id, _score",
            tables={"t": df},
        ).collect()
    }
    assert out == {0: pytest.approx(1.0), 1: pytest.approx(1.0), 2: pytest.approx(1.0)}


def test_qstr_constant_leaf_under_not_stays_unscored(spark):
    """must_not context: a negated constant leaf filters but never
    scores — same rule as negated MATCH leaves."""
    from elasticsearch_hadoop_spark.esql import esql

    df = spark.createDataFrame([(0, "en", 5), (1, "en", 9)], "id int, lang string, n int")
    out = {
        r["id"]: r["_score"]
        for r in esql(
            "FROM t METADATA _score"
            ' | WHERE NOT QSTR("n:>8") AND lang == "en"'
            " | KEEP id, _score",
            tables={"t": df},
        ).collect()
    }
    assert out == {0: pytest.approx(0.0)}
