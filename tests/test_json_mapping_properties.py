"""Property-based test of the ES-mapping → StructType conversion (§1.2
type table): hypothesis generates random nested mappings (scalar types,
object/nested nesting, random array-include paths), and a tiny independent
walker computes the expected Spark type for every leaf."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from elasticsearch_hadoop_spark.sources.json_docs import mapping_to_struct

SCALARS = {
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "half_float": T.FloatType(),
    "float": T.FloatType(),
    "scaled_float": T.DoubleType(),
    "double": T.DoubleType(),
    "keyword": T.StringType(),
    "text": T.StringType(),
    "date": T.TimestampType(),
    "date_nanos": T.TimestampType(),
    "binary": T.BinaryType(),
}

names = st.sampled_from(["a", "b", "c", "d", "e"])
scalar_spec = st.sampled_from(sorted(SCALARS)).map(lambda t: {"type": t})


def container(children):
    obj = st.dictionaries(names, children, min_size=1, max_size=3).map(
        lambda props: {"properties": props}
    )
    nested = st.dictionaries(names, children, min_size=1, max_size=2).map(
        lambda props: {"type": "nested", "properties": props}
    )
    return st.one_of(obj, nested)


spec = st.recursive(scalar_spec, container, max_leaves=8)
mapping = st.dictionaries(names, spec, min_size=1, max_size=4).map(
    lambda props: {"properties": props}
)


def expected_type(s, path, arrays, rich_dates):
    t = s.get("type")
    if t in (None, "object", "nested"):
        inner = T.StructType(
            [
                T.StructField(
                    k, expected_type(v, f"{path}.{k}" if path else k, arrays, rich_dates)
                )
                for k, v in s.get("properties", {}).items()
            ]
        )
        dt = inner
    elif t in ("date", "date_nanos") and not rich_dates:
        dt = T.StringType()
    else:
        dt = SCALARS[t]
    depth = arrays.get(path, 0)
    if t == "nested":
        depth = max(depth, 1)
    for _ in range(depth):
        dt = T.ArrayType(dt)
    return dt


@st.composite
def mapping_with_includes(draw):
    m = draw(mapping)

    # collect all paths; pick a few as array-include (with random depth)
    paths = []

    def walk(props, prefix):
        for k, v in props.items():
            p = f"{prefix}{k}"
            paths.append(p)
            walk(v.get("properties", {}), f"{p}.")

    walk(m["properties"], "")
    chosen = draw(
        st.lists(st.sampled_from(paths), unique=True, max_size=min(3, len(paths)))
    )
    include = [f"{p}:{draw(st.integers(1, 2))}" for p in chosen]
    rich = draw(st.booleans())
    return m, include, rich


@settings(max_examples=200, deadline=None)
@given(args=mapping_with_includes())
def test_mapping_struct_matches_reference_walker(args):
    m, include, rich = args
    got = mapping_to_struct(m, array_include=include, rich_dates=rich)
    arrays = {s.split(":")[0]: int(s.split(":")[1]) for s in include}
    expect = T.StructType(
        [
            T.StructField(k, expected_type(v, k, arrays, rich))
            for k, v in m["properties"].items()
        ]
    )
    assert got == expect, f"mapping={m} include={include} rich={rich}"


def test_unsupported_types_skipped_with_warning():
    m = {"properties": {"j": {"type": "join"}, "k": {"type": "keyword"}}}
    with pytest.warns(UserWarning, match="unsupported"):
        out = mapping_to_struct(m)
    assert [f.name for f in out.fields] == ["k"]
