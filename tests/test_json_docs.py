"""Golden JSON-in / typed-rows-out tests for the ingestion path — the
reference's serialization unit-test pattern (SURVEY.md §5.1: ScrollReader /
SchemaUtils golden tests), applied to sources/json_docs.py."""

from __future__ import annotations

import base64
import datetime as dt
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from elasticsearch_hadoop_spark.sources.json_docs import (
    mapping_to_struct,
    parse_array_includes,
    read_json_docs,
)

MAPPING = {
    "my_index": {
        "mappings": {
            "properties": {
                "id": {"type": "long"},
                "name": {"type": "keyword"},
                "score": {"type": "half_float"},
                "ratio": {"type": "scaled_float", "scaling_factor": 100},
                "active": {"type": "boolean"},
                "created": {"type": "date"},
                "blob": {"type": "binary"},
                "tags": {"type": "keyword"},  # array-ness via array_include
                "addr": {
                    "properties": {
                        "city": {"type": "keyword"},
                        "zip": {"type": "integer"},
                    }
                },
                "items": {
                    "type": "nested",
                    "properties": {"sku": {"type": "keyword"}, "qty": {"type": "integer"}},
                },
                "loc": {"type": "geo_point"},
                "parent": {"type": "join"},  # unsupported -> skipped
            }
        }
    }
}


def test_mapping_to_struct_types():
    with pytest.warns(UserWarning, match="join"):
        st = mapping_to_struct(MAPPING, array_include="tags")
    by_name = {f.name: f.dataType for f in st.fields}
    assert by_name["id"] == T.LongType()
    assert by_name["name"] == T.StringType()
    assert by_name["score"] == T.FloatType()  # half_float widened
    assert by_name["ratio"] == T.DoubleType()  # scaled_float
    assert by_name["created"] == T.TimestampType()
    assert by_name["blob"] == T.BinaryType()
    assert by_name["tags"] == T.ArrayType(T.StringType())  # from array_include
    assert by_name["addr"] == T.StructType(
        [T.StructField("city", T.StringType()), T.StructField("zip", T.IntegerType())]
    )
    # nested -> always ArrayType(Struct)
    assert isinstance(by_name["items"], T.ArrayType)
    assert isinstance(by_name["items"].elementType, T.StructType)
    assert by_name["loc"].fieldNames() == ["lat", "lon"]
    assert "parent" not in by_name  # unsupported skipped with warning


def test_rich_dates_off_and_map_include():
    st = mapping_to_struct(
        {"properties": {"created": {"type": "date"}, "counters": {"properties": {}}}},
        map_include="counters",
        rich_dates=False,
    )
    by_name = {f.name: f.dataType for f in st.fields}
    assert by_name["created"] == T.StringType()  # es.mapping.date.rich=false
    assert by_name["counters"] == T.MapType(T.StringType(), T.StringType())


def test_array_include_depth():
    assert parse_array_includes("a, b.c:2") == {"a": 1, "b.c": 2}
    st = mapping_to_struct(
        {"properties": {"m": {"type": "double"}}}, array_include="m:2"
    )
    assert st["m"].dataType == T.ArrayType(T.ArrayType(T.DoubleType()))


DOCS = [
    # ISO-8601 date, base64 binary, nested array, object
    {
        "id": 1,
        "name": "alpha",
        "score": 1.5,
        "ratio": 0.25,
        "active": True,
        "created": "2024-03-05T10:30:00",
        "blob": base64.b64encode(b"hello").decode(),
        "tags": ["x", "y"],
        "addr": {"city": "berlin", "zip": 10115},
        "items": [{"sku": "a1", "qty": 2}, {"sku": "b2", "qty": 1}],
        "loc": {"lat": 52.5, "lon": 13.4},
    },
    # epoch-millis date (per-doc leniency, DateUtils parity), nulls
    {
        "id": 2,
        "name": "beta",
        "created": 1709634600000,
        "tags": ["z"],
    },
]


@pytest.fixture()
def ndjson(tmp_path):
    p = tmp_path / "docs.json"
    p.write_text("\n".join(json.dumps(d) for d in DOCS))
    return str(p)


def test_read_json_docs_golden(spark, ndjson):
    df = read_json_docs(spark, ndjson, mapping=MAPPING, array_include="tags")
    rows = {r["id"]: r for r in df.collect()}
    r1, r2 = rows[1], rows[2]
    assert r1["created"] == dt.datetime(2024, 3, 5, 10, 30)
    assert bytes(r1["blob"]) == b"hello"
    assert r1["tags"] == ["x", "y"]
    assert r1["addr"]["city"] == "berlin" and r1["addr"]["zip"] == 10115
    assert [i["sku"] for i in r1["items"]] == ["a1", "b2"]
    assert r1["loc"]["lat"] == pytest.approx(52.5)
    # epoch millis 1709634600000 == 2024-03-05T10:30:00 UTC
    assert r2["created"] == dt.datetime(2024, 3, 5, 10, 30)
    assert r2["blob"] is None and r2["addr"] is None


def test_error_handlers(spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"id": 1, "name": "ok"}\n{not json at all\n{"id": 3, "name": "ok2"}')
    mapping = {"properties": {"id": {"type": "long"}, "name": {"type": "keyword"}}}
    # skip (DROPMALFORMED)
    df = read_json_docs(spark, str(p), mapping=mapping, errors="skip")
    assert sorted(r["id"] for r in df.collect()) == [1, 3]
    # log (PERMISSIVE + _corrupt_record)
    df = read_json_docs(spark, str(p), mapping=mapping, errors="log")
    bad = [r for r in df.collect() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]
    # fail (FAILFAST)
    with pytest.raises(Exception):
        read_json_docs(spark, str(p), mapping=mapping, errors="fail").collect()


def test_include_exclude_fields(spark, ndjson):
    df = read_json_docs(
        spark, ndjson, mapping=MAPPING, include_fields=["id", "name"]
    )
    assert df.columns == ["id", "name"]
    df = read_json_docs(spark, ndjson, mapping=MAPPING, exclude_fields=["blob", "items"])
    assert "blob" not in df.columns and "items" not in df.columns


def test_geo_point_three_wire_forms(spark, tmp_path):
    """§1.2 geo_point leniency: object {lat,lon}, GeoJSON array [lon,lat],
    and "lat,lon" string must all land as struct(lat,lon) — decided per
    document (the reference samples one doc; we are strictly more lenient)."""
    import json as _json

    d = tmp_path / "geo"
    d.mkdir()
    rows = [
        {"id": 1, "loc": {"lat": 41.12, "lon": -71.34}},
        {"id": 2, "loc": [-71.5, 40.5]},
        {"id": 3, "loc": " 39.25 , -70.75 "},
        {"id": 4, "loc": None},
        {"id": 5, "locs": [[-71.5, 40.5], {"lat": 1.5, "lon": 2.5}]},
    ]
    with open(d / "a.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    m = {
        "properties": {
            "id": {"type": "long"},
            "loc": {"type": "geo_point"},
            "locs": {"type": "geo_point"},
        }
    }
    df = read_json_docs(spark, str(d), mapping=m, array_include="locs")
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["loc"] == Row(lat=41.12, lon=-71.34)
    assert got[2]["loc"] == Row(lat=40.5, lon=-71.5)
    assert got[3]["loc"] == Row(lat=39.25, lon=-70.75)
    assert got[4]["loc"] is None
    assert got[5]["locs"] == [Row(lat=40.5, lon=-71.5), Row(lat=1.5, lon=2.5)]


def test_geo_point_unparseable_forms_are_null(spark, tmp_path):
    """geohash / WKT / empty strings (forms ES accepts but this engine does
    not decode) must yield a NULL point, never struct(null, null) — a
    loc.isNotNull() filter must not count location-less documents."""
    import json as _json

    d = tmp_path / "geo2"
    d.mkdir()
    rows = [
        {"id": 1, "loc": "drm3btev3e86"},
        {"id": 2, "loc": "POINT (-71.34 41.12)"},
        {"id": 3, "loc": ""},
        {"id": 4, "loc": "41.12,-71.34"},
    ]
    with open(d / "a.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    m = {"properties": {"id": {"type": "long"}, "loc": {"type": "geo_point"}}}
    df = read_json_docs(spark, str(d), mapping=m)
    got = {r["id"]: r["loc"] for r in df.collect()}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] == Row(lat=41.12, lon=-71.34)
