"""JSON-document ingestion with the ES->Spark type mapping (SURVEY.md §1.2,
§7 step 2): the engine's equivalent of the reference's mapping-discovery +
scroll-deserialization path (A4/A8; upstream
``mr/.../serialization/dto/mapping/FieldParser``/``Mapping.java``,
``spark/sql-20/.../sql/SchemaUtils.scala`` ``convertToStruct``/``convertField``,
value coercion in ``ScrollReader.java``/``ScalaRowValueReader.scala`` — path
citations per SURVEY.md §0).

Two layers:

1. ``mapping_to_struct(mapping)`` — an Elasticsearch ``_mapping`` JSON body
   -> Spark ``StructType`` per the §1.2 table.  Array-ness is not knowable
   from an ES mapping (any field may hold scalar or array), so
   ``array_include`` mirrors ``es.read.field.as.array.include`` (with
   ``field:depth`` nesting syntax); ``map_include`` is the target-engine
   extension from §1.2 for open-keyed objects -> MapType.

2. ``read_json_docs(spark, path, mapping=...)`` — NDJSON files -> typed
   DataFrame.  Wire-format leniency matches the reference's ScrollReader:
   dates accept ISO-8601 strings *or* epoch-millis numbers per document
   (DateUtils parity), ``binary`` is base64-decoded.  Error handling mirrors
   ``es.read.data.error.handlers``: ``errors="fail"`` (FAILFAST),
   ``"skip"`` (DROPMALFORMED), ``"log"`` (PERMISSIVE + ``_corrupt_record``
   column retained).

Scale: schema is fixed up-front (no per-row inference); parsing is Spark's
native JSON reader (JVM, vectorized, parallel by file split); the date/binary
coercions are Column expressions (whole-stage codegen), never Python.
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ES field type -> Spark type (SURVEY.md §1.2 table).  Dates handled apart.
_SCALAR = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "half_float": T.FloatType(),  # widened, §1.2
    "float": T.FloatType(),
    "scaled_float": T.DoubleType(),
    "double": T.DoubleType(),
    "keyword": T.StringType(),
    "text": T.StringType(),
    "string": T.StringType(),  # pre-5.x
    "ip": T.StringType(),
    "date": T.TimestampType(),
    "date_nanos": T.TimestampType(),
    "binary": T.BinaryType(),
}

_UNSUPPORTED = {"join", "completion", "token_count", "percolator", "rank_feature", "alias"}

GEO_POINT_STRUCT = T.StructType(
    [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
)
GEO_SHAPE_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType()),
        # coordinates flattened to a double array — lossy, same as the
        # reference's geo_shape handling (§1.2 "coordinates flattened")
        T.StructField("coordinates", T.ArrayType(T.DoubleType())),
    ]
)


def parse_array_includes(spec: str | list[str] | None) -> dict[str, int]:
    """``"a,b.c:2"`` -> {"a": 1, "b.c": 2} (es.read.field.as.array.include
    syntax: optional ``:depth`` = levels of array nesting)."""
    if not spec:
        return {}
    items = spec.split(",") if isinstance(spec, str) else list(spec)
    out: dict[str, int] = {}
    for item in items:
        item = item.strip()
        if not item:
            continue
        if ":" in item:
            name, depth = item.rsplit(":", 1)
            out[name] = int(depth)
        else:
            out[item] = 1
    return out


def mapping_to_struct(
    mapping: dict[str, Any],
    array_include: str | list[str] | None = None,
    map_include: str | list[str] | None = None,
    rich_dates: bool = True,
) -> T.StructType:
    """ES ``_mapping`` JSON -> StructType (SchemaUtils.convertToStruct parity).

    Accepts the ``GET <index>/_mapping`` response at any wrapping level:
    ``{"index": {"mappings": {...}}}``, ``{"mappings": {...}}``, or the bare
    ``{"properties": {...}}``.  ``rich_dates=False`` maps dates to strings
    (``es.mapping.date.rich=false`` parity)."""
    props = _unwrap_properties(mapping)
    arrays = parse_array_includes(array_include)
    maps = parse_array_includes(map_include)
    return _props_to_struct(props, "", arrays, maps, rich_dates)


def _unwrap_properties(mapping: dict[str, Any]) -> dict[str, Any]:
    if "properties" in mapping:
        return mapping["properties"]
    if "mappings" in mapping:
        return _unwrap_properties(mapping["mappings"])
    if len(mapping) == 1:
        inner = next(iter(mapping.values()))
        if isinstance(inner, dict):
            return _unwrap_properties(inner)
    raise ValueError("not an ES mapping body: no 'properties' found")


def _props_to_struct(
    props: dict[str, Any],
    prefix: str,
    arrays: dict[str, int],
    maps: dict[str, int],
    rich_dates: bool,
) -> T.StructType:
    fields = []
    for name, spec in props.items():
        path = f"{prefix}{name}"
        dt = _field_type(spec, path, arrays, maps, rich_dates)
        if dt is None:
            continue
        depth = arrays.get(path, 0)
        if spec.get("type") == "nested":
            depth = max(depth, 1)  # nested docs are always arrays (§1.2)
        for _ in range(depth):
            dt = T.ArrayType(dt)
        # geo_point is marked on the FIELD (not the type): the wire layer
        # needs to know this struct accepts three JSON shapes (§1.2)
        meta = {"es_type": "geo_point"} if spec.get("type") == "geo_point" else None
        fields.append(T.StructField(name, dt, metadata=meta))
    return T.StructType(fields)


def _field_type(
    spec: dict[str, Any],
    path: str,
    arrays: dict[str, int],
    maps: dict[str, int],
    rich_dates: bool,
) -> T.DataType | None:
    es_type = spec.get("type")
    if es_type in (None, "object", "nested"):
        # object (implicit when only "properties" present) / nested
        sub_props = spec.get("properties", {})
        if path in maps:
            # open-keyed object -> MapType (target-engine extension, §1.2):
            # value type = common type of declared props, else string
            value_types = {
                str(_field_type(s, f"{path}.{k}", arrays, maps, rich_dates))
                for k, s in sub_props.items()
            }
            if len(value_types) == 1 and sub_props:
                vt = _field_type(
                    next(iter(sub_props.values())), path, arrays, maps, rich_dates
                )
            else:
                vt = T.StringType()
            return T.MapType(T.StringType(), vt)
        return _props_to_struct(sub_props, f"{path}.", arrays, maps, rich_dates)
    if es_type in ("date", "date_nanos") and not rich_dates:
        return T.StringType()
    if es_type in _SCALAR:
        return _SCALAR[es_type]
    if es_type == "geo_point":
        return GEO_POINT_STRUCT
    if es_type == "geo_shape":
        return GEO_SHAPE_STRUCT
    if es_type in _UNSUPPORTED:
        warnings.warn(f"skipping unsupported ES field type {es_type!r} at {path!r}")
        return None
    warnings.warn(f"unknown ES field type {es_type!r} at {path!r} -> string")
    return T.StringType()


# --------------------------------------------------------------------- wire
def _is_geo_field(f: T.StructField) -> bool:
    return (f.metadata or {}).get("es_type") == "geo_point"


def _wire_type(dt: T.DataType, geo: bool = False) -> T.DataType:
    """Schema used for the raw JSON parse: dates and binary come off the wire
    as strings (ISO-8601/epoch-millis, base64) and are coerced afterwards.
    geo_point fields parse as raw STRING whatever their JSON shape — Spark's
    JSON reader captures an object/array token verbatim when the schema says
    string — so all three ES wire forms survive to the coercion layer."""
    if geo:
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(_wire_type(dt.elementType, True), dt.containsNull)
        return T.StringType()
    if isinstance(dt, T.TimestampType):
        return T.StringType()
    if isinstance(dt, T.BinaryType):
        return T.StringType()
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_wire_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(dt.keyType, _wire_type(dt.valueType), dt.valueContainsNull)
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    f.name, _wire_type(f.dataType, _is_geo_field(f)), f.nullable, f.metadata
                )
                for f in dt.fields
            ]
        )
    return dt


def _geo_point_coerce(col: Column) -> Column:
    """Raw geo_point wire text -> struct(lat, lon), per document.

    ES accepts three wire shapes for one geo_point field —
    ``{"lat": 41.12, "lon": -71.34}``, ``[-71.34, 41.12]`` (GeoJSON order:
    LON first), and ``"41.12,-71.34"`` (lat first) — and the reference picks
    a parser by sampling one document (SURVEY.md §1.2).  Deciding per
    document from the leading character is strictly more lenient (mixed-form
    indices parse too) and stays whole-stage-codegen."""
    s = F.trim(col)
    arr = F.from_json(s, T.ArrayType(T.DoubleType()))
    parts = F.split(s, ",")
    num_pair = r"^-?\d+(\.\d+)?\s*,\s*-?\d+(\.\d+)?$"
    return (
        F.when(s.isNull(), F.lit(None).cast(GEO_POINT_STRUCT))
        .when(s.startswith("{"), F.from_json(s, GEO_POINT_STRUCT))
        .when(
            s.startswith("["),
            F.struct(
                F.element_at(arr, 2).alias("lat"), F.element_at(arr, 1).alias("lon")
            ),
        )
        .when(
            s.rlike(num_pair),
            F.struct(
                F.trim(parts.getItem(0)).cast("double").alias("lat"),
                F.trim(parts.getItem(1)).cast("double").alias("lon"),
            ),
        )
        # geohash / WKT / malformed: null point, not struct(null, null) —
        # loc.isNotNull() must not count documents with no parsed location
        .otherwise(F.lit(None).cast(GEO_POINT_STRUCT))
    )


def _coerce(col: Column, wire: T.DataType, target: T.DataType, geo: bool = False) -> Column:
    """Wire value -> target type, recursively (ScrollReader coercion parity).

    Dates: ISO-8601 string OR epoch-millis number, per document
    (DateUtils.parseDate parity).  Binary: base64 decode.  geo_point: the
    three ES wire shapes, per document."""
    if geo:
        if isinstance(target, T.ArrayType):
            return F.transform(
                col, lambda x: _coerce(x, wire.elementType, target.elementType, True)
            )
        return _geo_point_coerce(col)
    if isinstance(target, T.TimestampType):
        # try ISO-8601 first, then epoch millis (a bare number parses via
        # try_cast to long); both NULL -> stays NULL
        return F.coalesce(
            F.try_to_timestamp(col),
            F.timestamp_millis(col.try_cast("long")),
        )
    if isinstance(target, T.BinaryType):
        return F.unbase64(col)
    if isinstance(target, T.ArrayType):
        return F.transform(col, lambda x: _coerce(x, wire.elementType, target.elementType))
    if isinstance(target, T.MapType):
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(
                F.map_values(col), lambda v: _coerce(v, wire.valueType, target.valueType)
            ),
        )
    if isinstance(target, T.StructType):
        return F.struct(
            *[
                _coerce(
                    col.getField(f.name), wf.dataType, f.dataType, _is_geo_field(f)
                ).alias(f.name)
                for f, wf in zip(target.fields, wire.fields)
            ]
        )
    return col


def _needs_coercion_field(f: T.StructField) -> bool:
    return _is_geo_field(f) or _needs_coercion(f.dataType)


def _needs_coercion(dt: T.DataType) -> bool:
    if isinstance(dt, (T.TimestampType, T.BinaryType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _needs_coercion(dt.elementType)
    if isinstance(dt, T.MapType):
        return _needs_coercion(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_needs_coercion_field(f) for f in dt.fields)
    return False


def read_json_docs(
    spark: SparkSession,
    path: str,
    mapping: dict[str, Any] | T.StructType | None = None,
    array_include: str | list[str] | None = None,
    map_include: str | list[str] | None = None,
    rich_dates: bool = True,
    errors: str = "fail",
    include_fields: list[str] | None = None,
    exclude_fields: list[str] | None = None,
) -> DataFrame:
    """Read NDJSON documents into a typed DataFrame (§1.2 ingestion parity).

    ``mapping`` is an ES ``_mapping`` JSON body (or a ready StructType); when
    omitted the schema is inferred by Spark (sampling pass — fine for ad-hoc,
    fix the mapping for production).  ``errors``: fail|skip|log
    (es.read.data.error.handlers parity)."""
    if errors not in ("fail", "skip", "log"):
        raise ValueError("errors must be fail|skip|log")
    mode = {"fail": "FAILFAST", "skip": "DROPMALFORMED", "log": "PERMISSIVE"}[errors]

    if mapping is None:
        reader = spark.read.option("mode", mode)
        if errors == "log":
            reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
        df = reader.json(path)
    else:
        target = (
            mapping
            if isinstance(mapping, T.StructType)
            else mapping_to_struct(mapping, array_include, map_include, rich_dates)
        )
        wire = _wire_type(target)
        parse_schema = wire
        if errors == "log":
            parse_schema = T.StructType(
                list(wire.fields) + [T.StructField("_corrupt_record", T.StringType())]
            )
        reader = spark.read.schema(parse_schema).option("mode", mode)
        if errors == "log":
            reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
        df = reader.json(path)
        for f, wf in zip(target.fields, wire.fields):
            if _needs_coercion_field(f):
                df = df.withColumn(
                    f.name,
                    _coerce(F.col(f.name), wf.dataType, f.dataType, _is_geo_field(f)),
                )

    if include_fields:
        keep = [c for c in include_fields if c in df.columns]
        if errors == "log" and "_corrupt_record" in df.columns:
            keep.append("_corrupt_record")
        df = df.select(*keep)
    elif exclude_fields:
        df = df.drop(*[c for c in exclude_fields if c in df.columns])
    return df
