"""Sweep every corpus query's output schema for driver-canonicalizer traps.

The driver hashes results via pandas sort_values; array<T>, map<K,V> and
struct cells arrive as Python lists/dicts and raise `unhashable type`.
This prints every (query, column, type) whose type would break the hash —
only queries WITH an oracle matter (rows-only checks never canonicalize).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, "/root/repo")
from elasticsearch_hadoop_spark.corpus import load_all  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("sweep")
        .getOrCreate()
    )
    bad = []
    errs = []
    for name, spec in load_all().items():
        try:
            df = spec.fn(spark, SF_DIR)
            schema = df.schema
        except Exception as e:  # noqa: BLE001
            errs.append((name, repr(e)[:200]))
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString(), spec.oracle is not None))
    for name, col, typ, has_oracle in bad:
        tag = "ORACLE" if has_oracle else "rows-only"
        print(f"{tag:9s} {name:35s} {col:20s} {typ}")
    if errs:
        print("--- errors building plans ---")
        for name, e in errs:
            print(f"{name}: {e}")
    print(f"--- {len(bad)} flagged columns, {len(errs)} plan errors ---")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
