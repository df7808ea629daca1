"""CI hook: sweep every registered corpus query's OUTPUT SCHEMA for
complex-typed columns (array/map/struct) that would hit the driver's
raw-array serialization trap (round-1 `agg_collect_set` harness failure).

Builds each query's DataFrame plan at sf0.001 and checks the schema only —
no collect.  Note the write-path queries execute their (small) writes at
plan-build time; the whole sweep is a ~2 min local gate.

Usage: python tools/sweep_output_types.py [sf_dir]
Exit 0 = clean; exit 1 lists offending (query, column, type) triples.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from elasticsearch_hadoop_spark.corpus import load_all
    from elasticsearch_hadoop_spark.plans import complex_output_cols
    from elasticsearch_hadoop_spark.session import get_spark

    spark = get_spark(app_name="sweep_output_types", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    bad: list[tuple[str, str, str]] = []
    for name, spec in load_all().items():
        try:
            schema = spec.fn(spark, sf_dir).schema
        except Exception as ex:  # surfaced separately — a broken query is not a type issue
            bad.append((name, "<query raised>", str(ex)[:120]))
            continue
        types = dict(zip([f.name for f in schema.fields], [f.dataType for f in schema.fields]))
        for col in complex_output_cols(schema):
            bad.append((name, col, types[col].simpleString()))

    if bad:
        print("complex-typed output columns (driver hash is scalar-only):")
        for name, col, dt in bad:
            print(f"  {name:40} {col:25} {dt}")
        return 1
    print(f"clean: {len(load_all())} queries, all output columns scalar")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
