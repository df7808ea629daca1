"""Driver contract for the spark-graft builder (PySpark target).

entry/queries/oracle_sql are thin views over
elasticsearch_hadoop_spark.corpus.REGISTRY — each corpus module declares
its Spark query and DuckDB oracle side by side (same aliases, same
ordering, same rounding), which is what keeps the driver's
column-name-sorted value hash stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from elasticsearch_hadoop_spark.corpus import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.C."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query;
    rows-only ops (sketches, pandas-UDF stages) are omitted by design."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
