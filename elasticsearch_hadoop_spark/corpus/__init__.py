"""The t2 query corpus: every operator from SURVEY.md §2.C, as a named
(spark_query, duckdb_oracle_sql) pair.

``REGISTRY`` maps name -> QuerySpec.  ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over it.  Keeping the Spark code and the
oracle SQL adjacent is the point: the driver's harness hashes both sides
column-name-sorted, so aliases must agree exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every corpus module (side-effect: fills REGISTRY)."""
    from elasticsearch_hadoop_spark.corpus import (  # noqa: F401
        aggregates,
        aggs_dsl_queries,
        dedup,
        geo,
        joins,
        lateral_ops,
        multimodal,
        pushdown,
        scalar_functions,
        similarity,
        streaming_batch,
        streaming_live,
        subqueries,
        text_analysis,
        tpch_full,
        tpch_more,
        udf_surface,
        windows,
    )

    return REGISTRY
