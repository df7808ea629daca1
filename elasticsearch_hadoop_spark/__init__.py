"""elasticsearch_hadoop_spark — a PySpark-native analytics engine with the
query / data-processing capabilities of elasticsearch-hadoop (reference:
aomokpo/elasticsearch-hadoop, surveyed in SURVEY.md).

The reference is a Spark<->Elasticsearch connector: its only dataflow
operators are scan / sink / pushdown-planning (SURVEY.md §2.A); every query
operator is delegated to Spark.  This package therefore provides:

- ``session``      — SparkSession factory tuned for columnar scans + AQE.
- ``catalog``      — the "index" abstraction (read_index / write_index),
                     parity with EsSparkSQL.esDF / saveToEs (SURVEY.md §2.A
                     A1-A8, §3.1-3.2).
- ``query_dsl``    — ES query-DSL JSON -> Column predicate compiler
                     (parity with DefaultSource.scala#translateFilter,
                     SURVEY.md §2.B).
- ``sources``      — JSON-document ingestion with the ES->Spark type mapping
                     (SURVEY.md §1.2).
- ``functions``    — text analysis (analyzer/match parity), similarity math.
- ``operators``    — driver-mandated extensions: dedup (exact / MinHash-LSH /
                     SimHash / n-gram Jaccard / embedding), similarity search
                     (brute-force + IVF), as-of join, multimodal columns.
- ``streaming``    — Structured Streaming sink/window helpers (parity with
                     EsSparkSqlStreamingSink, SURVEY.md §2.A A9).

Everything is DataFrame-first: Catalyst plans, Parquet pushdown, broadcast
joins, and whole-stage codegen do the heavy lifting; Python UDFs appear only
where Spark genuinely lacks the primitive, and then as Arrow-batched
pandas UDFs.
"""

import sys

# Spark Python workers do not inherit the driver's sys.path, so any UDF whose
# closure references a module-level name from this package would hit
# ModuleNotFoundError on the worker unless the package is importable there
# (it is only importable when the driver happens to run from the repo root).
# Registering the package for cloudpickle pickle-by-value makes every UDF
# closure self-contained: cloudpickle serializes the referenced functions'
# code instead of a module-path reference (parent-package registration covers
# all submodules).
try:
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older pyspark without the API
    pass

from elasticsearch_hadoop_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]

from elasticsearch_hadoop_spark.catalog import Catalog  # noqa: E402

__all__.append("Catalog")
