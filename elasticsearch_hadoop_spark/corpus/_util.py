"""Shared helpers for corpus queries.

Conventions (FIXTURES.md "Harness conventions"):
- every query ends with an explicit ORDER BY on a unique key combination;
- returned doubles are rounded identically on both sides (2 dp for large
  money sums, 6 dp for ratios/averages) so float-summation-order noise
  cannot flip the driver's value hash;
- returned timestamps are formatted to strings (session-timezone-invariant:
  naive parquet wall-clock -> internal -> same wall-clock string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
# events.ts carries microseconds (observed at sf0.001)
TS_US_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_US_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism — but ONLY when
    the input is under-split.  The fixture documents/embeddings tables are
    single small parquet files -> one scan task; CPU-heavy per-row ops
    (signatures, pairwise verify) would run serially without this.  On a
    real multi-split scan (the 100 TB case: thousands of file splits) the
    guard makes this a no-op, so no corpus query embeds an unconditional
    full shuffle of the corpus.  The partition probe plans the scan but
    launches no job."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def local_rows(spark: SparkSession, data: list, schema: str) -> DataFrame:
    """A handful of driver-local rows as a SINGLE-partition DataFrame.
    ``spark.createDataFrame(list, ...)`` slices the list across
    defaultParallelism partitions (32 on the bench box) — a subsequent
    write job then runs 32 near-empty tasks and leaves one file per
    non-empty slice (measured: 0.62 s vs 0.32 s per tiny write, and the
    read-back lists a directory of shards for 3 rows).  One partition is
    the honest shape for metadata-sized frames at any scale."""
    return spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table.  events.ts is parquet TIMESTAMP(NANOS), which
    Spark 4 refuses outright [PARQUET_TYPE_ILLEGAL]; read it as nanos-long
    (legacy conf, runtime-settable) and floor-convert to micros — the exact
    truncation DuckDB applies, so oracles agree to the microsecond."""
    # The driver hands corpus queries ITS session; wall-clock <-> string
    # round-trips are only stable under one tz (session.py pins UTC for our
    # own sessions — pin it here too, it is runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = None
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
