"""UDF-surface corpus (SURVEY.md §2.C "UDF surface"): scalar row UDF,
vectorized pandas UDF, GROUPED_AGG UDAF, applyInPandas grouped-map, and a
Python UDTF — each with a pure-SQL DuckDB oracle so the custom-code paths
are hash-gated like everything else.

Reference parity: the connector itself ships no UDFs; its users run Spark
UDFs over ES-scanned rows (itests do exactly that). What we gate here is the
*engine mechanics*: closure pickling to workers, Arrow batch transfer,
grouped-map schema contracts, UDTF lateral joins.

Scale notes:
- pandas UDFs move data Python-side via Arrow — ~10-100x over row UDFs but
  still off the JVM fast path; every query here has a pure-Column rewrite
  (shown in the sibling corpus modules) which is what you'd ship at 100 TB.
  The row UDF is deliberately on the smallest table (supplier).
- applyInPandas materializes each group in one pandas frame: requires
  bounded group cardinality (here: mktsegment, 5 groups of ~30k rows at
  sf0.1 — fine; never key by a high-skew column without salting).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "udf_row_scalar",
    oracle="""
SELECT s_suppkey,
       upper(s_name) || '#' || CAST(s_nationkey AS VARCHAR) AS tag
FROM supplier
ORDER BY s_suppkey
""",
)
def udf_row_scalar(spark, sf_dir):
    """Row-at-a-time Python UDF — the documented slow path, kept to the
    10-row supplier table; exists to gate closure pickling + per-row serde."""

    @F.udf(returnType=T.StringType())
    def tag(name: str, nation: int) -> str:
        return f"{name.upper()}#{nation}"

    s = tbl(spark, sf_dir, "supplier")
    return s.select("s_suppkey", tag("s_name", "s_nationkey").alias("tag")).orderBy("s_suppkey")


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 35 THEN 'mid'
            ELSE 'high' END AS qty_band
FROM lineitem
WHERE l_orderkey < 1000
ORDER BY l_orderkey, l_linenumber
""",
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized @pandas_udf (Arrow batches, pandas ops inside)."""

    @F.pandas_udf(T.StringType())
    def band(q: pd.Series) -> pd.Series:
        out = pd.Series("high", index=q.index)
        out[q < 35] = "mid"
        out[q < 10] = "low"
        return out

    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return (
        li.select("l_orderkey", "l_linenumber", band("l_quantity").alias("qty_band"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "udaf_weighted_avg",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS w_avg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def udaf_weighted_avg(spark, sf_dir):
    """GROUPED_AGG pandas UDF (UDAF): quantity-weighted mean price.
    NB: unlike built-in aggs this has no partial/merge decomposition — each
    group's values ship to one worker. Fine for 3 groups; at 100 TB prefer
    the two-sum Column rewrite in the oracle."""

    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("w_avg_price"))
        .orderBy("l_returnflag")
    )


@query(
    "udf_grouped_zscore",
    oracle="""
SELECT c_custkey,
       round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 6) AS bal_z
FROM customer
ORDER BY c_custkey
""",
)
def udf_grouped_zscore(spark, sf_dir):
    """applyInPandas grouped-map: z-score of acctbal within mktsegment.
    The whole group arrives as one pandas frame (schema contract enforced
    by the declared DDL string)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "bal_z": ((pdf["c_acctbal"] - mu) / sd).round(6)}
        )

    c = tbl(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(zscore, schema="c_custkey bigint, bal_z double")
        .orderBy("c_custkey")
    )


@query(
    "udtf_bigrams",
    oracle="""
SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 5)
ORDER BY doc_id, bigram
""",
)
def udtf_bigrams(spark, sf_dir):
    """Python UDTF in a LATERAL join: one input row → N bigram rows.
    (Spark 3.5+ UserDefinedTableFunction; the set-returning analogue of the
    explode-based query in lateral_ops.py.)"""

    @F.udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            toks = [t for t in (text or "").split(" ") if t]
            for a, b in zip(toks, toks[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("bigrams", Bigrams)
    tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 5).createOrReplaceTempView(
        "docs_small"
    )
    return spark.sql(
        """
        SELECT d.doc_id, b.bigram
        FROM docs_small d, LATERAL bigrams(d.text) b
        ORDER BY d.doc_id, b.bigram
        """
    )
