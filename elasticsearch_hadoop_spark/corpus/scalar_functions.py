"""Scalar-function corpus: string / date / math / array / JSON functions
(SURVEY.md §2.C "Scalar functions").  All JVM-side built-ins — zero Python
in the row path, so every query here stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       lower(p_name)  AS lname,
       upper(p_brand) AS ubrand,
       trim(concat('  ', p_type, ' ')) AS ttype,
       substr(p_name, 1, 8) AS name8,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_u,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       regexp_replace(p_type, '[AEIOU]', '*', 'g') AS devowel,
       CAST(length(p_name) AS INT) AS name_len,
       CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS lev_to_b11,
       contains(p_type, 'BRASS') AS has_brass,
       starts_with(p_name, 'a') AS starts_a,
       CAST(strpos(p_type, 'ED') AS INT) AS ed_pos,
       reverse(p_brand) AS rbrand,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4
FROM part
ORDER BY p_partkey
""",
)
def fn_string(spark, sf_dir):
    """String function battery (lower/upper/trim/substring/concat_ws/
    regexp_extract/regexp_replace/levenshtein/contains/locate/reverse/
    lpad)."""
    p = tbl(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.lower("p_name").alias("lname"),
            F.upper("p_brand").alias("ubrand"),
            F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("ttype"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_u"),
            F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("p_type", "[AEIOU]", "*").alias("devowel"),
            F.length("p_name").alias("name_len"),
            F.levenshtein("p_brand", F.lit("Brand#11")).alias("lev_to_b11"),
            F.contains("p_type", F.lit("BRASS")).alias("has_brass"),
            F.startswith("p_name", F.lit("a")).alias("starts_a"),
            F.locate("ED", F.col("p_type")).alias("ed_pos"),
            F.reverse("p_brand").alias("rbrand"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       CAST(year(o_orderdate) AS INT)      AS yr,
       CAST(month(o_orderdate) AS INT)     AS mo,
       CAST(day(o_orderdate) AS INT)       AS dy,
       CAST(dayofweek(o_orderdate) AS INT) AS dow,
       CAST(quarter(o_orderdate) AS INT)   AS qtr,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS INT)
           AS days_to_eoy,
       strftime(o_orderdate + INTERVAL '30 days', '%Y-%m-%d %H:%M:%S') AS due_ts,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
""",
)
def fn_date(spark, sf_dir):
    """Date/time function battery. DuckDB dayofweek(): Sunday=0; Spark
    dayofweek(): Sunday=1 — bridged with (dayofweek-1). All outputs are
    formatted strings or day-granularity ints -> session-tz-invariant."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return (
        o.select(
            "o_orderkey",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dy"),
            (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
            F.quarter("o_orderdate").alias("qtr"),
            F.datediff(F.lit("1998-12-31").cast("timestamp"), F.col("o_orderdate")).alias(
                "days_to_eoy"
            ),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd HH:mm:ss"
            ).alias("due_ts"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 6)       AS abs_d,
       CAST(ceil(l_quantity) AS BIGINT)       AS ceil_q,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
       round(sqrt(l_quantity), 6)             AS sqrt_q,
       round(exp(l_discount), 6)              AS exp_d,
       round(ln(l_extendedprice), 6)          AS ln_p,
       round(log10(l_extendedprice), 6)       AS log10_p,
       round(pow(l_quantity, 2), 4)           AS q_sq,
       CAST(l_orderkey % 7 AS BIGINT)         AS mod7,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
       round(greatest(l_tax, l_discount), 6)  AS max_rate,
       round(least(l_tax, l_discount), 6)     AS min_rate
FROM lineitem
WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
""",
)
def fn_math(spark, sf_dir):
    """Math function battery."""
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
            F.ceil("l_quantity").alias("ceil_q"),
            F.floor("l_extendedprice").alias("floor_p"),
            F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
            F.round(F.exp("l_discount"), 6).alias("exp_d"),
            F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
            F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("q_sq"),
            (F.col("l_orderkey") % 7).alias("mod7"),
            F.signum(F.col("l_discount") - 0.05).alias("sgn"),
            F.round(F.greatest("l_tax", "l_discount"), 6).alias("max_rate"),
            F.round(F.least("l_tax", "l_discount"), 6).alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_array",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
)
SELECT doc_id,
       CAST(len(tokens) AS INT) AS n_tokens,
       CAST(len(list_distinct(tokens)) AS INT) AS n_distinct,
       list_contains(tokens, 'table') AS has_table,
       list_sort(list_distinct(tokens))[1] AS first_tok,
       CAST(list_sum(list_transform(tokens, t -> length(t))) AS BIGINT) AS total_chars,
       coalesce(array_to_string(list_sort(list_filter(list_distinct(tokens), t -> length(t) >= 8)), ','), '') AS long_toks,
       array_to_string(list_slice(tokens, 1, 3), ' ') AS head3
FROM toks
ORDER BY doc_id
""",
)
def fn_array(spark, sf_dir):
    """Array/higher-order function battery: split, size, array_distinct,
    array_contains, sort_array, transform+aggregate (fold), filter, slice.
    All native — F.transform/F.aggregate compile to Catalyst HigherOrderFunctions,
    no Python in the loop."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.array_contains(toks, "table").alias("has_table"),
            F.sort_array(F.array_distinct(toks)).getItem(0).alias("first_tok"),
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
            F.array_join(
                F.sort_array(F.filter(F.array_distinct(toks), lambda t: F.length(t) >= 8)),
                ",",
            ).alias("long_toks"),
            F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head3"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_extract,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
       json_extract_string(props, '$.k') AS k_str
FROM events
ORDER BY event_id
""",
)
def fn_json(spark, sf_dir):
    """JSON functions over events.props (from_json — the fixture column
    FIXTURES.md calls out).  The document is parsed ONCE per row: all three
    outputs derive from a single from_json extraction with a string-typed
    field (Jackson returns the raw scalar text — exactly what
    get_json_object yields), and the numeric columns cast that text.  The
    previous shape ran get_json_object twice plus a typed from_json — up to
    three Jackson parses per row (measured with the noop sink: 1.59 s ->
    0.83 s at sf0.1); the oracle itself defines k_extract and k_typed as
    the same CAST(json_extract(..)), so the shared parse is the exact
    twin."""
    ev = tbl(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.StringType())])
    return (
        ev.select("event_id", F.from_json("props", schema).getField("k").alias("k_str"))
        .select(
            "event_id",
            F.col("k_str").cast("bigint").alias("k_extract"),
            F.col("k_str").cast("bigint").alias("k_typed"),
            "k_str",
        )
        .orderBy("event_id")
    )


@query(
    "fn_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS bal_class,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
       (c_acctbal BETWEEN 0 AND 1000) AS small_pos,
       if(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
FROM customer
ORDER BY c_custkey
""",
)
def fn_conditional(spark, sf_dir):
    """CASE/WHEN, coalesce, nullif, between, if."""
    c = tbl(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("rich")
            .alias("bal_class"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
                "seg_masked"
            ),
            F.col("c_acctbal").between(0, 1000).alias("small_pos"),
            F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("nation_parity"),
        )
        .orderBy("c_custkey")
    )
