"""Round-13 net-new graded surface: the WIDENED `?q=` URI-lite grammar
(VERDICT r12 item 4 — wildcards ``field:va*``/``field:v?``, bracket
ranges ``[a TO b]`` / ``{a TO b}`` with ``*`` open bounds, comparison
shorthands ``field:>n``; ``query_dsl.uri_leaf_kind``) on both of its
surfaces: the ``es.query`` filter veneer (``compile_query`` on a
string) and the scored QSTR path under ES|QL ``METADATA _score``,
where non-term leaves contribute Lucene's constant_score 1.0 instead
of BM25.

Same contract as every corpus module: the Spark query and the DuckDB
oracle sit side by side with identical aliases and rounding, so the
driver's column-sorted value hash compares them exactly.
"""

from __future__ import annotations

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "query_dsl_uri_extended",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ((source LIKE 'src1_' AND n_chars > 100 AND n_chars <= 400)
       OR source LIKE 's%2'
       OR n_chars >= 500)
ORDER BY doc_id
""",
)
def query_dsl_uri_extended(spark, sf_dir):
    """The widened `?q=` URI-lite grammar (round 13; reference: raw
    es.query URI form, SURVEY.md §2.B prefix/wildcard + range rows) in
    one left-associative expression: a `?`-wildcard (`src1?` — exactly
    one trailing char, LIKE 'src1_' with the engine escaping LIKE's own
    metacharacters), a mixed-bracket range (`{100 TO 400]` — exclusive
    lower, inclusive upper), a `*`-wildcard (`s*2`), and a `>=`
    comparison shorthand.  All four leaf kinds compile through the
    single-source ``uri_leaf_kind`` dispatch, so this exercises exactly
    the grammar the scored QSTR path gates on.  Plan: one parquet scan
    with the whole predicate codegen'd — no Python, no shuffle before
    the final sort.  Scale honesty: a top-level OR with a generic-LIKE
    leg converts to NO parquet filter (Spark pushes Or only when every
    leg converts), so this shape scans all row groups and filters
    post-scan — the same cost ES pays walking the terms index for a
    leading-wildcard; conjunctive eq/range/prefix `?q=` forms DO push
    (plan-pinned in tests/test_plans.py)."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    d = tbl(spark, sf_dir, "documents")
    return (
        d.filter(
            compile_query(
                "source:src1? AND n_chars:{100 TO 400]"
                " OR source:s*2 OR n_chars:>=500"
            )
        )
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "esql_qstr_constant_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, n_chars, source,
         list_filter(string_split_regex(lower(lang), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS toks
  FROM documents
), stats AS (
  -- docCount semantics (Lucene): only documents with at least one
  -- analyzed term enter N and avgdl
  SELECT count(CASE WHEN len(toks) > 0 THEN 1 END)::DOUBLE AS n,
         sum(len(toks))::DOUBLE AS sdl,
         sum(list_contains(toks, 'en')::INT)::DOUBLE AS df1
  FROM tok
), scored AS (
  SELECT doc_id, lang, n_chars, source,
         len(toks)::DOUBLE AS dl,
         len(list_filter(toks, x -> x = 'en'))::DOUBLE AS tf1
  FROM tok
), withnorm AS (
  SELECT doc_id, lang, n_chars, source, tf1,
         1.2 * (0.25 + (0.75 * dl) / (sdl / n)) AS nrm,
         ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) AS idf1
  FROM scored, stats
), s AS (
  -- the term leaf pays its BM25 gated on ITS OWN equality predicate;
  -- the range and wildcard leaves pay Lucene's constant_score 1.0
  -- gated on their own predicates — no corpus statistics
  SELECT doc_id, lang, n_chars,
         (CASE WHEN lang = 'en' THEN
             CASE WHEN tf1 > 0
                  THEN idf1 * ((tf1 * 2.2) / (tf1 + nrm)) ELSE 0.0 END
          ELSE 0.0 END)
       + (CASE WHEN n_chars >= 400 THEN 1.0 ELSE 0.0 END)
       + (CASE WHEN source LIKE 'src1%' THEN 1.0 ELSE 0.0 END) AS raw
  FROM withnorm
  WHERE lang = 'en' OR n_chars >= 400 OR source LIKE 'src1%'
)
SELECT doc_id, lang, n_chars, round(raw, 6) AS score
FROM s
ORDER BY raw DESC, doc_id
LIMIT 15
""",
)
def esql_qstr_constant_score(spark, sf_dir):
    """Scored QSTR over the WIDENED grammar (round 13): a term leaf
    (`lang:en`) pays its BM25 gated on its own equality predicate, while
    the range leaf (`n_chars:[400 TO *]`) and the wildcard leaf
    (`source:src1*`) pay a CONSTANT 1.0 gated on their own predicates —
    Lucene rewrites multi-term/range queries under query_string to
    constant_score (boost 1.0, no corpus statistics) and a
    ConstantScoreQuery clause adds its boost to the BooleanQuery sum.
    The filter and the score gates share the single-source
    ``uri_leaf_kind`` classification, so a document filtered in through
    the range branch scores exactly the constants of the leaves it
    matches.  Corpus statistics for the term leaf compute over the
    WHERE's input frame (the engine's documented per-shard-stats
    equivalent); the oracle replays the exact Lucene formula plus the
    gated constants.  Plan shape: ONE 1-row stats aggregation broadcast
    back (the single term field) + one scoring projection, ending in
    TakeOrderedAndProject — 2 corpus scans, no window, no global sort,
    no Python."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )
    return esql(
        "FROM documents METADATA _score"
        ' | WHERE QSTR("lang:en OR n_chars:[400 TO *] OR source:src1*")'
        " | SORT _score DESC, doc_id"
        " | LIMIT 15"
        " | EVAL score = ROUND(_score, 6)"
        " | KEEP doc_id, lang, n_chars, score",
        tables={"documents": docs},
    )
