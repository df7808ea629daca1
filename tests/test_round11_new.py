"""Round-11 surface: TOP inside ES|QL TS STATS (shared _agg_with_tops
machinery), the bucket_count_ks_test sibling pipeline, collapse with a
real inner_hits sub-request, and the ADVICE-r10 fixes (geo_line helper
naming, explain_doc predicate text)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs
from elasticsearch_hadoop_spark.esql import EsqlError, esql


# ---------------------------------------------------------------- TS TOP


def _ts_frame(spark):
    rows = [
        # (host, day, value) — host is the dimension, day the BY bucket
        ("a", "2024-01-01", 1.0),
        ("a", "2024-01-01", 2.0),
        ("a", "2024-01-01", 3.0),
        ("b", "2024-01-01", 5.0),
        ("b", "2024-01-01", None),
        ("c", "2024-01-01", 7.0),
        ("c", "2024-01-01", 8.0),
        ("d", "2024-01-01", 9.0),
        ("a", "2024-01-02", 4.0),
        ("b", "2024-01-02", 6.0),
    ]
    df = spark.createDataFrame(rows, "host string, day string, value double")
    return df.withColumn("ts", F.to_timestamp("day"))


def test_ts_stats_top_matches_brute_force(spark):
    """TOP(COUNT_OVER_TIME(v), 2, 'desc') == per-series counts, top-2 per
    group, computed by hand."""
    df = _ts_frame(spark)
    out = esql(
        'TS t | STATS tc = TOP(COUNT_OVER_TIME(value), 2, "desc"),'
        " mx = MAX(MAX_OVER_TIME(value))"
        " BY day",
        tables={"t": df},
        time_series={"t": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    got = {r["day"]: (list(r["tc"]), r["mx"]) for r in out.collect()}
    # day 1: series counts a=3, b=1 (null skipped), c=2, d=1 -> top2 [3,2]
    assert got["2024-01-01"] == ([3, 2], 9.0)
    # day 2: a=1, b=1 -> [1, 1]
    assert got["2024-01-02"] == ([1, 1], 6.0)


def test_ts_stats_top_asc_and_only_top(spark):
    """A TS STATS whose ONLY aggregate is a TOP (no base aggregate to join
    back onto) still works — the first frame becomes the base."""
    df = _ts_frame(spark)
    out = esql(
        'TS t | STATS lo = TOP(SUM_OVER_TIME(value), 3, "asc") BY day',
        tables={"t": df},
        time_series={"t": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    got = {r["day"]: list(r["lo"]) for r in out.collect()}
    # day 1 series sums: a=6, b=5, c=15, d=9 -> asc top3 [5, 6, 9]
    assert got["2024-01-01"] == [5.0, 6.0, 9.0]
    assert got["2024-01-02"] == [4.0, 6.0]


def test_ts_stats_top_bounded_plan(spark):
    """The TOP over the per-series frame plans WindowGroupLimit
    Partial+Final — the per-series rows (millions at TSDS cardinality)
    cap map-side before the group exchange."""
    df = _ts_frame(spark)
    out = esql(
        'TS t | STATS tc = TOP(COUNT_OVER_TIME(value), 2, "desc"),'
        " mx = MAX(MAX_OVER_TIME(value)) BY day",
        tables={"t": df},
        time_series={"t": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    from elasticsearch_hadoop_spark.plans import count_nodes, formatted_plan

    plan = formatted_plan(out)
    assert count_nodes(plan, "WindowGroupLimit") == 2
    assert ", 2, Partial" in plan


def test_ts_stats_top_validation(spark):
    df = _ts_frame(spark)
    ts = {"t": {"dimensions": ["host"], "timestamp": "ts"}}
    with pytest.raises(EsqlError, match=">= 1"):
        esql(
            'TS t | STATS x = TOP(COUNT_OVER_TIME(value), 0, "desc") BY day',
            tables={"t": df}, time_series=ts,
        )
    with pytest.raises(EsqlError, match="asc|desc"):
        esql(
            'TS t | STATS x = TOP(COUNT_OVER_TIME(value), 2, "sideways") BY day',
            tables={"t": df}, time_series=ts,
        )
    # in a TS STATS (one that uses a ts function anywhere), every
    # aggregate — TOP included — must wrap a time-series function; a
    # row-level TOP mixed in raises (a FULLY row-level STATS over a TS
    # source stays legal: it routes to the plain _stats path)
    with pytest.raises(EsqlError, match="time-series"):
        esql(
            'TS t | STATS x = TOP(value, 2, "desc"),'
            " y = MAX(MAX_OVER_TIME(value)) BY day",
            tables={"t": df}, time_series=ts,
        )
    with pytest.raises(EsqlError, match="TOP needs"):
        esql(
            'TS t | STATS x = TOP(COUNT_OVER_TIME(value)) BY day',
            tables={"t": df}, time_series=ts,
        )


# ------------------------------------------------- bucket_count_ks_test


from tests.refs_round11 import ks_test_ref as _ks_reference  # noqa: E402


def _ks_run(spark, rows, body):
    df = spark.createDataFrame([(k,) for k in rows], "k string")
    return compile_aggs(
        df,
        {
            "b": {"terms": {"field": "k", "size": 100, "order": {"_key": "asc"}}},
            "ks": {"bucket_count_ks_test": {"buckets_path": "b>_count", **body}},
        },
    ).collect()


def test_ks_test_matches_reference(spark):
    rows = ["a"] * 10 + ["b"] * 30 + ["c"] * 20 + ["d"] * 40
    got = _ks_run(
        spark, rows, {"alternative": ["less", "greater", "two_sided"]}
    )[0]
    ref = _ks_reference([10, 30, 20, 40])
    assert got["ks_less"] == pytest.approx(ref["less"], abs=1e-12)
    assert got["ks_greater"] == pytest.approx(ref["greater"], abs=1e-12)
    assert got["ks_two_sided"] == pytest.approx(ref["two_sided"], abs=1e-12)


def test_ks_test_fractions_and_sampling(spark):
    rows = ["a"] * 10 + ["b"] * 30 + ["c"] * 20 + ["d"] * 40
    fr = [0.4, 0.3, 0.2, 0.1]
    for sampling in ("uniform", "upper_tail", "lower_tail"):
        got = _ks_run(
            spark,
            rows,
            {
                "alternative": ["less", "greater"],
                "fractions": fr,
                "sampling_method": sampling,
            },
        )[0]
        ref = _ks_reference([10, 30, 20, 40], fr, sampling)
        assert got["ks_less"] == pytest.approx(ref["less"], abs=1e-12), sampling
        assert got["ks_greater"] == pytest.approx(ref["greater"], abs=1e-12), sampling


def test_ks_test_perfect_fit_p_is_one(spark):
    """Counts exactly matching the fractions: d = 0, every p-value 1."""
    rows = ["a"] * 10 + ["b"] * 30
    got = _ks_run(
        spark,
        rows,
        {"alternative": ["less", "greater", "two_sided"], "fractions": [0.25, 0.75]},
    )[0]
    assert got["ks_less"] == pytest.approx(1.0)
    assert got["ks_greater"] == pytest.approx(1.0)
    assert got["ks_two_sided"] == pytest.approx(1.0)


def test_ks_test_fractions_length_mismatch_raises(spark):
    """Review r11d: a fractions list shorter than the bucket count would
    silently drop the tail CDF points from the sup (understating D) — it
    must raise instead (runtime assert: the bucket count is data)."""
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="fractions has"):
        _ks_run(
            spark,
            ["a", "b", "c", "d"],
            {"alternative": ["two_sided"], "fractions": [0.5, 0.5]},
        )


def test_ks_test_all_zero_counts_p_one(spark):
    """Review r11d: an all-zero metric path (no data) yields d=0, p=1 —
    not an ANSI divide-by-zero."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame(
        [("a", None), ("b", None)], "k string, v double"
    )
    out = compile_aggs(
        df,
        {
            "b": {
                "terms": {"field": "k", "size": 10, "order": {"_key": "asc"}},
                "aggs": {"zc": {"value_count": {"field": "v"}}},
            },
            "ks": {
                "bucket_count_ks_test": {
                    "buckets_path": "b>zc",
                    "alternative": ["less", "greater", "two_sided"],
                }
            },
        },
    ).collect()
    for r in out:
        assert r["ks_less"] == 1.0
        assert r["ks_greater"] == 1.0
        assert r["ks_two_sided"] == 1.0


def test_bm25_empty_analyzed_docs_outside_doccount(spark):
    """Review r11d: an empty-analyzed field (present, zero tokens) leaves
    no postings or norm in Lucene — it sits outside N and avgdl."""
    from elasticsearch_hadoop_spark.search import bm25_corpus_stats, bm25_score
    from tests.refs_round11 import bm25_ref

    df = spark.createDataFrame(
        [(1, "hash join"), (2, ""), (3, "!!!")], "id int, text string"
    )
    st = bm25_corpus_stats(df, "text", ["hash"])
    assert st["doc_count"] == 1 and st["sum_dl"] == 2
    got = {r["id"]: r["_score"] for r in bm25_score(df, "text", "hash").collect()}
    ref = bm25_ref([["hash", "join"], [], []], ["hash"])
    assert set(got) == {1}
    assert got[1] == pytest.approx(ref[0], abs=1e-12)


def test_collapse_inner_hits_name_collision_raises(spark):
    from elasticsearch_hadoop_spark.search import collapse_inner_hits

    df = spark.createDataFrame([(1, 2, 3.0)], "grp int, ih int, v double")
    with pytest.raises(ValueError, match="collides"):
        collapse_inner_hits(
            df, "grp", sort=[{"v": "desc"}],
            inner_hits={"name": "ih", "size": 1, "sort": [{"v": "desc"}]},
        )


def test_ks_test_validation(spark):
    with pytest.raises(AggsDslError, match="alternative"):
        _ks_run(spark, ["a", "b"], {"alternative": ["sideways"]})
    with pytest.raises(AggsDslError, match="sampling_method"):
        _ks_run(spark, ["a", "b"], {"sampling_method": "bootstrap"})
    with pytest.raises(AggsDslError, match="fractions"):
        _ks_run(spark, ["a", "b"], {"fractions": [0.0, 0.0]})
    # review r11a: a negative entry builds a non-monotone reference CDF
    with pytest.raises(AggsDslError, match="non-negative"):
        _ks_run(spark, ["a", "b"], {"fractions": [0.5, -0.2, 0.7]})


# -------------------------------------------------- collapse inner_hits


def test_collapse_inner_hits_reference(spark):
    from elasticsearch_hadoop_spark.search import collapse_inner_hits

    rows = [
        # (grp, id, ts, score)
        (1, 10, 5, 1.0),
        (1, 11, 9, 3.0),   # representative (latest ts)
        (1, 12, 7, 2.0),
        (1, 13, 1, 2.0),   # ties with id 12 on score -> id asc
        (2, 20, 2, 9.0),   # representative AND top inner hit
    ]
    df = spark.createDataFrame(rows, "grp int, id int, ts int, score double")
    out = collapse_inner_hits(
        df,
        "grp",
        sort=[{"ts": "desc"}, {"id": "asc"}],
        inner_hits={"name": "ih", "size": 3,
                    "sort": [{"score": "desc"}, {"id": "asc"}]},
        inner_cols=["id", "score"],
    ).orderBy("grp")
    got = out.collect()
    assert [r["id"] for r in got] == [11, 20]  # main sort picks latest ts
    assert [x["id"] for x in got[0]["ih"]] == [11, 12, 13]  # inner sort
    assert [x["id"] for x in got[1]["ih"]] == [20]


def test_collapse_inner_hits_null_group_keeps_inner(spark):
    """Review r11a: the rep->inner join is null-safe — a NULL collapse-key
    group (collapse/groupBy both group nulls) keeps its inner array."""
    from elasticsearch_hadoop_spark.search import collapse_inner_hits

    rows = [(None, 1, 5, 1.0), (None, 2, 9, 3.0), (1, 3, 2, 2.0)]
    df = spark.createDataFrame(rows, "grp int, id int, ts int, score double")
    out = collapse_inner_hits(
        df, "grp", sort=[{"ts": "desc"}, {"id": "asc"}],
        inner_hits={"name": "ih", "size": 2,
                    "sort": [{"score": "desc"}, {"id": "asc"}]},
        inner_cols=["id"],
    ).orderBy(F.col("grp").asc_nulls_first())
    got = out.collect()
    assert got[0]["grp"] is None and [x["id"] for x in got[0]["ih"]] == [2, 1]
    assert got[1]["grp"] == 1 and [x["id"] for x in got[1]["ih"]] == [3]


def test_collapse_inner_hits_validation(spark):
    from elasticsearch_hadoop_spark.search import collapse_inner_hits

    df = spark.createDataFrame([(1, 1)], "grp int, v int")
    with pytest.raises(ValueError, match="sort"):
        collapse_inner_hits(df, "grp", sort=[{"v": "desc"}], inner_hits={"size": 2})
    with pytest.raises(ValueError, match=">= 1"):
        collapse_inner_hits(
            df, "grp", sort=[{"v": "desc"}],
            inner_hits={"size": 0, "sort": [{"v": "asc"}]},
        )


# ------------------------------------------------------ ADVICE r10 fixes


def test_geo_line_dotted_agg_name(spark):
    """ADVICE r10: a dotted geo_line agg name must not be parsed as
    struct-field access by the helper rank column."""
    rows = [(1, 1.0, 10.0, 20.0), (1, 2.0, 11.0, 21.0), (1, 3.0, 12.0, 22.0)]
    df = spark.createDataFrame(rows, "g int, s double, lat double, lon double")
    df = df.withColumn("pt", F.struct(F.col("lat"), F.col("lon"))).drop("lat", "lon")
    out = compile_aggs(
        df,
        {
            "by_g": {
                "terms": {"field": "g", "size": 10},
                "aggs": {
                    "my.line": {
                        "geo_line": {
                            "point": {"field": "pt"},
                            "sort": {"field": "s"},
                            "size": 2,
                        }
                    }
                },
            }
        },
    ).collect()
    line = out[0]["my.line"]
    assert [list(p) for p in line] == [[20.0, 10.0], [21.0, 11.0]]


def test_explain_doc_explanation_is_predicate_text(spark):
    from elasticsearch_hadoop_spark.search import explain_doc

    df = spark.createDataFrame([(1, "open"), (2, "closed")], "_id int, st string")
    hit = explain_doc(df, 1, {"term": {"st": "open"}}, id_col="_id")
    assert hit["matched"] is True
    assert not hit["explanation"].startswith("Column<")
    assert "open" in hit["explanation"]


def test_bm25_matches_python_reference(spark):
    """bm25_score == the formula replayed in plain Python (exact doubles:
    every input is an integer)."""
    from elasticsearch_hadoop_spark.search import bm25_score

    docs = [
        (1, "spark joins hash join hash"),
        (2, "merge join strategies"),
        (3, "broadcast hash maps"),
        (4, "unrelated text entirely"),
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    out = {
        r["id"]: r["_score"]
        for r in bm25_score(df, "text", "hash join").collect()
    }

    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75

    def ref(i):
        s = 0.0
        for t in ("hash", "join"):
            dfc = sum(1 for v in toks.values() if t in v)
            tf = toks[i].count(t)
            idf = math.log(1 + (n - dfc + 0.5) / (dfc + 0.5))
            s += idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1 - b + (b * len(toks[i])) / avgdl)))
        return s

    assert set(out) == {1, 2, 3}  # doc 4 matches nothing -> excluded
    for i in out:
        assert out[i] == pytest.approx(ref(i), abs=1e-12)
    # doc 1 has the most query-term mass -> ranks first
    assert max(out, key=out.get) == 1


def test_bm25_duplicate_query_terms_double_the_clause(spark):
    from elasticsearch_hadoop_spark.search import bm25_score

    df = spark.createDataFrame(
        [(1, "hash table"), (2, "other words")], "id int, text string"
    )
    once = bm25_score(df, "text", "hash").collect()[0]["_score"]
    twice = bm25_score(df, "text", "hash hash").collect()[0]["_score"]
    assert twice == pytest.approx(2 * once, abs=1e-12)


def test_bm25_edge_params_and_validation(spark):
    from elasticsearch_hadoop_spark.search import bm25_score, bm25_topk

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c")], "id int, text string"
    )
    # b=0: no length normalization -> doc 1's higher tf wins outright
    r = {x["id"]: x["_score"] for x in bm25_score(df, "text", "a", b=0.0).collect()}
    assert r[1] > r[2]
    # k1=0: tf saturates completely -> equal scores for any tf > 0; a
    # NON-matching doc must not trip the 0/0 ANSI division (review r11b)
    df0 = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c"), (3, "zz")], "id int, text string"
    )
    r0 = {x["id"]: x["_score"] for x in bm25_score(df0, "text", "a", k1=0.0).collect()}
    assert set(r0) == {1, 2} and r0[1] == pytest.approx(r0[2], abs=1e-12)
    # an all-empty corpus has avgdl=0: nothing matches, nothing raises
    dfe = spark.createDataFrame([(1, ""), (2, "")], "id int, text string")
    assert bm25_score(dfe, "text", "a").count() == 0


def test_bm25_null_field_outside_stats_and_null_score(spark):
    """Review r11b: N/avgdl are the field's docCount stats (Lucene's
    avgFieldLength excludes docs missing the field), and a NULL-field row
    scores NULL (absent), not 0.0 (no match), under matched_only=False."""
    from elasticsearch_hadoop_spark.search import bm25_score

    df = spark.createDataFrame([(1, "a b"), (2, None)], "id int, text string")
    rows = {r["id"]: r["_score"]
            for r in bm25_score(df, "text", "a", matched_only=False).collect()}
    assert rows[2] is None
    # N=1, df=1, avgdl=2, dl=2, tf=1:
    # idf = ln(1 + 0.5/1.5); norm = k1*(1-b+b*1) = k1; tf_norm = 2.2/(1+1.2)
    k1, b = 1.2, 0.75
    expect = math.log(1 + 0.5 / 1.5) * (2.2 / (1 + k1))
    assert rows[1] == pytest.approx(expect, abs=1e-12)


def test_bm25_precomputed_stats_match_inline(spark):
    """bm25_corpus_stats + stats= reproduces the inline two-pass scores
    exactly (the index-build amortization path), and guards missing df."""
    from elasticsearch_hadoop_spark.search import bm25_corpus_stats, bm25_score

    df = spark.createDataFrame(
        [(1, "hash join hash"), (2, "sort merge join"), (3, None)],
        "id int, text string",
    )
    st = bm25_corpus_stats(df, "text", ["hash", "join"])
    assert st == {"doc_count": 2, "sum_dl": 6, "df": {"hash": 1, "join": 2}}
    inline = {r["id"]: r["_score"] for r in bm25_score(df, "text", "hash join").collect()}
    pre = {
        r["id"]: r["_score"]
        for r in bm25_score(df, "text", "hash join", stats=st).collect()
    }
    assert inline == pre
    with pytest.raises(ValueError, match="missing df"):
        bm25_score(df, "text", "hash sort", stats=st)


def test_bm25_validation(spark):
    from elasticsearch_hadoop_spark.search import bm25_score, bm25_topk

    df = spark.createDataFrame([(1, "a b")], "id int, text string")
    with pytest.raises(ValueError, match="query term"):
        bm25_score(df, "text", "!!!")
    with pytest.raises(ValueError, match="b must"):
        bm25_score(df, "text", "a", b=1.5)
    with pytest.raises(ValueError, match="k1 must"):
        bm25_score(df, "text", "a", k1=-1)
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(df, "text", "a", k=0)


def test_bm25_topk_plans_take_ordered(spark, sf_dir):
    from elasticsearch_hadoop_spark.plans import formatted_plan
    from elasticsearch_hadoop_spark.search import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan = formatted_plan(bm25_topk(docs, "text", "hash join", tiebreak=["doc_id"]))
    assert "TakeOrderedAndProject" in plan
    assert "PythonUDF" not in plan  # pure Column math, no UDF


def test_esql_metadata_score_match_semantics(spark):
    """METADATA _score + full-text WHERE (8.18): each MATCH / colon leaf
    adds its BM25 to _score for docs that match it; non-matching leaves
    under OR, NOT-guarded leaves, and plain filters contribute 0 (QSTR
    term leaves score since round 12 — tests/test_round12_new.py);
    without any full-text leaf _score stays the initialized 0.0."""
    from elasticsearch_hadoop_spark.esql import esql
    from elasticsearch_hadoop_spark.search import bm25_score

    docs = [
        (1, "hash join plan", "en"),
        (2, "hash map only", "en"),
        (3, "merge join strategies", "de"),
        (4, "nothing relevant", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string, lang string")
    tbls = {"d": df}

    # OR of two MATCH leaves: a doc matching only one gets only that
    # leaf's BM25 (the other coalesces to 0)
    out = esql(
        'FROM d METADATA _score | WHERE MATCH(text, "hash") OR'
        ' MATCH(text, "merge") | KEEP doc_id, _score',
        tables=tbls,
    )
    got = {r["doc_id"]: r["_score"] for r in out.collect()}
    s_hash = {r["doc_id"]: r["_score"]
              for r in bm25_score(df, "text", "hash").collect()}
    s_merge = {r["doc_id"]: r["_score"]
               for r in bm25_score(df, "text", "merge").collect()}
    assert set(got) == {1, 2, 3}
    for i in got:
        assert got[i] == pytest.approx(
            s_hash.get(i, 0.0) + s_merge.get(i, 0.0), abs=1e-12
        )

    # a plain filter alongside MATCH contributes nothing to _score
    out2 = esql(
        'FROM d METADATA _score | WHERE MATCH(text, "join") AND'
        ' lang == "en" | KEEP doc_id, _score',
        tables=tbls,
    )
    s_join = {r["doc_id"]: r["_score"]
              for r in bm25_score(df, "text", "join").collect()}
    got2 = {r["doc_id"]: r["_score"] for r in out2.collect()}
    assert set(got2) == {1}
    assert got2[1] == pytest.approx(s_join[1], abs=1e-12)

    # no full-text leaf: _score survives as the initialized 0.0
    out3 = esql(
        'FROM d METADATA _score | WHERE lang == "de" | KEEP doc_id, _score',
        tables=tbls,
    )
    assert [(r["doc_id"], r["_score"]) for r in out3.collect()] == [(3, 0.0)]

    # without METADATA _score the scored path must NOT engage
    out4 = esql(
        'FROM d | WHERE MATCH(text, "join") | KEEP doc_id', tables=tbls
    )
    assert "_score" not in out4.columns


def test_esql_match_options(spark):
    """MATCH(field, query, {options}) — the 8.18 named-options map:
    operator/minimum_should_match reshape the predicate (and still score:
    Lucene scores the matching term clauses regardless of operator);
    fuzziness works as a filter but refuses to score; unknown options and
    non-JSON maps raise."""
    from elasticsearch_hadoop_spark.esql import EsqlError, esql
    from elasticsearch_hadoop_spark.search import bm25_score

    docs = [
        (1, "hash join plan"),
        (2, "hash map only"),
        (3, "join order"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    tbls = {"d": df}

    # operator AND: both terms required
    out = esql(
        'FROM d | WHERE MATCH(text, "hash join", {"operator": "and"})'
        " | KEEP doc_id",
        tables=tbls,
    )
    assert [r["doc_id"] for r in out.collect()] == [1]
    # multi-key map: the internal comma must survive the arg split
    out2 = esql(
        'FROM d | WHERE MATCH(text, "hash join",'
        ' {"operator": "or", "minimum_should_match": 2}) | KEEP doc_id',
        tables=tbls,
    )
    assert [r["doc_id"] for r in out2.collect()] == [1]
    # scored AND leaf: contribution is the full BM25 (both terms match)
    out3 = esql(
        "FROM d METADATA _score | WHERE"
        ' MATCH(text, "hash join", {"operator": "and"}) | KEEP doc_id, _score',
        tables=tbls,
    )
    ref = {r["doc_id"]: r["_score"]
           for r in bm25_score(df, "text", "hash join").collect()}
    got = {r["doc_id"]: r["_score"] for r in out3.collect()}
    assert set(got) == {1} and got[1] == pytest.approx(ref[1], abs=1e-12)
    # fuzziness filters fine unscored, refuses to score
    out4 = esql(
        'FROM d | WHERE MATCH(text, "hashh", {"fuzziness": 1}) | KEEP doc_id',
        tables=tbls,
    )
    assert [r["doc_id"] for r in out4.collect()] == [1, 2]
    with pytest.raises(EsqlError, match="fuzziness cannot score"):
        esql(
            "FROM d METADATA _score | WHERE"
            ' MATCH(text, "hashh", {"fuzziness": 1}) | KEEP doc_id',
            tables=tbls,
        )
    with pytest.raises(EsqlError, match="unsupported MATCH options"):
        esql(
            'FROM d | WHERE MATCH(text, "hash", {"boost": 2.0}) | KEEP doc_id',
            tables=tbls,
        )
    with pytest.raises(EsqlError, match="JSON object"):
        esql(
            'FROM d | WHERE MATCH(text, "hash", nonsense) | KEEP doc_id',
            tables=tbls,
        )
    # option VALUES validate (review r11c): bad/None operator, bad
    # zero_terms_query, and a malformed minimum_should_match all surface
    # as typed EsqlError, never a silent default or a foreign exception
    with pytest.raises(EsqlError, match="operator must be"):
        esql(
            'FROM d | WHERE MATCH(text, "hash", {"operator": "must"})'
            " | KEEP doc_id",
            tables=tbls,
        )
    with pytest.raises(EsqlError, match="operator must be"):
        esql(
            'FROM d | WHERE MATCH(text, "hash", {"operator": null})'
            " | KEEP doc_id",
            tables=tbls,
        )
    with pytest.raises(EsqlError, match="zero_terms_query must be"):
        esql(
            'FROM d | WHERE MATCH(text, "hash", {"zero_terms_query": "alll"})'
            " | KEEP doc_id",
            tables=tbls,
        )
    with pytest.raises(EsqlError, match="bad full-text clause"):
        esql(
            'FROM d | WHERE MATCH(text, "hash join",'
            ' {"minimum_should_match": "2<75%"}) | KEEP doc_id',
            tables=tbls,
        )


def test_esql_scored_leaf_gating(spark):
    """Review r11c: a doc surviving the WHERE through another OR branch
    while FAILING an options-narrowed MATCH leaf gets exactly 0 from that
    leaf; a zero-token query with zero_terms_query=all scores 0 without
    crashing (and still matches everything)."""
    from elasticsearch_hadoop_spark.esql import esql
    from elasticsearch_hadoop_spark.search import bm25_score

    docs = [
        (1, "hash join plan"),
        (2, "hash map only"),
        (3, "join order"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    tbls = {"d": df}
    out = esql(
        "FROM d METADATA _score | WHERE"
        ' MATCH(text, "hash join", {"operator": "and"}) OR doc_id == 3'
        " | KEEP doc_id, _score",
        tables=tbls,
    )
    got = {r["doc_id"]: r["_score"] for r in out.collect()}
    ref = {r["doc_id"]: r["_score"]
           for r in bm25_score(df, "text", "hash join").collect()}
    assert set(got) == {1, 3}
    assert got[1] == pytest.approx(ref[1], abs=1e-12)  # leaf matched: full sum
    assert got[3] == 0.0  # leaf FAILED (no "hash"): zero despite tf("join")>0

    out2 = esql(
        "FROM d METADATA _score | WHERE"
        ' MATCH(text, "!!!", {"zero_terms_query": "all"})'
        " | KEEP doc_id, _score",
        tables=tbls,
    )
    got2 = {r["doc_id"]: r["_score"] for r in out2.collect()}
    assert got2 == {1: 0.0, 2: 0.0, 3: 0.0}


def test_esql_scored_not_leaf_is_filter_context(spark):
    """Review r11d: a NOT-negated full-text leaf is Lucene must_not —
    filter context, NEVER scored, even when the doc survives through
    another OR branch and happens to match the negated text."""
    from elasticsearch_hadoop_spark.esql import esql
    from elasticsearch_hadoop_spark.search import bm25_score

    docs = [(1, "hash join plan"), (2, "join order"), (3, "nothing here")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = esql(
        "FROM d METADATA _score | WHERE"
        ' MATCH(text, "join") OR NOT MATCH(text, "hash")'
        " | KEEP doc_id, _score",
        tables={"d": df},
    )
    got = {r["doc_id"]: r["_score"] for r in out.collect()}
    ref = {r["doc_id"]: r["_score"]
           for r in bm25_score(df, "text", "join").collect()}
    # doc 1 matches BOTH leaves textually, but only the positive "join"
    # leaf may pay; the negated "hash" leaf contributes nothing anywhere
    assert set(got) == {1, 2, 3}
    assert got[1] == pytest.approx(ref[1], abs=1e-12)
    assert got[2] == pytest.approx(ref[2], abs=1e-12)
    assert got[3] == 0.0


def test_esql_scored_duplicate_leaves_share_stats_and_sum(spark):
    """Review r11d: identical (field, query) leaves run ONE BM25 pass but
    still contribute once per clause occurrence (Lucene sums clauses)."""
    from elasticsearch_hadoop_spark.esql import esql
    from elasticsearch_hadoop_spark.search import bm25_score

    df = spark.createDataFrame(
        [(1, "hash table"), (2, "plain words")], "doc_id int, text string"
    )
    out = esql(
        "FROM d METADATA _score | WHERE"
        ' MATCH(text, "hash") OR (doc_id <= 2 AND MATCH(text, "hash"))'
        " | KEEP doc_id, _score",
        tables={"d": df},
    )
    got = {r["doc_id"]: r["_score"] for r in out.collect()}
    one = bm25_score(df, "text", "hash").collect()[0]["_score"]
    # doc 2 matches neither branch (no "hash") and is filtered out
    assert set(got) == {1}
    assert got[1] == pytest.approx(2 * one, abs=1e-12)


def test_validate_query_explanation_is_predicate_text(spark):
    """Review r11a: validate_query shares the same repr-stripping as
    explain_doc — no Column<'...'> wrapper in any explanation artifact."""
    from elasticsearch_hadoop_spark.query_dsl import validate_query

    ok = validate_query({"term": {"st": "open"}})
    assert ok["valid"] and not ok["explanation"].startswith("Column<")
    assert "open" in ok["explanation"]
