"""Round-12 surfaces: the explicit METADATA-_score flag (ADVICE r11
medium — scoring must key on the METADATA parse, never on a `_score`
column happening to exist on the source frame), the scored QSTR
term-leaf subset, the KS-test `alternative` forms, and TS RATE over a
non-calendar BUCKET span."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.esql import EsqlError, esql


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "hash join plan", "en"),
            (2, "hash map only", "en"),
            (3, "merge join strategies", "fr"),
            (4, "nothing relevant", "en"),
            (5, "hash hash hash", "de"),
        ],
        "doc_id int, text string, lang string",
    )


class TestScoreRequestedFlag:
    """ADVICE r11 (medium): scored-WHERE engages on the parsed METADATA
    _score request, not on `_score` column presence — a source frame
    that already carries `_score` (search()/bm25_score emit one by
    default) must keep its stored values through a full-text WHERE, and
    a METADATA _score query over such a frame must re-initialize the
    column per query instead of accumulating into stored values."""

    def test_stored_score_column_survives_unscored_where(self, spark, docs):
        pre = docs.withColumn("_score", F.col("doc_id") * 10.0)
        out = esql(
            'FROM d | WHERE MATCH(text, "hash") | KEEP doc_id, _score',
            tables={"d": pre},
        )
        got = {r["doc_id"]: r["_score"] for r in out.collect()}
        # filter applied, stored values untouched — no silent BM25 add
        assert got == {1: 10.0, 2: 20.0, 5: 50.0}

    def test_metadata_score_reinitializes_stored_column(self, spark, docs):
        from elasticsearch_hadoop_spark.search import bm25_score

        pre = docs.withColumn("_score", F.lit(1000.0))
        out = esql(
            'FROM d METADATA _score | WHERE MATCH(text, "hash")'
            " | KEEP doc_id, _score",
            tables={"d": pre},
        )
        got = {r["doc_id"]: r["_score"] for r in out.collect()}
        ref = {
            r["doc_id"]: r["_score"]
            for r in bm25_score(docs, "text", "hash").collect()
        }
        assert set(got) == {1, 2, 5}
        for i in got:  # fresh per query: 0.0 + BM25, never 1000 + BM25
            assert got[i] == pytest.approx(ref[i], abs=1e-12)

    def test_drop_score_demotes_where_to_filter(self, spark, docs):
        out = esql(
            "FROM d METADATA _score | DROP _score"
            ' | WHERE MATCH(text, "hash") | KEEP doc_id',
            tables={"d": docs},
        )
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 5]
        assert "_score" not in out.columns


class TestQstrScored:
    """The scored QSTR term-leaf subset (new round 12): every QSTR leaf
    is a field:value term leaf, scoring its BM25 over the field gated on
    the leaf's own equality predicate; values analyzing to != 1 token
    contribute nothing; NOT-guarded QSTR stays filter-only."""

    def test_leaf_bm25_gated_on_equality(self, spark, docs):
        from elasticsearch_hadoop_spark.search import bm25_score

        out = esql(
            'FROM d METADATA _score | WHERE QSTR("lang:en OR lang:fr")'
            " | KEEP doc_id, _score",
            tables={"d": docs},
        )
        got = {r["doc_id"]: r["_score"] for r in out.collect()}
        s_en = {
            r["doc_id"]: r["_score"]
            for r in bm25_score(docs, "lang", "en").collect()
        }
        s_fr = {
            r["doc_id"]: r["_score"]
            for r in bm25_score(docs, "lang", "fr").collect()
        }
        assert set(got) == {1, 2, 3, 4}
        for i in got:  # each doc pays only ITS lang's leaf
            exp = s_en.get(i, 0.0) if i != 3 else s_fr.get(i, 0.0)
            assert got[i] == pytest.approx(exp, abs=1e-12), i

    def test_qstr_and_match_compose(self, spark, docs):
        from elasticsearch_hadoop_spark.search import bm25_score

        out = esql(
            "FROM d METADATA _score"
            ' | WHERE MATCH(text, "hash") AND QSTR("lang:en")'
            " | KEEP doc_id, _score",
            tables={"d": docs},
        )
        got = {r["doc_id"]: r["_score"] for r in out.collect()}
        s_hash = {
            r["doc_id"]: r["_score"]
            for r in bm25_score(docs, "text", "hash").collect()
        }
        s_en = {
            r["doc_id"]: r["_score"]
            for r in bm25_score(docs, "lang", "en").collect()
        }
        assert set(got) == {1, 2}
        for i in got:  # both leaves pay: Lucene's BooleanQuery sum
            assert got[i] == pytest.approx(s_hash[i] + s_en[i], abs=1e-12)

    def test_not_qstr_is_filter_only(self, spark, docs):
        out = esql(
            'FROM d METADATA _score | WHERE NOT QSTR("lang:en")'
            " | KEEP doc_id, _score",
            tables={"d": docs},
        )
        rows = {(r["doc_id"], r["_score"]) for r in out.collect()}
        assert rows == {(3, 0.0), (5, 0.0)}  # must_not never scores

    def test_multitoken_value_contributes_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "a-b"), (2, "c")], "id int, cat string"
        )
        out = esql(
            'FROM t METADATA _score | WHERE QSTR("cat:a-b")'
            " | KEEP id, _score",
            tables={"t": df},
        )
        # equality filter still applies; 'a-b' analyzes to TWO tokens, so
        # the leaf has no single-term statistics -> no score contribution
        # (documented)
        assert [(r["id"], r["_score"]) for r in out.collect()] == [(1, 0.0)]

    def test_without_metadata_qstr_stays_filter(self, spark, docs):
        out = esql(
            'FROM d | WHERE QSTR("lang:fr") | KEEP doc_id', tables={"d": docs}
        )
        assert [r["doc_id"] for r in out.collect()] == [3]
        assert "_score" not in out.columns


class TestKsAlternativeForms:
    """ADVICE r11 (low): a bare-string `alternative` is the
    one-hypothesis shorthand (was iterated character-wise); the default
    runs ALL hypotheses like ES."""

    def _run(self, spark, **ks_body):
        from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

        df = spark.createDataFrame(
            [("a", i) for i in range(6)] + [("b", 0), ("c", 1)],
            "k string, v int",
        )
        return compile_aggs(
            df,
            {
                "t": {"terms": {"field": "k", "order": {"_key": "asc"}}},
                "ks": {
                    "bucket_count_ks_test": {
                        "buckets_path": "t>_count", **ks_body
                    }
                },
            },
        )

    def test_bare_string_alternative(self, spark):
        out = self._run(spark, alternative="less")
        assert "ks_less" in out.columns
        assert "ks_greater" not in out.columns

    def test_default_runs_all_hypotheses(self, spark):
        out = self._run(spark)
        for c in ("ks_less", "ks_greater", "ks_two_sided"):
            assert c in out.columns

    def test_unknown_alternative_clean_error(self, spark):
        from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError

        with pytest.raises(AggsDslError, match=r"\['sideways'\]"):
            self._run(spark, alternative="sideways").collect()

    def test_empty_alternative_rejected(self, spark):
        """An empty list would silently emit NO output columns — the
        silent-no-op class the validation exists for (review r12g)."""
        from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError

        with pytest.raises(AggsDslError, match="at least one hypothesis"):
            self._run(spark, alternative=[])

    def test_non_list_alternative_clean_error(self, spark):
        from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError

        with pytest.raises(AggsDslError, match="string or list"):
            self._run(spark, alternative=42)


def test_ts_rate_subday_brute(spark):
    """RATE over a 6-hour BUCKET: epoch-floor bucketing + observed-span
    rate, checked against hand math (one reset, one single-sample
    series)."""
    rows = [
        # host a, bucket 00:00: 10 -> 13 -> 11 (reset: +3, +11) over 7200s
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 01:00:00", 13.0),
        ("a", "2024-01-01 02:00:00", 11.0),
        # host a, bucket 06:00: single sample -> NULL rate
        ("a", "2024-01-01 06:30:00", 99.0),
        # host b, bucket 00:00: 5 -> 8 over 3600s
        ("b", "2024-01-01 00:30:00", 5.0),
        ("b", "2024-01-01 01:30:00", 8.0),
    ]
    df = spark.createDataFrame(rows, "host string, ts_s string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = esql(
        "TS t | STATS mx = MAX(RATE(value)), n = COUNT(RATE(value))"
        ' BY tb = BUCKET(ts, "6 hours")',
        tables={"t": df},
        time_series={"t": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    got = {
        r["tb"].strftime("%H:%M"): (r["mx"], r["n"]) for r in out.collect()
    }
    # bucket 00:00: a = 14/7200, b = 3/3600 -> max = 14/7200; 2 series
    assert got["00:00"][0] == pytest.approx(14.0 / 7200.0, abs=1e-15)
    assert got["00:00"][1] == 2
    # bucket 06:00: the single-sample series yields NULL -> count 0
    assert got["06:00"] == (None, 0)


# ------------------------------------------------------- property test

_CATS = ["aa", "bb", "cc", "dd"]

from tests.refs_round11 import bm25_ref as _bm25_ref  # noqa: E402


@given(
    cats=st.lists(
        st.one_of(st.sampled_from(_CATS), st.none()), min_size=1, max_size=10
    ),
    leaves=st.lists(st.sampled_from(_CATS), min_size=1, max_size=3, unique=True),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_qstr_score_property(spark, cats, leaves):
    """Scored QSTR vs the shared pure-Python BM25 reference: per-leaf
    contribution = BM25 of the term over the field, gated on equality;
    NULL fields match no leaf and never enter the OR filter."""
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cats)], "id int, cat string"
    )
    qs = " OR ".join(f"cat:{t}" for t in leaves)
    out = esql(
        f'FROM t METADATA _score | WHERE QSTR("{qs}") | KEEP id, _score',
        tables={"t": df},
    )
    got = {r["id"]: r["_score"] for r in out.collect()}
    doc_toks = [[c] if c is not None else [] for c in cats]
    exp = {}
    for i, c in enumerate(cats):
        if c in leaves:
            exp[i] = _bm25_ref(doc_toks, [c]).get(i, 0.0)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-9), (i, got, exp)


# --------------------------------------------- bm25_score_multi


def test_bm25_score_multi_matches_single(spark):
    """bm25_score_multi == per-leaf bm25_score(matched_only=False) to the
    bit, on a frame with two fields, shared terms across leaves, a NULL
    field and an empty field."""
    from elasticsearch_hadoop_spark.search import bm25_score, bm25_score_multi

    df = spark.createDataFrame(
        [
            (1, "hash join plan", "en"),
            (2, "hash hash map", "fr"),
            (3, None, "en"),
            (4, "", None),
            (5, "merge join", "en"),
        ],
        "id int, text string, lang string",
    )
    leaves = [
        ("text", "hash join", "s0"),
        ("text", "hash", "s1"),  # shares a term with leaf 0
        ("lang", "en", "s2"),    # second field
    ]
    got = {
        r["id"]: (r["s0"], r["s1"], r["s2"])
        for r in bm25_score_multi(df, leaves).collect()
    }
    refs = [
        {
            r["id"]: r[c]
            for r in bm25_score(
                df, f, q, matched_only=False, out_col=c
            ).collect()
        }
        for f, q, c in leaves
    ]
    assert set(got) == {1, 2, 3, 4, 5}
    for i in got:
        for k in range(3):
            assert got[i][k] == refs[k][i], (i, k, got[i][k], refs[k][i])


def test_bm25_score_multi_validation(spark):
    from elasticsearch_hadoop_spark.search import bm25_score_multi

    df = spark.createDataFrame([(1, "a")], "id int, t string")
    with pytest.raises(ValueError, match="unique out_cols"):
        bm25_score_multi(df, [("t", "a", "s"), ("t", "b", "s")])
    with pytest.raises(ValueError, match="query term"):
        bm25_score_multi(df, [("t", "!!!", "s")])
    assert bm25_score_multi(df, []) is df  # no leaves -> untouched


def test_bm25_stats_over_pristine_frame(spark):
    """bm25_score(stats_over=...) computes N/Σdl/df over the given frame
    while scoring the input frame — the chained-caller seam."""
    from elasticsearch_hadoop_spark.search import bm25_score

    full = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, "c")], "id int, t string"
    )
    sub = full.filter("id = 2")
    # scoring sub with stats over full == scoring full then filtering
    got = bm25_score(sub, "t", "a", matched_only=False, stats_over=full)
    ref = bm25_score(full, "t", "a", matched_only=False).filter("id = 2")
    assert [r["_score"] for r in got.collect()] == [
        r["_score"] for r in ref.collect()
    ]


def test_bm25_score_multi_stats_over(spark):
    """bm25_score_multi(stats_over=...) mirrors the single-leaf seam:
    stats over the given frame, scoring over the input frame."""
    from elasticsearch_hadoop_spark.search import bm25_score, bm25_score_multi

    full = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, "c")], "id int, t string"
    )
    sub = full.filter("id = 2")
    got = bm25_score_multi(sub, [("t", "a", "s0")], stats_over=full)
    ref = bm25_score(full, "t", "a", matched_only=False, out_col="s0").filter(
        "id = 2"
    )
    assert [r["s0"] for r in got.collect()] == [r["s0"] for r in ref.collect()]


def test_bm25_conflicting_stats_sources(spark):
    from elasticsearch_hadoop_spark.search import bm25_score, bm25_score_multi

    df = spark.createDataFrame([(1, "a")], "id int, t string")
    with pytest.raises(ValueError, match="not both"):
        bm25_score(
            df, "t", "a",
            stats={"doc_count": 1, "sum_dl": 1, "df": {"a": 1}},
            stats_over=df,
        )
    with pytest.raises(ValueError, match="__bmm_"):
        bm25_score_multi(df, [("t", "a", "__bmm_s")])


def test_bm25_score_multi_reserved_namespace(spark):
    """The __bmm_ prefix is RESERVED, loudly (review r12e): an input
    column in that namespace raises instead of being silently clobbered
    (exact helper name) or silently surviving-by-luck (any other name) —
    two earlier behaviors that each hid a hazard."""
    from elasticsearch_hadoop_spark.search import bm25_score_multi

    df = spark.createDataFrame([(1, "a", 9)], "id int, t string, __bmm_cache int")
    with pytest.raises(ValueError, match="reserved '__bmm_'"):
        bm25_score_multi(df, [("t", "a", "s0")])


def test_fork_branches_inherit_score_requested(spark, docs):
    """The METADATA _score flag threads into FORK branches: a full-text
    WHERE inside a branch scores there (the FORK->FUSE hybrid pattern),
    and without METADATA the same branch only filters."""
    from elasticsearch_hadoop_spark.search import bm25_score

    out = esql(
        "FROM d METADATA _score"
        ' | FORK (WHERE MATCH(text, "hash") | KEEP doc_id, _score)'
        '        (WHERE MATCH(text, "merge") | KEEP doc_id, _score)',
        tables={"d": docs},
    )
    got = {(r["_fork"], r["doc_id"]): r["_score"] for r in out.collect()}
    s_hash = {
        r["doc_id"]: r["_score"]
        for r in bm25_score(docs, "text", "hash").collect()
    }
    s_merge = {
        r["doc_id"]: r["_score"]
        for r in bm25_score(docs, "text", "merge").collect()
    }
    assert set(got) == {("fork1", 1), ("fork1", 2), ("fork1", 5), ("fork2", 3)}
    for (fork, i), s in got.items():
        ref = s_hash[i] if fork == "fork1" else s_merge[i]
        assert s == pytest.approx(ref, abs=1e-12)

    out2 = esql(
        'FROM d | FORK (WHERE MATCH(text, "hash") | KEEP doc_id)'
        '        (WHERE MATCH(text, "merge") | KEEP doc_id)',
        tables={"d": docs},
    )
    assert "_score" not in out2.columns


# ----------------------------------------------- TS RATE property test


def _rate_ref(samples):
    """esql._stats_ts's documented RATE semantics, replayed in Python
    over one series' (ts_sec, value) samples: order by (ts, value NULLS
    FIRST — Spark's asc default), per-pair contribution = NULL if either
    side is NULL else (v - prev) on increase else v (counter reset),
    inc = sum of non-NULL contributions (NULL if none), span = max(ts) -
    min(ts) over ALL samples, rate = inc/span only when span > 0 and inc
    is non-NULL."""
    if not samples:
        return None
    ordered = sorted(samples, key=lambda s: (s[0], s[1] is not None, s[1] or 0.0))
    contribs = []
    for (_, prev), (_, cur) in zip(ordered, ordered[1:]):
        if prev is None or cur is None:
            contribs.append(None)
        else:
            contribs.append(cur - prev if cur >= prev else cur)
    real = [c for c in contribs if c is not None]
    span = max(t for t, _ in samples) - min(t for t, _ in samples)
    if not real or span <= 0:
        return None
    return sum(real) / span


@given(
    series=st.dictionaries(
        st.sampled_from(["h0", "h1", "h2"]),
        st.lists(
            st.tuples(
                st.integers(0, 120),
                st.one_of(st.none(), st.integers(0, 10).map(float)),
            ),
            min_size=1,
            max_size=7,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_ts_rate_property(spark, series):
    """RATE over random counter streams — resets, NULL samples, duplicate
    timestamps, single-sample and zero-span series — vs the pure-Python
    reference.  Integer-valued floats keep both sums exact."""
    rows = [(h, t, v) for h, samples in series.items() for t, v in samples]
    df = spark.createDataFrame(rows, "host string, tsec long, value double")
    df = df.select("host", F.timestamp_seconds("tsec").alias("ts"), "value")
    out = esql(
        "TS t | STATS mx = MAX(RATE(value)), av = AVG(RATE(value)),"
        " n = COUNT(RATE(value))",
        tables={"t": df},
        time_series={"t": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    row = out.collect()[0]
    rates = [r for r in (_rate_ref(s) for s in series.values()) if r is not None]
    if not rates:
        assert row["mx"] is None and row["av"] is None and row["n"] == 0
    else:
        assert row["n"] == len(rates)
        assert row["mx"] == pytest.approx(max(rates), abs=1e-9)
        assert row["av"] == pytest.approx(sum(rates) / len(rates), abs=1e-9)


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from(["f1", "f2"]), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=4,
    ),
    ops=st.lists(st.sampled_from(["AND", "OR"]), min_size=3, max_size=3),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_uri_query_left_assoc_property(spark, pairs, ops):
    """The ?q= grammar evaluates left-associatively with no precedence
    (documented URI-lite subset): the compiled filter over every value
    combination matches a Python fold over uri_query_parts' triples."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query, uri_query_parts

    q = pairs[0][0] + ":" + pairs[0][1]
    for (f, v), op in zip(pairs[1:], ops):
        q += f" {op} {f}:{v}"
    vals = ["x", "y", "z"]
    rows = [(i, a, b) for i, (a, b) in enumerate(
        (a, b) for a in vals for b in vals
    )]
    df = spark.createDataFrame(rows, "id int, f1 string, f2 string")
    got = {r["id"] for r in df.filter(compile_query(q)).collect()}
    exp = set()
    for rid, a, b in rows:
        acc = None
        for op, field, value in uri_query_parts(q):
            hit = (a if field == "f1" else b) == value
            acc = hit if acc is None else (acc and hit if op == "AND" else acc or hit)
        if acc:
            exp.add(rid)
    assert got == exp, (q, got, exp)
