"""Repetition-signal text helpers: n-gram arrays, consecutive-run and
multiplicity folds (Gopher-style quality filters)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_ngram_array_and_edges(spark):
    from elasticsearch_hadoop_spark.functions.text import ngram_array, standard_analyze

    df = spark.createDataFrame([Row(t="a b c d"), Row(t="a"), Row(t="")])
    out = df.select(
        ngram_array(standard_analyze(F.col("t")), 2).alias("bi"),
        ngram_array(standard_analyze(F.col("t")), 3).alias("tri"),
    ).collect()
    assert out[0]["bi"] == ["a b", "b c", "c d"]
    assert out[0]["tri"] == ["a b c", "b c d"]
    assert out[1]["bi"] == [] and out[2]["bi"] == []


def test_max_consecutive_run_and_multiplicity(spark):
    from elasticsearch_hadoop_spark.functions.text import (
        max_consecutive_run,
        max_multiplicity,
        standard_analyze,
    )

    df = spark.createDataFrame(
        [Row(t="x x x y y x"), Row(t="a b a b a"), Row(t="")]
    )
    out = df.select(
        max_consecutive_run(standard_analyze(F.col("t"))).alias("run"),
        max_multiplicity(standard_analyze(F.col("t"))).alias("mult"),
    ).collect()
    assert (out[0]["run"], out[0]["mult"]) == (3, 4)  # x appears 4 times total
    assert (out[1]["run"], out[1]["mult"]) == (1, 3)
    assert (out[2]["run"], out[2]["mult"]) == (0, 0)


def test_analyze_api_analyzers(spark):
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    df = spark.createDataFrame([("The Quick-Fox 42 runs the",)], ["text"])
    std = analyze_api(df, "text", "standard").collect()
    assert [(r["position"], r["token"]) for r in std] == [
        (0, "the"), (1, "quick"), (2, "fox"), (3, "42"), (4, "runs"), (5, "the"),
    ]
    ws = analyze_api(df, "text", "whitespace").collect()
    assert [r["token"] for r in ws] == ["The", "Quick-Fox", "42", "runs", "the"]
    kw = analyze_api(df, "text", "keyword").collect()
    assert [r["token"] for r in kw] == ["The Quick-Fox 42 runs the"]
    simple = analyze_api(df, "text", "simple").collect()
    assert [r["token"] for r in simple] == ["the", "quick", "fox", "runs", "the"]
    stop = analyze_api(df, "text", "stop").collect()
    assert [r["token"] for r in stop] == ["quick", "fox", "42", "runs"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        analyze_api(df, "text", "icu")


def test_c4_quality_signals(spark):
    from elasticsearch_hadoop_spark.functions.text import c4_quality_signals

    df = spark.createDataFrame(
        [
            ("Good line one.\nAnother fine line!\nno punct ending",),
            ("Lorem ipsum dolor { code }",),
            ("",),
        ],
        ["text"],
    )
    rows = df.select(c4_quality_signals("text").alias("s")).collect()
    s0 = rows[0]["s"]
    assert s0["n_sentences"] == 3
    assert abs(s0["frac_lines_end_punct"] - 2 / 3) < 1e-9
    assert not s0["has_lorem_ipsum"] and not s0["has_curly_brace"]
    assert not s0["ends_terminal"]
    s1 = rows[1]["s"]
    assert s1["has_lorem_ipsum"] and s1["has_curly_brace"]
    s2 = rows[2]["s"]
    assert s2["n_sentences"] == 0 and s2["mean_word_len"] == 0.0


def test_scroll_slice_partitions_disjoint(spark):
    from elasticsearch_hadoop_spark.search import scroll_slice

    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    parts = [df.filter(scroll_slice(df, s, 4, "id")).count() for s in range(4)]
    assert sum(parts) == 100
    assert all(p > 0 for p in parts)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        scroll_slice(df, 4, 4, "id")


def test_unigram_logprob_ranks_common_text_higher(spark):
    from elasticsearch_hadoop_spark.functions.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "the the the cat"), (2, "the cat"), (3, "zx qw vv")],
        ["id", "text"],
    )
    out = {r["id"]: r for r in unigram_logprob(df, "text", "id").collect()}
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 2
    # doc 1 repeats the most common token -> highest mean logprob;
    # doc 3 is all hapaxes -> lowest
    assert out[1]["mean_logprob"] > out[2]["mean_logprob"] > out[3]["mean_logprob"]


def test_py_standard_analyze_matches_column_version(spark):
    """py_standard_analyze (the compile-time replica the query-DSL parsers
    use to tokenize query text) must agree token-for-token with the Column
    standard_analyze — both derive from TOKEN_SPLIT_REGEX (ADVICE r5)."""
    from elasticsearch_hadoop_spark.functions.text import (
        py_standard_analyze,
        standard_analyze,
    )

    samples = [
        "The quick BROWN fox!",
        "  a--b__c  42x 9  ",
        "UPPER lower MiXeD",
        "éclair naïve café",          # non-ASCII: dropped by both
        "1a2b3c",
        "",
        "!!! ---",
        "tab\tnewline\nmix",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "s"])
    col_out = {
        r["i"]: r["toks"]
        for r in df.select("i", standard_analyze("s").alias("toks")).collect()
    }
    for i, s in enumerate(samples):
        assert py_standard_analyze(s) == col_out[i], (s, py_standard_analyze(s), col_out[i])


def test_py_standard_analyze_differential_random(spark):
    """Hypothesis differential: py_standard_analyze vs the Column
    standard_analyze on random text (ASCII + punctuation + unicode),
    batched into one DataFrame per example set to keep Spark round-trips
    bounded."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from elasticsearch_hadoop_spark.functions.text import (
        py_standard_analyze,
        standard_analyze,
    )

    texts = st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Sm"),
            max_codepoint=0x2FF,
        ),
        max_size=40,
    )

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(batch=st.lists(texts, min_size=1, max_size=12))
    def check(batch):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(batch)], ["i", "s"]
        )
        got = {
            r["i"]: r["toks"]
            for r in df.select("i", standard_analyze("s").alias("toks")).collect()
        }
        for i, s in enumerate(batch):
            assert py_standard_analyze(s) == got[i], (s, py_standard_analyze(s), got[i])

    check()


def test_analyze_api_pattern_analyzer(spark):
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    df = spark.createDataFrame([("Foo-Bar_42, baz!",)], "text string")
    toks = [r["token"] for r in analyze_api(df, "text", "pattern").collect()]
    # default \W+ keeps underscores inside tokens (Java \w includes _)
    assert toks == ["foo", "bar_42", "baz"]
    toks = [
        r["token"]
        for r in analyze_api(
            df, "text", "pattern", pattern="[^A-Za-z]+", lowercase=False
        ).collect()
    ]
    assert toks == ["Foo", "Bar", "baz"]


def test_analyze_api_ngram_default_stream(spark):
    """ES ngram tokenizer default (min 1, max 2, no token_chars): the
    docs' own example — "Quick Fo" emits offset-major, length-minor."""
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    df = spark.createDataFrame([("Quick Fo",)], "text string")
    got = [(r["position"], r["token"]) for r in analyze_api(df, "text", "ngram").collect()]
    exp_tokens = ["Q", "Qu", "u", "ui", "i", "ic", "c", "ck", "k", "k ",
                  " ", " F", "F", "Fo", "o"]
    assert [t for _, t in got] == exp_tokens
    assert [p for p, _ in got] == list(range(len(exp_tokens)))


def test_analyze_api_edge_ngram_and_bounds(spark):
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    df = spark.createDataFrame([("Quick",), ("",)], "text string")
    rows = analyze_api(df, "text", "edge_ngram", min_gram=1, max_gram=3).collect()
    assert [r["token"] for r in rows] == ["Q", "Qu", "Qui"]  # empty row: none
    # a string shorter than max_gram stops at its length
    short = spark.createDataFrame([("ab",)], "text string")
    assert [r["token"] for r in
            analyze_api(short, "text", "edge_ngram", max_gram=5).collect()] == ["a", "ab"]
    import pytest as _p
    with _p.raises(ValueError, match="min_gram"):
        analyze_api(df, "text", "ngram", min_gram=3, max_gram=2)
    with _p.raises(ValueError, match="unknown analyzer"):
        analyze_api(df, "text", "nope")


def test_analyze_api_pattern_tokenizes_before_lowercase(spark):
    """Review r9b-1: ES's pattern analyzer splits the ORIGINAL text and
    lowercases tokens after — a case-sensitive pattern must see case."""
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    df = spark.createDataFrame([("aXbYc",)], "text string")
    toks = [
        r["token"]
        for r in analyze_api(df, "text", "pattern", pattern="[A-Z]+").collect()
    ]
    assert toks == ["a", "b", "c"]
