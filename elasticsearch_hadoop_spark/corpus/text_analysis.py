"""Text-analysis corpus: analyzer parity + LLM-pipeline text ops
(tokenization, quality scoring, token counting, language-ID heuristic,
document fingerprinting — driver-mandated extensions, SURVEY.md §2.C).

All implementations are in functions/text.py as pure Column expressions;
each query here declares the DuckDB-SQL twin.  At 100 TB these are
embarrassingly parallel scans — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import spread, tbl
from elasticsearch_hadoop_spark.functions.text import (
    ENGLISH_STOPWORDS,
    BPE_ISH_REGEX,
    doc_fingerprint,
    lang_id_heuristic,
    quality_score,
    standard_analyze,
    stopword_ratio,
    token_count_bpe,
    token_count_whitespace,
)

_SW_SQL = "[" + ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS) + "]"
_ANALYZE_SQL = "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), t -> length(t) > 0)"


@query(
    "text_tokenize",
    oracle=f"""
WITH analyzed AS (
  SELECT doc_id, {_ANALYZE_SQL.format(c='text')} AS toks, text FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       CAST(len(string_split(trim(text), ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS INT)
           AS n_bpe_tokens,
       array_to_string(list_slice(toks, 1, 5), ' ') AS head5
FROM analyzed
ORDER BY doc_id
""",
)
def text_tokenize(spark, sf_dir):
    """Standard-analyzer tokenization + whitespace and BPE-ish token counts
    (LLM token budgeting)."""
    d = spread(spark, tbl(spark, sf_dir, "documents"))
    toks = standard_analyze(F.col("text"))
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            token_count_whitespace("text").alias("n_ws_tokens"),
            token_count_bpe("text").alias("n_bpe_tokens"),
            F.concat_ws(" ", F.slice(toks, 1, 5)).alias("head5"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_quality",
    oracle=f"""
WITH analyzed AS (
  SELECT doc_id, text, {_ANALYZE_SQL.format(c='text')} AS toks FROM documents
),
feat AS (
  SELECT doc_id, text,
         CAST(len(toks) AS DOUBLE) AS n_toks,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, t -> list_contains({_SW_SQL}, t))) AS DOUBLE)
                   / len(toks)
              ELSE 0.0 END AS sw_ratio
  FROM analyzed
)
SELECT doc_id,
       round(sw_ratio, 6) AS stopword_ratio,
       round(CASE WHEN n_chars > 0
             THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / n_chars
             ELSE 0.0 END, 6) AS alpha_ratio,
       round(0.3 * (CASE WHEN n_toks >= 10 AND n_toks <= 5000 THEN 1 ELSE 0 END)
           + 0.2 * (CASE WHEN n_toks > 0 AND n_chars / n_toks BETWEEN 3.0 AND 12.0
                         THEN 1 ELSE 0 END)
           + 0.25 * (CASE WHEN sw_ratio BETWEEN 0.05 AND 0.7 THEN 1 ELSE 0 END)
           + 0.25 * (CASE WHEN n_chars > 0
                     THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                          / n_chars
                     ELSE 0.0 END), 6) AS quality
FROM feat
ORDER BY doc_id
""",
)
def text_quality(spark, sf_dir):
    """Heuristic quality scoring: stopword ratio, alphabetic ratio, length
    bands -> composite score (the classic pre-training corpus filter)."""
    d = spread(spark, tbl(spark, sf_dir, "documents"))
    toks = standard_analyze(F.col("text"))
    n_chars = F.length("text").cast("double")
    alpha = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.lower(F.col("text")), r"[^a-z]", "")).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    return (
        d.select(
            "doc_id",
            F.round(stopword_ratio(toks), 6).alias("stopword_ratio"),
            F.round(alpha, 6).alias("alpha_ratio"),
            quality_score(F.col("text")).alias("quality"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_lang_id",
    oracle=f"""
WITH analyzed AS (
  SELECT doc_id, lang, {_ANALYZE_SQL.format(c='text')} AS toks FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN len(toks) > 0
                  AND CAST(len(list_filter(toks, t -> list_contains({_SW_SQL}, t))) AS DOUBLE)
                      / len(toks) >= 0.08
            THEN 'en' ELSE 'unknown' END AS predicted_lang
FROM analyzed
ORDER BY doc_id
""",
)
def text_lang_id(spark, sf_dir):
    """Stopword-hit language-ID heuristic vs the fixture's lang label."""
    d = spread(spark, tbl(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            lang_id_heuristic(F.col("text")).alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_fingerprint",
    oracle="""
WITH chars AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(i AS BIGINT) * ascii(substr(text, i, 1))) AS weighted
  FROM documents
)
SELECT doc_id,
       CAST(list_sum(weighted) % 2147483647 AS BIGINT) AS fingerprint
FROM chars
ORDER BY doc_id
""",
)
def text_fingerprint(spark, sf_dir):
    """Positional rolling-hash document fingerprint (order-sensitive,
    SQL-reproducible)."""
    d = spread(spark, tbl(spark, sf_dir, "documents"))
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint")).orderBy("doc_id")


_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4_SQL = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_DIGITS_SQL = "\\b\\d{8,}\\b"
_AUG_SQL = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com from ',"
    " '10.0.', CAST(doc_id % 256 AS VARCHAR), '.7 acct ',"
    " CAST(90000000 + doc_id AS VARCHAR))"
)


@query(
    "text_redact_pii",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL_SQL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{_PII_IPV4_SQL}')) AS BIGINT) AS n_ip,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
           '{_PII_IPV4_SQL}', '<IP>', 'g'),
           '{_PII_DIGITS_SQL}', '<NUM>', 'g')) AS redacted_md5
FROM aug
ORDER BY doc_id
""",
)
def text_redact_pii(spark, sf_dir):
    """PII redaction (pre-training privacy scrub): the fixture text is
    deterministically augmented with an email, an IPv4, and a long account
    number per doc (the corpus carries no real PII), then masked with
    functions.text.redact_pii; the oracle re-runs the identical regex
    chain in DuckDB and hashes the scrubbed text.  Pure codegen — three
    chained regexp_replace in the scan stage, zero shuffle."""
    from elasticsearch_hadoop_spark.functions.text import (
        PII_EMAIL,
        PII_IPV4,
        redact_pii,
    )

    d = tbl(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 acct "),
        (F.col("doc_id") + 90000000).cast("string"),
    )
    return (
        d.select("doc_id", aug.alias("t"))
        .select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("t"), F.lit(PII_EMAIL), 0)).cast("bigint").alias("n_email"),
            F.size(F.regexp_extract_all(F.col("t"), F.lit(PII_IPV4), 0)).cast("bigint").alias("n_ip"),
            F.md5(redact_pii(F.col("t"))).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_decontaminate",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))
              ELSE CAST([] AS VARCHAR[]) END AS g
  FROM tok
), bench AS (
  SELECT DISTINCT gram
  FROM (SELECT unnest(g) AS gram FROM sh WHERE doc_id % 97 = 0)
), grams AS (
  SELECT doc_id, unnest(g) AS gram FROM sh
), hits AS (
  SELECT g2.doc_id, count(*) AS n_hit
  FROM grams g2 JOIN bench USING (gram)
  GROUP BY g2.doc_id
)
SELECT s.doc_id,
       CAST(len(s.g) AS BIGINT) AS n_grams,
       CAST(h.n_hit AS BIGINT) AS n_contaminated,
       round(h.n_hit * 1.0 / len(s.g), 6) AS ratio
FROM sh s JOIN hits h USING (doc_id)
ORDER BY s.doc_id
""",
)
def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/decontaminate.py): flag
    training documents sharing word-3-gram shingles with a benchmark set
    (here the doc_id%97 slice stands in for an eval suite — its members
    self-report ratio 1.0, near-duplicates report their true overlap).
    The benchmark gram set broadcasts; the corpus-side explode is map-side
    and the one shuffle is bounded by the MATCH mass, not the corpus gram
    count — the GPT-3-style 13-gram overlap filter at 100 TB shape."""
    from elasticsearch_hadoop_spark.operators.decontaminate import (
        contamination_report,
    )

    docs = spread(spark, tbl(spark, sf_dir, "documents")).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = contamination_report(docs, bench, n=3)
    return out.select(
        "doc_id", "n_grams", "n_contaminated", F.round("ratio", 6).alias("ratio")
    ).orderBy("doc_id")


@query(
    "text_repetition_signals",
    oracle=f"""
WITH an AS (
  SELECT doc_id, {_ANALYZE_SQL.format(c='text')} AS toks FROM documents
),
base AS (
  SELECT doc_id, toks, len(toks) AS n, len(list_distinct(toks)) AS nd,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(2, len(toks)),
                                  i -> toks[i-1] || ' ' || toks[i])
              ELSE []::VARCHAR[] END AS bi,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(3, len(toks)),
                                  i -> toks[i-2] || ' ' || toks[i-1] || ' ' || toks[i])
              ELSE []::VARCHAR[] END AS tri
  FROM an
),
bc AS (
  SELECT doc_id, max(cnt) AS top_bigram FROM (
    SELECT doc_id, u.bg, count(*) AS cnt
    FROM base, unnest(bi) AS u(bg)
    GROUP BY doc_id, u.bg
  ) GROUP BY doc_id
),
tok AS (
  SELECT doc_id, g.i AS ord, toks[g.i] AS term
  FROM base, unnest(generate_series(1, n)) AS g(i)
),
isl AS (
  SELECT doc_id, term,
         ord - row_number() OVER (PARTITION BY doc_id, term ORDER BY ord) AS grp
  FROM tok
),
runs AS (
  SELECT doc_id, max(cnt) AS max_run FROM (
    SELECT doc_id, term, grp, count(*) AS cnt FROM isl GROUP BY doc_id, term, grp
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n AS INT) AS n_tokens,
       round(CASE WHEN b.n > 0 THEN (b.n - b.nd)::DOUBLE / b.n ELSE 0.0 END, 6)
           AS dup_token_frac,
       CAST(coalesce(bc.top_bigram, 0) AS INT) AS top_bigram_count,
       round(CASE WHEN len(b.tri) > 0
                  THEN (len(b.tri) - len(list_distinct(b.tri)))::DOUBLE / len(b.tri)
                  ELSE 0.0 END, 6) AS dup_trigram_frac,
       CAST(coalesce(runs.max_run, 0) AS INT) AS max_token_run
FROM base b
LEFT JOIN bc USING (doc_id)
LEFT JOIN runs USING (doc_id)
ORDER BY b.doc_id
""",
)
def text_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals per document (Rae et al.
    2021's repetition filters, the deterministic token-based rendering):
    duplicate-token fraction, the highest bigram multiplicity, the
    duplicate-trigram fraction, and the longest same-token run.  Every
    signal is per-row Column math — n-grams via one index-sequence
    transform, multiplicities via sort + longest-equal-adjacent-run fold
    (O(k log k) per doc, no explode/groupBy/join) — so the whole thing is
    a single codegen projection over the corpus scan at any scale."""
    from elasticsearch_hadoop_spark.functions.text import (
        max_consecutive_run,
        max_multiplicity,
        ngram_array,
    )

    d = spread(spark, tbl(spark, sf_dir, "documents"))
    toks = standard_analyze(F.col("text"))
    base = d.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("nd"),
    ).select(
        "doc_id",
        "n",
        "nd",
        ngram_array(F.col("toks"), 2).alias("bi"),
        ngram_array(F.col("toks"), 3).alias("tri"),
        max_consecutive_run(F.col("toks")).alias("max_run"),
    )
    n, nd = F.col("n"), F.col("nd")
    n_tri = F.size("tri")
    return base.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(
            F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0)), 6
        ).alias("dup_token_frac"),
        max_multiplicity(F.col("bi")).alias("top_bigram_count"),
        F.round(
            F.when(
                n_tri > 0, (n_tri - F.size(F.array_distinct("tri"))) / n_tri
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_trigram_frac"),
        F.col("max_run").alias("max_token_run"),
    ).orderBy("doc_id")


@query(
    "text_c4_filters",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> length(t) > 0) AS words,
         text
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                            s -> length(trim(s)) > 0)) AS INT) AS n_sentences,
       round(CASE WHEN len(words) > 0
             THEN list_sum(list_transform(words, w -> length(w)))
                  / CAST(len(words) AS DOUBLE)
             ELSE 0.0 END, 6) AS mean_word_len,
       contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
       contains(text, '{') AS has_curly_brace,
       (CASE WHEN len(words) >= 5 AND len(words) > 0
             THEN list_sum(list_transform(words, w -> length(w)))
                  / CAST(len(words) AS DOUBLE) BETWEEN 3 AND 10
             ELSE FALSE END) AS c4_keep
FROM toks
ORDER BY doc_id
""",
)
def text_c4_filters(spark, sf_dir):
    """C4-style quality filtering (Raffel et al. 2020): per-doc signal
    struct (sentences, mean word length, lorem-ipsum / code markers) and
    a keep verdict from the 3..10 mean-word-length band + minimum length
    — all one codegen projection, the training-data page filter the
    repetition signals complement."""
    from elasticsearch_hadoop_spark.functions.text import (
        c4_quality_signals,
        token_count_whitespace,
    )

    docs = tbl(spark, sf_dir, "documents")
    sig = docs.select(
        "doc_id",
        "lang",
        c4_quality_signals("text").alias("s"),
        token_count_whitespace("text").alias("n_words"),
    )
    return sig.select(
        "doc_id",
        "lang",
        F.col("s.n_sentences").alias("n_sentences"),
        F.round("s.mean_word_len", 6).alias("mean_word_len"),
        F.col("s.has_lorem_ipsum").alias("has_lorem_ipsum"),
        F.col("s.has_curly_brace").alias("has_curly_brace"),
        (
            (F.col("n_words") >= 5)
            & F.col("s.mean_word_len").between(3.0, 10.0)
        ).alias("c4_keep"),
    ).orderBy("doc_id")


@query(
    "text_unigram_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            t -> length(t) > 0)) AS term
  FROM documents
),
vocab AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS freq FROM toks GROUP BY term
),
tot AS (SELECT sum(freq) AS total FROM vocab),
scored AS (
  SELECT t.doc_id,
         log10(v.freq / (SELECT total FROM tot)) AS lp
  FROM toks t JOIN vocab v ON t.term = v.term
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(lp), 6) AS mean_logprob
FROM scored GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality scoring (the KenLM-perplexity proxy of
    CCNet-style pipelines): per-doc mean log10 token probability under
    the corpus's own unigram model — vocabulary agg + term join + per-doc
    re-agg, Zipf-bounded vocab frame, no driver-side model."""
    from elasticsearch_hadoop_spark.functions.text import unigram_logprob

    docs = tbl(spark, sf_dir, "documents")
    out = unigram_logprob(docs, "text", "doc_id")
    return out.select(
        "doc_id", "n_tokens", F.round("mean_logprob", 6).alias("mean_logprob")
    ).orderBy("doc_id")


@query(
    "text_quality_funnel",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS tk,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> length(t) > 0) AS words
  FROM documents
),
vocab AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS freq
  FROM (SELECT unnest(tk) AS term FROM toks) GROUP BY term
),
tot AS (SELECT sum(freq) AS total FROM vocab),
lm AS (
  SELECT t.doc_id, avg(log10(v.freq / (SELECT total FROM tot))) AS lp
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks) t
  JOIN vocab v ON t.term = v.term
  GROUP BY t.doc_id
),
sig AS (
  SELECT toks.doc_id,
         len(words) AS n_words,
         CASE WHEN len(words) > 0
              THEN list_sum(list_transform(words, w -> length(w)))
                   / CAST(len(words) AS DOUBLE) ELSE 0.0 END AS mwl,
         lm.lp
  FROM toks JOIN lm ON toks.doc_id = lm.doc_id
),
funnel AS (
  SELECT 1 AS stage_ord, 'total' AS stage, count(*) AS docs FROM sig
  UNION ALL
  SELECT 2, 'len_ok', count(*) FROM sig WHERE n_words >= 10
  UNION ALL
  SELECT 3, 'c4_word_len_ok', count(*) FROM sig
  WHERE n_words >= 10 AND mwl BETWEEN 3 AND 10
  UNION ALL
  SELECT 4, 'lm_ok', count(*) FROM sig
  WHERE n_words >= 10 AND mwl BETWEEN 3 AND 10 AND lp >= -3.0
)
SELECT stage_ord, stage, CAST(docs AS BIGINT) AS docs
FROM funnel ORDER BY stage_ord
""",
)
def text_quality_funnel(spark, sf_dir):
    """The training-data quality FUNNEL: compose the session's filter
    primitives — minimum length, C4's 3..10 mean-word-length band, and a
    unigram-LM (KenLM-proxy) log-probability floor — into staged
    keep-counts, the shape every corpus-cleaning report ships.  One
    signal projection + the LM join feed four conjunctive counts; no
    re-scans per stage (the funnel unions COUNTs over the same cached
    signal frame)."""
    from elasticsearch_hadoop_spark.functions.text import (
        c4_quality_signals,
        token_count_whitespace,
        unigram_logprob,
    )

    docs = tbl(spark, sf_dir, "documents")
    lm = unigram_logprob(docs, "text", "doc_id").select(
        "doc_id", F.col("mean_logprob").alias("lp")
    )
    sig = (
        docs.select(
            "doc_id",
            token_count_whitespace("text").alias("n_words"),
            c4_quality_signals("text")["mean_word_len"].alias("mwl"),
        )
        .join(lm, "doc_id")
    )
    len_ok = F.col("n_words") >= 10
    c4_ok = len_ok & F.col("mwl").between(3.0, 10.0)
    lm_ok = c4_ok & (F.col("lp") >= -3.0)
    out = sig.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(len_ok.cast("long")).alias("len_ok"),
        F.sum(c4_ok.cast("long")).alias("c4_word_len_ok"),
        F.sum(lm_ok.cast("long")).alias("lm_ok"),
    )
    stages = ["total", "len_ok", "c4_word_len_ok", "lm_ok"]
    spark_rows = out.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("stage_ord"),
                        F.lit(s).alias("stage"),
                        F.col(s).alias("docs"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("f")
    )
    return spark_rows.select("f.stage_ord", "f.stage", "f.docs").orderBy(
        "stage_ord"
    )
