"""Text-analysis functions: the ES-analyzer analogue + LLM-pipeline text ops
(SURVEY.md §2.C "Text analysis"; driver-mandated extensions).

Everything here is a pure Column expression (Catalyst HigherOrderFunctions,
regexp, hash built-ins) — no Python UDFs, so these run inside whole-stage
codegen and scale linearly with input at 100 TB.

ES-parity notes: `standard_analyze` implements the documented exact subset
of ES's standard analyzer (lowercase + split on non-alphanumerics, drop
empties).  No scoring, no stemming, no language-specific analysis — the
reference itself never scores either (it reads `_source`, SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small English stopword set (public-domain list subset); used for
# stopword-ratio quality scoring and the language-ID heuristic.
ENGLISH_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
).split()


def standard_analyze(col: Column | str) -> Column:
    """ES standard-analyzer analogue: lowercase, split on non-alphanumeric
    runs, drop empty tokens.  Returns array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )


# alias used by the query-DSL `match` compiler
analyze_tokens = standard_analyze


def token_count_whitespace(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


BPE_ISH_REGEX = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: letter runs, single digits, single punctuation
    marks — a deterministic proxy for LLM tokenizer counts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_REGEX), 0))


def stopword_ratio(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (double; 0 for empty docs)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or ENGLISH_STOPWORDS)])
    n = F.size(tokens)
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0,1]: combines length band,
    mean token length band, stopword presence, and alphabetic ratio.
    Deterministic + SQL-expressible (oracle in corpus/text_analysis.py)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = standard_analyze(c)
    n_toks = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    mean_tok_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    len_ok = ((n_toks >= 10) & (n_toks <= 5000)).cast("double")
    tok_len_ok = ((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0)).cast("double")
    sw_ratio = stopword_ratio(toks)
    sw_ok = ((sw_ratio >= 0.05) & (sw_ratio <= 0.7)).cast("double")
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.lower(c), r"[^a-z]", "")).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    return F.round(0.3 * len_ok + 0.2 * tok_len_ok + 0.25 * sw_ok + 0.25 * alpha_ratio, 6)


def lang_id_heuristic(text: Column | str) -> Column:
    """N-gram/stopword language-ID heuristic: 'en' when the English stopword
    ratio clears a threshold, else 'unknown'.  (The fixture's text is
    English-ish token soup for every `lang` label — a character-n-gram
    model would be fiction; this documents the honest heuristic.)"""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(stopword_ratio(standard_analyze(c)) >= 0.08, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def doc_fingerprint(text: Column | str, modulus: int = 2_147_483_647) -> Column:
    """Deterministic positional rolling-hash fingerprint:
    sum_i (i+1) * ascii(char_i) mod M.  Order-sensitive (unlike a bag of
    chars), cheap, and exactly reproducible in ANSI SQL for the oracle."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.split(c, "")
    weighted = F.transform(
        chars, lambda ch, i: (i.cast("bigint") + 1) * F.ascii(ch).cast("bigint")
    )
    total = F.aggregate(weighted, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return total % F.lit(modulus)


def md5_token_hash(token: Column) -> Column:
    """Deterministic 60-bit token hash via md5 hex prefix — chosen because
    DuckDB can compute the identical value
    (CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT)), making MinHash /
    SimHash signatures oracle-checkable."""
    return F.conv(F.substring(F.md5(F.encode(token, "UTF-8")), 1, 15), 16, 10).cast("bigint")


# PII patterns shared verbatim with the DuckDB oracle (both engines'
# regex dialects — Java util.regex and RE2 — accept this subset).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_DIGITS = r"\b\d{8,}\b"


def redact_pii(col: Column | str) -> Column:
    """Mask emails, IPv4 addresses, and long digit runs (ids/cards/phones)
    with typed placeholder tokens — the standard pre-training privacy
    scrub.  Chained JVM regexp_replace, whole-stage codegen; order matters
    (emails first so their digits never half-match the later patterns)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4, "<IP>")
    return F.regexp_replace(c, PII_LONG_DIGITS, "<NUM>")


def ngram_array(tokens: Column, n: int) -> Column:
    """Array of space-joined token n-grams (empty when the doc has fewer
    than n tokens).  One transform over an index sequence — per-row Column
    math, embarrassingly parallel at any corpus size."""
    sz = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(n), sz),
        lambda i: F.concat_ws(" ", *[F.get(tokens, i - n + j) for j in range(n)]),
    )
    return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))


def max_consecutive_run(arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements (0 for empty).
    A single F.aggregate fold carrying (best, current, previous) — codegen,
    no explode.  Tokens are never '' (the analyzer drops empties), so ''
    is a safe initial sentinel."""
    init = F.struct(
        F.lit(0).alias("best"), F.lit(0).alias("cur"), F.lit("").alias("prev")
    )

    def step(acc, t):
        cur = F.when(t == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1))
        return F.struct(
            F.greatest(acc["best"], cur).alias("best"),
            cur.alias("cur"),
            t.alias("prev"),
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def max_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any element (0 for empty): sort, then the
    longest equal-adjacent run.  O(k log k) per row — no per-distinct
    rescan, no explode/groupBy."""
    return max_consecutive_run(F.array_sort(arr))
