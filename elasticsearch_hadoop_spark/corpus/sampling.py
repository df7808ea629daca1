"""Sampling / dataset-split corpus: deterministic hash train/val/test
split, stratified hash sampling, and top-n-per-stratum subsampling over
the documents table (training-data-pipeline extension operators,
operators/sampling.py).

Every query is hash-checked: the 60-bit md5-prefix hash and the INTEGER
thresholds are identical literals on both engines, so the sampled row
sets agree exactly — no tolerance, no rows-only fallback.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.sampling import (
    HASH_SPACE,
    hash_sample,
    hash_split,
    split_hash_sql,
    topn_per_stratum,
)

_SEED = 7
_H = split_hash_sql("doc_id", _SEED)

_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
_T1 = int(0.8 * HASH_SPACE)
_T2 = int((0.8 + 0.1) * HASH_SPACE)

_STRATA_FRACS = {"src0": 0.5, "src1": 0.2, "src2": 0.2}
_STRATA_CASE = " ".join(
    f"WHEN source = '{s}' THEN {int(f * HASH_SPACE)}"
    for s, f in _STRATA_FRACS.items()
)


@query(
    "sample_train_test_split",
    oracle=f"""
SELECT doc_id,
       CASE WHEN {_H} < {_T1} THEN 'train'
            WHEN {_H} < {_T2} THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
""",
)
def sample_train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by md5-prefix hash
    of the document id — pure scan-stage Column math, no shuffle, no RNG
    state; the same row lands in the same split on any engine, any run,
    any cluster size (the reproducibility a training pipeline needs)."""
    d = tbl(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id", _SPLIT_FRACTIONS, seed=_SEED)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


@query(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, source
FROM documents
WHERE {_H} < (CASE {_STRATA_CASE} ELSE 0 END)
ORDER BY doc_id
""",
)
def sample_stratified(spark, sf_dir):
    """Stratified hash sample: keep 50% of src0 and 20% of src1/src2 and
    drop other sources — the 'rebalance the training mix by source'
    operation, still one scan-stage filter (the per-stratum threshold is a
    CASE over integer literals)."""
    d = tbl(spark, sf_dir, "documents")
    return (
        hash_sample(d, "doc_id", _STRATA_FRACS, strata_col="source", seed=_SEED)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "sample_topn_per_stratum",
    oracle=f"""
SELECT lang, doc_id, rn
FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY {_H} ASC, doc_id ASC)
              AS INT) AS rn
  FROM documents
)
WHERE rn <= 5
ORDER BY lang, rn
""",
)
def sample_topn_per_stratum(spark, sf_dir):
    """Cap every language at 5 documents, chosen deterministically by
    hash rank ('cap each source at N docs' mix control).  Plans as
    WindowGroupLimit: each map partition prunes to its local top-5 before
    the single shuffle on lang."""
    d = tbl(spark, sf_dir, "documents")
    return (
        topn_per_stratum(d, "lang", 5, "doc_id", seed=_SEED)
        .select("lang", "doc_id", F.col("rn").cast("int").alias("rn"))
        .orderBy("lang", "rn")
    )


_MIX_WEIGHTS = {"en": 500_000, "fr": 300_000, "zh": 200_000}
_MIX_W_CASE = " ".join(
    f"WHEN '{d}' THEN {w}" for d, w in _MIX_WEIGHTS.items()
)


@query(
    "sample_to_mixture",
    oracle=f"""
WITH c AS (
    SELECT lang, count(*) AS n,
           CASE lang {_MIX_W_CASE} END AS w
    FROM documents WHERE lang IN ('en', 'fr', 'zh') GROUP BY lang
),
t AS (SELECT min((n * 1000000) // w) AS tt FROM c),
th AS (
    SELECT lang,
           least(CAST({HASH_SPACE} AS HUGEINT),
                 (CAST(w AS HUGEINT) * tt * {HASH_SPACE})
                 // (CAST(1000000 AS HUGEINT) * n)) AS thr
    FROM c, t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN th USING (lang)
WHERE {_H} < thr
ORDER BY d.doc_id
""",
)
def sample_to_mixture_query(spark, sf_dir):
    """Domain-mixture resampling (training-data mixing: en 50% / fr 30% /
    zh 20%): the limiting domain caps the achievable total, every other
    domain thins by an exact integer hash threshold — one k-row
    count aggregate, then the keep decision rides the scan (no shuffle).
    Thresholds are 128-bit-exact on both engines."""
    from elasticsearch_hadoop_spark.operators.sampling import sample_to_mixture

    docs = tbl(spark, sf_dir, "documents")
    out = sample_to_mixture(
        docs, "lang", _MIX_WEIGHTS, id_col="doc_id", seed=_SEED
    )
    return out.select("doc_id", "lang").orderBy("doc_id")
