"""Similarity-search corpus: brute-force cosine top-k (exact baseline),
range search, per-group top-k, and IVF-probed approximate top-k
(driver-mandated extension, SURVEY.md §2.C).

The query vector is embeddings[vec_id=0] — fetched at plan-build time (a
one-row lookup, the analogue of embedding the user's query text).  All
cosine math is double-precision on both sides (fixtures store float32 —
cast first, or Spark's float accumulation diverges from DuckDB's double).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import spread, tbl
from elasticsearch_hadoop_spark.functions.similarity import cosine_similarity
from elasticsearch_hadoop_spark.operators.similarity import (
    assign_ivf_cells,
    brute_force_topk,
    ivf_topk,
    topk_per_group,
    train_centroids,
)

_QVEC_SQL = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"


def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row[0]]


@query(
    "similarity_topk_brute",
    oracle=f"""
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}), 6) AS cosine
FROM embeddings
ORDER BY list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) DESC, vec_id
LIMIT 10
""",
)
def similarity_topk_brute(spark, sf_dir):
    """Exact cosine top-10: one scan + TakeOrderedAndProject (per-partition
    heaps, k-row driver merge — no global sort, 100 TB-safe)."""
    e = spread(spark, tbl(spark, sf_dir, "embeddings"))
    out = brute_force_topk(e, _query_vec(spark, sf_dir), k=10)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


@query(
    "similarity_range_search",
    oracle=f"""
SELECT vec_id, label,
       round(list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}), 6) AS cosine
FROM embeddings
WHERE list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) >= 0.35
ORDER BY vec_id
""",
)
def similarity_range_search(spark, sf_dir):
    """Threshold (range) similarity search: all vectors with cosine >= 0.35."""
    e = spread(spark, tbl(spark, sf_dir, "embeddings"))
    q = F.array(*[F.lit(x) for x in _query_vec(spark, sf_dir)]).cast("array<double>")
    return (
        e.withColumn("cosine", cosine_similarity(F.col("embedding").cast("array<double>"), q))
        .filter(F.col("cosine") >= 0.35)
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy("vec_id")
    )


@query(
    "similarity_topk_per_label",
    oracle=f"""
SELECT vec_id, label, round(cosine, 6) AS cosine, rn
FROM (
  SELECT vec_id, label,
         list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) AS cosine,
         CAST(row_number() OVER (
             PARTITION BY label
             ORDER BY list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) DESC, vec_id
         ) AS BIGINT) AS rn
  FROM embeddings
)
WHERE rn <= 3
ORDER BY label, rn
""",
)
def similarity_topk_per_label(spark, sf_dir):
    """Top-3 nearest per label (grouped ANN result diversification)."""
    e = spread(spark, tbl(spark, sf_dir, "embeddings"))
    out = topk_per_group(e, _query_vec(spark, sf_dir), group_col="label", k=3)
    return out.select(
        "vec_id", "label", F.round("cosine", 6).alias("cosine"), F.col("rn").cast("bigint").alias("rn")
    ).orderBy("label", "rn")


@query(
    "similarity_ivf_topk",
    oracle=f"""
SELECT CAST(10 AS BIGINT) AS k_returned,
       (SELECT round(min(c), 6) FROM (
          SELECT list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) AS c
          FROM embeddings ORDER BY c DESC LIMIT 10
       )) AS kth_exact_cosine,
       TRUE AS recall_ok
""",
)
def similarity_ivf_topk(spark, sf_dir):
    """IVF-probed approximate top-10: 8 cells from 4 deterministic Lloyd's
    iterations (train_centroids — distributed posexplode/groupBy means, no
    driver pass), probe the 5 nearest cells.  The raw id list cannot be
    value-hashed cross-engine (cell argmax ties on ~1e-16 cosine
    differences), so — like the agg_approx_distinct/percentile sketch
    promotions — the hashed output is a BOUNDS ASSERTION: the exact
    brute-force 10th-best cosine (engine-independent, DuckDB recomputes
    it), the IVF result count, and a boolean `recall_ok` that is true iff
    >= 8 of the IVF top-10 are in the exact top-10 (the 0.8 recall gate
    tests/test_similarity.py pins).  A drifting quantizer or probe bug
    flips the boolean and fails the hash.  The synthetic embeddings are
    near-uniform — IVF's worst case; clustered real embeddings allow much
    lower nprobe/ncells ratios.

    Scale story: with the table written partitionBy(ivf_cell), the probe
    filter is partition pruning — the scan physically skips the unprobed
    cells' files."""
    e = spread(spark, tbl(spark, sf_dir, "embeddings"))
    centroids = train_centroids(e, k=8, iters=4)
    with_cells = assign_ivf_cells(e, centroids)
    qv = _query_vec(spark, sf_dir)
    ivf = ivf_topk(with_cells, centroids, qv, k=10, nprobe=5).select("vec_id", "cosine")
    brute = brute_force_topk(e, qv, k=10)
    k_returned = ivf.agg(F.count("*").alias("k_returned"))
    overlap = ivf.join(brute.select("vec_id"), on="vec_id", how="left_semi").agg(
        F.count("*").alias("__overlap")
    )
    kth = brute.agg(F.round(F.min("cosine"), 6).alias("kth_exact_cosine"))
    return (
        k_returned.crossJoin(kth)
        .crossJoin(overlap)
        .select(
            "k_returned", "kth_exact_cosine", (F.col("__overlap") >= 8).alias("recall_ok")
        )
    )


_SQ_ORACLE = f"""
WITH dims AS (
  SELECT t.i AS i, min(embedding[t.i]::DOUBLE) AS mn, max(embedding[t.i]::DOUBLE) AS mx
  FROM embeddings, range(1, 65) t(i)
  GROUP BY t.i
),
vals AS (
  SELECT vec_id, t.i AS i, embedding[t.i]::DOUBLE AS v
  FROM embeddings, range(1, 65) t(i)
),
codes AS (
  SELECT vec_id, vals.i,
         CAST(CASE WHEN mx > mn
              THEN least(255.0, greatest(0.0, floor((v - mn) / (mx - mn) * 256)))
              ELSE 128.0 END AS BIGINT) - 128 AS c
  FROM vals JOIN dims ON vals.i = dims.i
),
qvals AS (
  SELECT t.i AS i, q.e[t.i]::DOUBLE AS v
  FROM (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0) q,
       range(1, 65) t(i)
),
qcodes AS (
  SELECT qvals.i,
         CAST(CASE WHEN mx > mn
              THEN least(255.0, greatest(0.0, floor((v - mn) / (mx - mn) * 256)))
              ELSE 128.0 END AS BIGINT) - 128 AS c
  FROM qvals JOIN dims ON qvals.i = dims.i
),
scores AS (
  SELECT codes.vec_id, sum(codes.c * qcodes.c) AS s
  FROM codes JOIN qcodes ON codes.i = qcodes.i
  GROUP BY codes.vec_id
),
cand AS (SELECT vec_id FROM scores ORDER BY s DESC, vec_id LIMIT 40)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], {_QVEC_SQL}), 6) AS cosine
FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], {_QVEC_SQL}) DESC, e.vec_id
LIMIT 10
"""


@query("similarity_sq_topk", oracle=_SQ_ORACLE)
def similarity_sq_topk(spark, sf_dir):
    """Int8 scalar-quantized ANN top-10 — the memory-bound third leg beside
    IVF and RP-LSH.  Per-dimension [min,max] bounds train distributed
    (posexplode -> groupBy(dim) min/max, 2×64 doubles to the driver); codes
    are floor-based affine int8 (array<tinyint>, 4× less IO/RAM than
    float32); candidate generation is an integer dot product over codes
    (codegen F.aggregate), top-40 by (int score, id); the exact double
    cosine rescores just those 40.  Every step is deterministic — floor
    codes, integer scores, id tie-breaks — so the DuckDB oracle replays
    the whole pipeline and this is hash-checked end-to-end, no bounds
    assertion needed.

    Scale story: persist sq_code at ingest and scan ONLY the 1-byte codes
    for candidate generation (both stages are TakeOrderedAndProject —
    per-partition heaps, no global sort); the float column is read for the
    rescore_k rows alone."""
    from elasticsearch_hadoop_spark.operators.similarity import (
        sq_encode,
        sq_topk,
        train_sq_bounds,
    )

    e = spread(spark, tbl(spark, sf_dir, "embeddings"))
    mins, maxs = train_sq_bounds(e)
    enc = sq_encode(e, mins, maxs)
    out = sq_topk(enc, mins, maxs, _query_vec(spark, sf_dir), k=10, rescore_k=40)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


def _lsh_bits_sql(vec_sql: str, planes) -> str:
    """The bit-packed sign-pattern bucket as DuckDB SQL — same frozen ±1
    plane literals the Spark side uses, so buckets agree bit-for-bit."""
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ",".join(f"{x:.1f}" for x in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_inner_product({vec_sql}, {lit}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


_LSH_PLANES = None


def _lsh_planes():
    global _LSH_PLANES
    if _LSH_PLANES is None:
        from elasticsearch_hadoop_spark.operators.similarity import rp_lsh_planes

        _LSH_PLANES = rp_lsh_planes(num_planes=4, dim=64)
    return _LSH_PLANES


def _lsh_oracle() -> str:
    planes = _lsh_planes()
    row_bits = _lsh_bits_sql("embedding::DOUBLE[]", planes)
    q_bits = _lsh_bits_sql(_QVEC_SQL, planes)
    probes = ", ".join(
        ["CAST(qb.b AS BIGINT)"]
        + [f"xor(CAST(qb.b AS BIGINT), {1 << i})" for i in range(len(planes))]
    )
    return f"""
WITH qb AS (SELECT ({q_bits}) AS b),
     bucketed AS (SELECT vec_id, embedding, ({row_bits}) AS bucket FROM embeddings)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}), 6) AS cosine
FROM bucketed, qb
WHERE bucket IN ({probes})
ORDER BY list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) DESC, vec_id
LIMIT 10
"""


@query("similarity_lsh_topk", oracle=_lsh_oracle())
def similarity_lsh_topk(spark, sf_dir):
    """Random-hyperplane (signed-random-projection) LSH top-10 — the
    training-free bucketed ANN path beside IVF.  4 frozen ±1 hyperplanes
    bit-pack into a 16-bucket id; multiprobe radius 1 scans the query's
    bucket plus its 4 single-bit neighbors (~31% of a uniform corpus,
    recall 0.8@10 vs brute force on these near-uniform worst-case vectors
    — gated in tests/test_similarity.py).  Buckets are deterministic
    md5-derived literals, so the DuckDB oracle reproduces them exactly and
    this is hash-checked end-to-end.

    Scale story: persist partitionBy(lsh_bucket) and the probe filter is
    partition pruning — identical shape to the IVF cell path, no trained
    quantizer needed."""
    from elasticsearch_hadoop_spark.operators.similarity import (
        assign_lsh_buckets,
        lsh_topk,
    )

    planes = _lsh_planes()
    e = spread(spark, tbl(spark, sf_dir, "embeddings"))
    wb = assign_lsh_buckets(e, planes)
    out = lsh_topk(wb, planes, _query_vec(spark, sf_dir), k=10, hamming_radius=1)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


@query(
    "search_rrf_hybrid",
    oracle=f"""
WITH q0 AS {_QVEC_SQL.replace('vec_id = 0', 'vec_id = 0')},
ra AS (
  SELECT vec_id, row_number() OVER (
      ORDER BY list_cosine_similarity(embedding::DOUBLE[],
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC,
               vec_id) AS rnk
  FROM embeddings
  QUALIFY rnk <= 20
),
rb AS (
  SELECT vec_id, row_number() OVER (
      ORDER BY list_cosine_similarity(embedding::DOUBLE[],
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 1)) DESC,
               vec_id) AS rnk
  FROM embeddings
  QUALIFY rnk <= 20
),
un AS (
  SELECT vec_id, 1.0 / (60 + rnk) AS c FROM ra
  UNION ALL
  SELECT vec_id, 1.0 / (60 + rnk) AS c FROM rb
),
fused AS (
  SELECT vec_id, round(sum(c), 6) AS rrf_score,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM un GROUP BY vec_id
)
SELECT vec_id, rrf_score, n_lists,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, vec_id) AS INT)
         AS fused_rank
FROM fused
QUALIFY fused_rank <= 10
ORDER BY fused_rank
""",
)
def search_rrf_hybrid(spark, sf_dir):
    """ES RRF retriever (hybrid search): reciprocal-rank fusion of two
    top-20 cosine rankings (query vectors = embeddings 0 and 1) with
    rank_constant 60 — per-list contributions union (no join), one hash
    agg on the doc id, TakeOrderedAndProject for the fused page
    (search.rrf_fuse).  The fusion cost is O(lists x k), independent of
    corpus size."""
    from pyspark.sql import Window

    from elasticsearch_hadoop_spark.functions.similarity import cosine_similarity
    from elasticsearch_hadoop_spark.search import rrf_fuse

    e = tbl(spark, sf_dir, "embeddings")

    def ranked(qv):
        q = F.array(*[F.lit(x) for x in qv]).cast("array<double>")
        cos = cosine_similarity(F.col("embedding").cast("array<double>"), q)
        w = Window.orderBy(cos.desc(), F.col("vec_id").asc())
        return (
            e.select("vec_id", F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= 20)
        )

    qv0 = _query_vec(spark, sf_dir)
    row1 = e.filter(F.col("vec_id") == 1).select("embedding").first()
    qv1 = [float(x) for x in row1[0]]
    out = rrf_fuse([ranked(qv0), ranked(qv1)], "vec_id", k=60, size=10)
    return out.select(
        "vec_id",
        F.round("rrf_score", 6).alias("rrf_score"),
        "n_lists",
        "fused_rank",
    ).orderBy("fused_rank")


@query(
    "search_retriever_tree",
    oracle=f"""
WITH ra AS (
  SELECT vec_id, row_number() OVER (
      ORDER BY list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) DESC,
               vec_id) AS rnk
  FROM embeddings
  QUALIFY rnk <= 20
),
rb AS (
  SELECT vec_id, row_number() OVER (
      ORDER BY (vec_id % 83) * 0.1::DOUBLE DESC, vec_id) AS rnk
  FROM embeddings
  QUALIFY rnk <= 20
),
un AS (
  SELECT vec_id, 1.0 / (60 + rnk) AS c FROM ra
  UNION ALL
  SELECT vec_id, 1.0 / (60 + rnk) AS c FROM rb
),
fused AS (
  SELECT vec_id, sum(c) AS s FROM un GROUP BY vec_id
)
SELECT vec_id, round(s, 6) AS fused_score,
       CAST(row_number() OVER (ORDER BY s DESC, vec_id) AS INT) AS rank
FROM fused
ORDER BY s DESC, vec_id
LIMIT 12
""",
)
def search_retriever_tree(spark, sf_dir):
    """ES 8.14+ `retriever` TREE (the modern request form): `rrf` fusing
    a `knn` leaf (exact cosine top-20 toward vec 0) with a `standard`
    leaf (deterministic script_score ranking), rank_constant 60,
    sub-lists fused 20 deep (rank_window_size), request size 12.
    Exercises compile_retriever's composition contract —
    every node normalizes to (id, _score, rank), so trees nest.  Leaves
    are scan-level TakeOrderedAndProject top-ks; the fusion unions two
    20-row lists."""
    from elasticsearch_hadoop_spark.search import compile_retriever

    e = spread(spark, tbl(spark, sf_dir, "embeddings"))
    body = {"rrf": {
        "rank_constant": 60,
        "rank_window_size": 20,  # each sub-list fuses 20 deep (ES shape)
        "retrievers": [
            {"knn": {"field": "embedding",
                     "query_vector": _query_vec(spark, sf_dir), "k": 20}},
            {"standard": {"query": {"function_score": {"functions": [
                {"script_score": {"script": "emit(doc['vec_id'].value % 83 * 0.1)"}}
            ]}}}},
        ],
    }}
    out = compile_retriever(e, body, id_col="vec_id", size=12)
    return out.select(
        "vec_id", F.round("_score", 6).alias("fused_score"), "rank"
    ).orderBy("rank")
