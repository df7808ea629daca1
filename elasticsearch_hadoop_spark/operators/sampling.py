"""Deterministic sampling / dataset-split operators for training-data
pipelines (driver-mandated extension class, alongside dedup/similarity):
hash-based train/val/test split, (stratified) hash sampling, and
deterministic top-n-per-stratum subsampling.

Design for 100 TB:
- Assignment is a pure Column expression over md5 of the row key — no
  shuffle, no RNG state, no driver pass; the split/sample decision rides
  the scan stage and is reproducible run-over-run and engine-over-engine
  (the DuckDB oracle computes the identical 60-bit hash, and thresholds
  are INTEGER literals precomputed in Python — no float parity risk).
- Top-n-per-stratum uses the row_number window idiom, which Spark plans
  as WindowGroupLimit: each map partition prunes to its local top-n
  before the shuffle.
- Rows never move for a split: downstream consumers filter on the label
  (or the table is written partitionBy(split) once, making each split read
  partition pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.functions.text import md5_token_hash

# md5_token_hash yields 60 bits (15 hex chars)
HASH_SPACE = 1 << 60


def split_hash(key: Column, seed: int = 0) -> Column:
    """Uniform 60-bit hash of (seed, key) — the sampling randomness.
    DuckDB twin: CAST(concat('0x', substr(md5(concat('<seed>:',
    CAST(key AS VARCHAR))), 1, 15)) AS BIGINT)."""
    return md5_token_hash(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def split_hash_sql(key_sql: str, seed: int = 0) -> str:
    """The DuckDB expression computing the identical hash."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}:', "
        f"CAST({key_sql} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) by
    deterministic hash bucketing.  Fractions must sum to 1.  Integer
    threshold comparison — bit-reproducible anywhere md5 exists."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = split_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        thresh = int(acc * HASH_SPACE)
        cond = h < F.lit(thresh)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # floating accumulation can leave the last threshold a hair under
    # HASH_SPACE; the otherwise() closes the gap with the last label
    return df.withColumn(split_col, expr.otherwise(name))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float | dict[str, float],
    strata_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash falls
    under fraction (uniform), or under a per-stratum fraction when
    ``fraction`` is a dict keyed by strata value (stratified sampling —
    e.g. downweight an over-represented source in a training mix)."""
    h = split_hash(F.col(id_col), seed)
    if strata_col is None:
        if not isinstance(fraction, (int, float)):
            raise ValueError("scalar fraction required without strata_col")
        return df.filter(h < F.lit(int(fraction * HASH_SPACE)))
    if not isinstance(fraction, dict):
        return df.filter(h < F.lit(int(fraction * HASH_SPACE)))
    thresh = None
    for value, frac in fraction.items():
        t = F.lit(int(frac * HASH_SPACE))
        cond = F.col(strata_col) == value
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    return df.filter(h < thresh.otherwise(F.lit(0)))


def topn_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic n rows per stratum: rank by hash within the stratum
    and keep the first n.  A fixed-size per-group subsample (the 'cap
    every source at N docs' training-mix operation).  Plans as
    WindowGroupLimit — map-side pruned before the one shuffle on
    strata_col."""
    h = split_hash(F.col(id_col), seed)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


# parts-per-million weight scale for the mixture sampler: integer weights
# keep every threshold exactly reproducible in any engine with 128-bit
# integer math (no float-rounding parity risk between Spark and an oracle)
MIX_SCALE = 1_000_000
# beyond this many domains, a literal CASE-WHEN threshold chain stops
# being the cheap path (plan-tree bloat) — switch to a broadcast join
_WHEN_CHAIN_MAX = 64
# hard driver-memory guard: weights + counts dicts live on the driver
MAX_MIXTURE_DOMAINS = 100_000


def mixture_thresholds(
    counts: dict[str, int], weights_ppm: dict[str, int]
) -> dict[str, int]:
    """Exact integer hash thresholds realizing a target domain mixture
    WITHOUT upsampling.  The achievable total is capped by the limiting
    domain: T = min_d floor(n_d * SCALE / w_d); each domain then keeps
    rate_d = w_d * T / (SCALE * n_d) of its rows (the limiting domain
    ~1.0).  All arithmetic is arbitrary-precision integer — the DuckDB
    twin computes the identical thresholds with HUGEINT."""
    bad = [d for d in weights_ppm if counts.get(d, 0) <= 0]
    if bad:
        raise ValueError(f"mixture domains absent from the data: {bad}")
    if any(w <= 0 for w in weights_ppm.values()):
        raise ValueError("mixture weights must be positive")
    t = min((counts[d] * MIX_SCALE) // w for d, w in weights_ppm.items())
    return {
        d: min(HASH_SPACE, (w * t * HASH_SPACE) // (MIX_SCALE * counts[d]))
        for d, w in weights_ppm.items()
    }


def sample_to_mixture(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float] | dict[str, int],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Resample a corpus to target domain proportions (training-data
    mixing: '50% web, 30% code, 20% books').  Weights are fractions (or
    ppm integers); domains not listed are dropped.  Downsampling only —
    the limiting domain survives whole, everything else thins to match.

    Cost at 100 TB: one groupBy-count over the LISTED domains only (the
    `isin` prunes first, so at most len(weights) rows reach the driver —
    never the column's full cardinality), then the keep decision is a
    pure Column hash threshold riding the scan — no shuffle, no RNG
    state, and the identical rows survive on any cluster layout.  Above
    _WHEN_CHAIN_MAX domains the per-row threshold comes from a broadcast
    join against a (domain, threshold) frame instead of a literal
    CASE-WHEN chain (a 10k-branch chain blows up analysis/codegen);
    above MAX_MIXTURE_DOMAINS the call is refused outright — the
    weights dict itself is driver-resident, so a million-domain mixture
    needs a different API shape (weights as a DataFrame), not a bigger
    driver."""
    if len(weights) > MAX_MIXTURE_DOMAINS:
        raise ValueError(
            f"sample_to_mixture got {len(weights)} domains; the weights "
            f"dict and per-domain counts are driver-resident, capped at "
            f"{MAX_MIXTURE_DOMAINS}. For unbounded-cardinality mixtures "
            "pass coarser domains or aggregate weights upstream."
        )
    if all(isinstance(w, int) for w in weights.values()):
        ppm = dict(weights)  # already parts-per-million
    else:
        total = float(sum(weights.values()))
        ppm = {d: int(round(w / total * MIX_SCALE)) for d, w in weights.items()}
    domains = list(ppm)
    if len(domains) <= _WHEN_CHAIN_MAX:
        scoped = df.filter(F.col(domain_col).isin(domains))
    else:
        # membership via broadcast semi-join: an isin() literal list of
        # thousands of values bloats the plan tree instead of pruning it
        # (select restores schema order — join moves the key to front)
        spark = df.sparkSession
        dom_df = spark.createDataFrame([(d,) for d in domains], [domain_col])
        scoped = df.join(F.broadcast(dom_df), on=domain_col, how="semi").select(
            *df.columns
        )
    counts = {
        r[0]: r[1] for r in scoped.groupBy(domain_col).count().collect()
    }
    th = mixture_thresholds(counts, ppm)
    h = split_hash(F.col(id_col), seed)
    if len(domains) <= _WHEN_CHAIN_MAX:
        expr = None
        for d in domains:
            cond = F.col(domain_col) == d
            lit = F.lit(th[d])
            expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
        return scoped.filter(h < expr.otherwise(F.lit(0)))
    spark = df.sparkSession
    th_df = spark.createDataFrame(
        [(d, t) for d, t in th.items()], [domain_col, "__mix_threshold"]
    )
    joined = scoped.join(F.broadcast(th_df), on=domain_col, how="inner")
    # join(on=<key>) moves the key to position 0 — restore the input
    # schema order so both paths are drop-in equivalent for positional
    # consumers
    return (
        joined.filter(h < F.col("__mix_threshold"))
        .select(*scoped.columns)
    )
