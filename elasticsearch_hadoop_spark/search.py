"""ES search-surface helpers beyond the query DSL: keyset pagination
(``search_after``) and field collapsing (``collapse``) — the two
non-scoring search-body features the reference's users lean on for deep
pagination and per-key dedup of hits.

Scale notes:
- ``search_after`` is THE deep-pagination pattern at 100 TB: the
  lexicographic cursor filter is sargable (pushes to parquet row-group
  stats on the leading sort column), and LIMIT keeps it a
  TakeOrderedAndProject — no global sort, no OFFSET scan-and-discard.
- ``collapse`` compiles to the row_number window idiom; Spark plans it as
  WindowGroupLimit, pruning to per-partition top-k before the single
  shuffle on the collapse key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _direction(spec) -> tuple[str, bool]:
    """ES sort entry -> (field, ascending).  Accepts "field",
    {"field": "asc"|"desc"} or {"field": {"order": ...}}."""
    if isinstance(spec, str):
        return spec, True
    ((field, v),) = spec.items()
    order = v.get("order", "asc") if isinstance(v, dict) else v
    return field, str(order).lower() != "desc"


def lexicographic_after(fields: list[tuple[str, bool]], values) -> Column:
    """The keyset-cursor predicate: (k1,..,kn) strictly after (a1,..,an)
    in lexicographic order, honoring per-field direction.  Shared by
    ``search_after`` and the aggs-DSL composite ``after`` cursor — ONE
    implementation of the subtle OR/AND-prefix construction."""
    if len(values) != len(fields):
        raise ValueError(f"after cursor needs {len(fields)} values, got {len(values)}")
    cond: Column | None = None
    eq_prefix: Column | None = None
    for (field, asc), a in zip(fields, values):
        col, lit = F.col(field), F.lit(a)
        cmp = col > lit if asc else col < lit
        term = cmp if eq_prefix is None else (eq_prefix & cmp)
        cond = term if cond is None else (cond | term)
        eq = col == lit
        eq_prefix = eq if eq_prefix is None else (eq_prefix & eq)
    return cond


def search_after(
    df: DataFrame,
    sort: list,
    after: list | tuple | None = None,
    size: int = 10,
) -> DataFrame:
    """Keyset pagination: rows strictly after the ``after`` cursor in the
    given sort order, first ``size`` of them.  ``sort`` must end in a
    unique tiebreak field (ES requires the same)."""
    fields = [_direction(s) for s in sort]
    out = df
    if after is not None:
        out = out.filter(lexicographic_after(fields, list(after)))
    order = [F.col(f).asc() if asc else F.col(f).desc() for f, asc in fields]
    return out.orderBy(*order).limit(size)


def collapse(
    df: DataFrame,
    field: str,
    sort: list,
    inner_hits: int = 1,
    rank_col: str = "hit_rank",
) -> DataFrame:
    """ES field collapsing: keep the top ``inner_hits`` rows per value of
    ``field``, ranked by ``sort`` (which must break ties for determinism).
    Emits ``rank_col`` (1-based) like the aggs-DSL top_hits rendering."""
    fields = [_direction(s) for s in sort]
    order = [F.col(f).asc() if asc else F.col(f).desc() for f, asc in fields]
    w = Window.partitionBy(field).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= inner_hits)
    )


def highlight(
    df: DataFrame,
    field: str,
    query_text: str,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    out_col: str = "highlight",
    matched_only: bool = True,
) -> DataFrame:
    """ES highlighting, ``number_of_fragments: 0`` mode (the whole field
    returned with every query-term occurrence wrapped in tags).  The query
    text is analyzed with the same lowercase/alnum tokenizer as the match
    query; occurrences match case-insensitively on word boundaries.  ES
    emits highlight only for matching documents — ``matched_only`` keeps
    that contract (rows with no occurrence are dropped).

    One ``regexp_replace`` Column expression (whole-stage codegen); the
    inline ``(?i)`` + ``\\b`` pattern is RE2/Java-portable, so a SQL
    oracle can replay it verbatim."""
    import re as _re

    terms = [t for t in _re.split(r"[^a-z0-9]+", query_text.lower()) if t]
    if not terms:
        raise ValueError("highlight needs at least one query term")
    pattern = r"(?i)\b(" + "|".join(_re.escape(t) for t in terms) + r")\b"
    out = df
    if matched_only:
        out = out.filter(F.col(field).rlike(pattern))
    return out.withColumn(
        out_col, F.regexp_replace(F.col(field), pattern, pre_tag + "$1" + post_tag)
    )


def terms_enum(
    df: DataFrame,
    field: str,
    prefix: str = "",
    size: int = 10,
    case_insensitive: bool = False,
) -> DataFrame:
    """ES ``_terms_enum``: the sorted distinct values of ``field`` that
    start with ``prefix``, first ``size`` of them — the index-backed
    autocomplete endpoint.  Compiles to filter -> distinct -> ordered
    limit: the prefix filter is sargable (parquet row-group stats on a
    sorted/Z-ordered field skip non-matching groups), the distinct is one
    hash shuffle over the (tiny) surviving term set, and the limit is a
    TakeOrderedAndProject."""
    c = F.col(field)
    out = df.select(c.alias("term")).filter(c.isNotNull())
    if prefix:
        probe = F.lower(F.col("term")) if case_insensitive else F.col("term")
        out = out.filter(
            probe.startswith(prefix.lower() if case_insensitive else prefix)
        )
    return out.distinct().orderBy("term").limit(size)
