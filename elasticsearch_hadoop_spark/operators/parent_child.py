"""ES parent-child (`join` field type): has_child / has_parent /
parent_id over a single frame that carries the join relation.

ES models parent-child inside ONE index via a `join` field — each doc
carries ``{"name": <relation>, "parent": <parent _id or null>}`` — and
queries it with ``has_child`` (parents whose children match),
``has_parent`` (children whose parent matches) and ``parent_id``
(children of one parent).  Upstream routes children to the parent's
shard and joins in memory per shard; here the same data model compiles
to Spark joins:

- ``parent_id`` is a plain sargable filter on ``join.parent`` — it
  pushes down to the scan like any predicate.
- ``has_child`` filters children by the inner query (predicate pushdown
  applies), aggregates child counts per parent key ONLY when
  min_children/max_children demand it (otherwise a distinct-free
  LEFT SEMI join), and semi-joins the parent side.  The matching-parent
  key set is usually small after a selective child query, so AQE
  broadcasts it; at 100 TB both sides can also be bucketed by the
  parent key for a zero-shuffle plan (catalog.write_bucketed).
- ``has_parent`` filters parents by the inner query and semi-joins
  children on ``join.parent`` — the parent side is the small one
  (broadcast).

These cannot be Column predicates (they relate ROWS to other rows), so
``query_dsl.compile_query`` rejects the three clauses with a pointer
here; ``search_join_index`` accepts a full query body whose top level
(or bool.must/filter arms) mixes join-family clauses with ordinary ones
and applies them conjunctively.

Reference surface: ES join field + has_child/has_parent/parent_id query
DSL (SURVEY.md §2.C query-DSL veneer; upstream never pushed these to
Spark — this closes the same user-visible gap aggs_dsl does for
aggregations).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

JOIN_COL = "join_field"
ID_COL = "_id"


def _rel(df: DataFrame, join_col: str) -> Column:
    return F.col(f"{join_col}.name")


def _parent_key(df: DataFrame, join_col: str) -> Column:
    return F.col(f"{join_col}.parent")


def parent_id(
    df: DataFrame,
    child_type: str,
    parent: str,
    *,
    join_col: str = JOIN_COL,
) -> DataFrame:
    """ES ``parent_id`` query: children of one parent — a sargable
    filter (pushes to the scan), no join at all."""
    return df.filter(
        (_rel(df, join_col) == F.lit(child_type))
        & (_parent_key(df, join_col) == F.lit(parent))
    )


def has_child(
    df: DataFrame,
    child_type: str,
    query: dict | None = None,
    *,
    parent_type: str | None = None,
    min_children: int = 1,
    max_children: int | None = None,
    join_col: str = JOIN_COL,
    id_col: str = ID_COL,
) -> DataFrame:
    """ES ``has_child``: parent docs with [min_children, max_children]
    children of ``child_type`` matching ``query``.

    min_children=1 / max_children=None (the ES defaults) skip the count
    aggregation entirely: a LEFT SEMI join against the filtered child
    rows (Spark dedups the build side itself — no distinct shuffle).
    """
    if min_children < 1 and max_children is None:
        raise QueryDslError("has_child: min_children must be >= 1 without max_children")
    children = df.filter(_rel(df, join_col) == F.lit(child_type))
    if query is not None:
        children = children.filter(compile_query(query, id_col=id_col))
    parents = df
    if parent_type is not None:
        parents = parents.filter(_rel(df, join_col) == F.lit(parent_type))
    else:
        parents = parents.filter(_parent_key(df, join_col).isNull())
    if min_children <= 1 and max_children is None:
        keys = children.select(_parent_key(df, join_col).alias("__pk"))
        return parents.join(
            keys, on=parents[id_col] == keys["__pk"], how="left_semi"
        )
    counts = (
        children.groupBy(_parent_key(df, join_col).alias("__pk"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= F.lit(min_children))
    )
    if max_children is not None:
        counts = counts.filter(F.col("__n") <= F.lit(max_children))
    return parents.join(
        counts.select("__pk"), on=parents[id_col] == counts["__pk"], how="left_semi"
    )


def has_parent(
    df: DataFrame,
    parent_type: str,
    query: dict | None = None,
    *,
    child_type: str | None = None,
    join_col: str = JOIN_COL,
    id_col: str = ID_COL,
) -> DataFrame:
    """ES ``has_parent``: child docs whose parent matches ``query``.
    The matching-parent key set is the small side — broadcast by AQE."""
    parents = df.filter(_rel(df, join_col).isNotNull())
    if parent_type is not None:
        parents = df.filter(_rel(df, join_col) == F.lit(parent_type))
    if query is not None:
        parents = parents.filter(compile_query(query, id_col=id_col))
    children = df.filter(_parent_key(df, join_col).isNotNull())
    if child_type is not None:
        children = children.filter(_rel(df, join_col) == F.lit(child_type))
    keys = parents.select(F.col(id_col).alias("__pk"))
    return children.join(
        keys, on=_parent_key(children, join_col) == keys["__pk"], how="left_semi"
    )


_JOIN_KINDS = ("has_child", "has_parent", "parent_id")


def search_join_index(
    df: DataFrame,
    query: dict[str, Any],
    *,
    join_col: str = JOIN_COL,
    id_col: str = ID_COL,
) -> DataFrame:
    """Run a query body that mixes join-family clauses with ordinary
    query-DSL over a join-field frame.  The top level may be a single
    clause or a ``bool`` whose must/filter arms are applied
    conjunctively (the semi-join composition of ES's conjunctive
    scoring-free subset); should/must_not arms must not contain
    join-family clauses (rejected, not approximated)."""
    if "query" in query and set(query) == {"query"}:
        query = query["query"]
    (kind, body), = query.items() if len(query) == 1 else (("", None),)
    if kind == "bool":
        clauses = []
        for arm in ("must", "filter"):
            v = body.get(arm, [])
            clauses.extend(v if isinstance(v, list) else [v])
        for arm in ("should", "must_not"):
            for c in _as_list(body.get(arm)):
                if isinstance(c, dict) and set(c) & set(_JOIN_KINDS):
                    raise QueryDslError(
                        f"join-family clause inside bool.{arm} is not "
                        "expressible as a semi-join conjunction"
                    )
        out = df
        rest = dict(body)
        rest.pop("must", None)
        rest.pop("filter", None)
        plain: list[dict] = []
        for c in clauses:
            out, used = _apply_one(out, c, join_col=join_col, id_col=id_col)
            if not used:
                plain.append(c)
        if plain or rest:
            residual = dict(rest)
            if plain:
                residual["filter"] = plain
            if residual:
                out = out.filter(compile_query({"bool": residual}, id_col=id_col))
        return out
    out, used = _apply_one(df, query, join_col=join_col, id_col=id_col)
    if not used:
        out = out.filter(compile_query(query, id_col=id_col))
    return out


def _as_list(x) -> list:
    if x is None:
        return []
    return x if isinstance(x, list) else [x]


def _apply_one(
    df: DataFrame, clause: dict, *, join_col: str, id_col: str
) -> tuple[DataFrame, bool]:
    if not isinstance(clause, dict) or len(clause) != 1:
        raise QueryDslError(f"expected a single-key clause, got: {clause!r}")
    (kind, body), = clause.items()
    if kind == "has_child":
        return (
            has_child(
                df,
                body["type"],
                body.get("query"),
                min_children=int(body.get("min_children", 1)),
                max_children=(
                    int(body["max_children"]) if "max_children" in body else None
                ),
                join_col=join_col,
                id_col=id_col,
            ),
            True,
        )
    if kind == "has_parent":
        return (
            has_parent(
                df,
                body.get("parent_type"),
                body.get("query"),
                join_col=join_col,
                id_col=id_col,
            ),
            True,
        )
    if kind == "parent_id":
        return (
            parent_id(df, body["type"], body["id"], join_col=join_col),
            True,
        )
    return df, False
