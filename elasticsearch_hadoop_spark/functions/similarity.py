"""Vector-similarity math as pure Column expressions (SURVEY.md §2.C
"Similarity search").

F.zip_with + F.aggregate compile to Catalyst HigherOrderFunctions — the dot
product runs JVM-side inside codegen, no Python per row.  Cast inputs to
array<double> first: fixtures store array<float> and float accumulation
would diverge from the (double-based) DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a||b|); null-safe-ish: 0 when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))
