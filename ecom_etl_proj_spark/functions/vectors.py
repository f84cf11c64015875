"""Vector expression builders for embedding columns (array<float>).

Dot products / norms / cosine run as Catalyst higher-order functions
(zip_with + aggregate) entirely JVM-side: no Python round-trip, no UDF.
Accumulation is a sequential left fold in double precision, which is
what the DuckDB oracle (list_sum over list_transform) computes too, so
rounded outputs compare exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: str | Column, b: str | Column) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: str | Column) -> Column:
    sq = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
