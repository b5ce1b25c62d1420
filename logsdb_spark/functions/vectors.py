"""Vector math over ArrayType(FloatType) embedding columns —
*[extension]* similarity-search support (SURVEY §2.12).

All built-in higher-order functions (zip_with / aggregate), evaluated
JVM-side. Accumulation is an ordered left fold in DOUBLE so the DuckDB
oracle (list_sum over the same element order, also DOUBLE) produces
bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold double dot product."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_sq(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** F.lit(2)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)
