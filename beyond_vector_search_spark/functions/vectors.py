"""Dense-vector math over ``array<double>`` columns, JVM-side.

Embedding similarity without UDFs: ``zip_with`` + ``aggregate`` run
inside whole-stage codegen and fold the array LEFT-TO-RIGHT, which makes
per-row results bit-deterministic (same fold order as the DuckDB
oracle's ``list_dot_product``) — unlike cross-row float aggregation.

Cast ``array<float>`` inputs to ``array<double>`` first so both engines
do the arithmetic in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product. DuckDB: ``list_dot_product(a, b)``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm. DuckDB: ``sqrt(list_sum(list_transform(a, x -> x*x)))``."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity with 0-norm guard (0.0 for degenerate vectors)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with the norms hoisted into per-row columns.

    Bit-identical to :func:`cosine_sim` (same multiply and divide on the
    same fold results), but the O(dim) norm folds run once per ROW
    instead of once per PAIR — the difference between O((n+q)·dim) and
    O(n·q·dim) side work under a top-k join."""
    denom = na * nb
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
