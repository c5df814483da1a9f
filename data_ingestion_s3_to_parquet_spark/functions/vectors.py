"""Vector math over ``array<float>`` embedding columns — pure JVM exprs.

No UDFs: ``zip_with`` + ``aggregate`` compile to Catalyst expressions
inside whole-stage codegen. The fold accumulates left-to-right in array
order in *double* precision, which matches DuckDB's
``list_cosine_similarity``/``list_dot_product`` on ``DOUBLE[]`` bitwise
(verified empirically), so similarity operators can carry exact oracles.

Scale: a 64-dim dot product is ~64 fused multiply-adds per row, no
shuffle, no Python. For 100 TB you'd want the embedding column stored
as a fixed-size-list parquet type and possibly a pandas_udf + numpy
matmul for batch top-k — see operators/similarity.py for that variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """⟨a,b⟩ accumulated in double, array order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; SQL mirror is
    ``list_cosine_similarity(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))``."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
