"""Scalar function surface.

The reference's only scalar function is a vendored ``strtobool``
(``neo4j_beam/util.py:61-74``, used for the ``--neo4j_use_tls`` flag at
``pipeline.py:217``) — reproduced here driver-side and as a column
expression. The vector helpers are built-in-function compositions (JVM-side,
codegen'd — no Python UDF in the hot path) used by the similarity operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRUE = ("y", "yes", "t", "true", "on", "1")
_FALSE = ("n", "no", "f", "false", "off", "0")


def strtobool(val: str) -> int:
    """Parse a human boolean string → 1/0; raise on anything else.

    Same contract as the CPython-distutils function the reference vendors
    (``neo4j_beam/util.py:61-74``).
    """
    v = val.lower()
    if v in _TRUE:
        return 1
    if v in _FALSE:
        return 0
    raise ValueError(f"invalid truth value {val!r}")


def strtobool_col(col: Column) -> Column:
    """Column variant: 1/0, null for unparseable (columnar ops don't raise)."""
    lowered = F.lower(col)
    return (
        F.when(lowered.isin(*_TRUE), F.lit(1))
        .when(lowered.isin(*_FALSE), F.lit(0))
        .otherwise(F.lit(None).cast("int"))
    )


# -- vector math over array<float/double> columns (all JVM-side) -----------

def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe for zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
