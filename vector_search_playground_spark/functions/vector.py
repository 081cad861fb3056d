"""Vector distance kernels as Catalyst higher-order-function expressions.

The reference gets these from pgvector's C operators — cosine ``<=>`` is the
one it uses (`/root/reference/src/main.rs:87`); L2 ``<->`` and negative inner
product ``<#>`` are imported but unused (`/root/reference/src/main.rs:5`).

Here each distance is a pure Column expression built from ``zip_with`` +
``aggregate`` — Catalyst codegens the loop into the JVM stage, so there is no
Python boundary, no serialization, and the kernel fuses with the surrounding
scan/filter/top-k in one whole-stage-codegen span. At 100 TB this is the
difference between a network-free map-side computation and shipping every
vector through Arrow into Python.

Accumulation is in DOUBLE: f32 inputs are exactly representable in f64 and
the f64 product of two f32 values is exact, so only the summation order can
differ from another engine — handled by rounding at oracle boundaries.

pgvector semantics preserved: cosine distance of a zero vector is NaN
(0/0); NaN fails ``< threshold`` filters in both Postgres and Spark, so
zero vectors drop out of thresholded searches identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(x: Column) -> Column:
    return x.cast("double")


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — pgvector inner product (the positive one)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """‖a‖₂."""
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖). NaN when either vector is zero (pgvector 0/0
    semantics); the explicit guard keeps ANSI mode's divide-by-zero error
    out of the plan without disabling ANSI globally."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(float("nan"))).otherwise(
        dot_product(a, b) / denom
    )


def cosine_distance(a: Column, b: Column, *, normalized: bool = False) -> Column:
    """pgvector ``<=>``: 1 − cosine similarity.

    ``normalized=True`` is the fast path for unit vectors (the fixture
    embeddings and AllMiniLM-L6-v2 outputs are L2-normalized): skips the two
    norm computations, 1 aggregate instead of 3.
    """
    if normalized:
        return F.lit(1.0) - dot_product(a, b)
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: Column, b: Column) -> Column:
    """pgvector ``<->``: Euclidean distance."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (_as_double(x) - _as_double(y)) ** F.lit(2)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def inner_product_distance(a: Column, b: Column) -> Column:
    """pgvector ``<#>``: negative inner product (so that smaller = closer)."""
    return -dot_product(a, b)
