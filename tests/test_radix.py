"""Certificate for ``operators/radix`` — the zero-probe bucketing that
r15's pass-fused stat kernels (``operators/selection``,
``operators/prefix``) stand on.

The kernels' exactness proofs need exactly two properties of the
bucket function: it is a DETERMINISTIC pure function of the double
(two passes over the same data agree without coordination) and it is
EXACTLY monotone (cumulative bucket counts are exact global
positions). Both are asserted here on adversarial doubles — denormals,
powers of two and their neighbors, ±0.0, negatives, extreme
magnitudes — against a driver-side mirror built on ``math.frexp``
(exact by construction), so a libm ``log2`` off-by-one that survived
the expression's power-of-two correction would fail loudly instead of
mis-ranking a quantile.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vector_search_playground_spark.operators.radix import (
    RADIX_SUB_BITS,
    radix_bucket,
    radix_bucket_py,
)

# hand-picked adversarial doubles: subnormals, powers of two and their
# one-ulp neighbors (the libm log2 correction's knife edge), ±0.0,
# sign pairs, extreme exponents
_ADVERSARIAL = [
    0.0,
    -0.0,
    5e-324,                      # min subnormal
    -5e-324,
    1.5e-323,                    # 3 * 2^-1074
    2.2250738585072014e-308,     # min normal
    math.nextafter(2.2250738585072014e-308, 0.0),  # max subnormal
    1.0,
    -1.0,
    2.0,
    0.5,
    math.nextafter(1.0, 0.0),
    math.nextafter(1.0, 2.0),
    math.nextafter(2.0, 0.0),
    math.nextafter(2.0, 3.0),
    2.0**100,
    math.nextafter(2.0**100, 0.0),
    -(2.0**100),
    2.0**-100,
    math.nextafter(2.0**-100, 1.0),
    2.0**1023,
    1.7976931348623157e308,      # max double
    -1.7976931348623157e308,
    1e-6,
    -1e-6,
    3.141592653589793,
    -2.718281828459045,
]


def test_radix_bucket_spark_matches_python_mirror(spark):
    """The Spark expression (libm log2 + power-of-two correction) and
    the frexp mirror must land EVERY adversarial double in the same
    bucket, at several sub-bucket resolutions."""
    for sub_bits in (0, 1, 3, 6):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(_ADVERSARIAL)], "i: int, v: double"
        )
        got = {
            r["i"]: r["b"]
            for r in df.select(
                "i", radix_bucket("v", sub_bits=sub_bits).alias("b")
            ).collect()
        }
        for i, v in enumerate(_ADVERSARIAL):
            want = radix_bucket_py(v, sub_bits=sub_bits)
            assert got[i] == want, (sub_bits, v, got[i], want)


def test_radix_bucket_py_exactly_monotone():
    """Sorting by value must sort the mirror's bucket ids (weakly):
    the monotonicity the kernels' global-position arithmetic needs."""
    vals = sorted(_ADVERSARIAL)
    ids = [radix_bucket_py(v) for v in vals]
    for a, b in zip(ids, ids[1:]):
        assert a <= b, (vals, ids)
    # ±0.0 collapse (they compare equal, so they MUST share a bucket)
    assert radix_bucket_py(0.0) == radix_bucket_py(-0.0) == 0


@given(
    values=st.lists(
        st.floats(allow_nan=False, allow_infinity=False,
                  allow_subnormal=True),
        min_size=2, max_size=60,
    ),
    sub_bits=st.sampled_from([0, 2, 3, 5]),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_radix_bucket_hypothesis_monotone_and_spark_parity(spark, values,
                                                           sub_bits):
    """For arbitrary finite doubles (subnormals included): Spark expr ==
    mirror on every value, and bucket order == value order."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "i: int, v: double"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select(
            "i", radix_bucket("v", sub_bits=sub_bits).alias("b")
        ).collect()
    }
    for i, v in enumerate(values):
        assert got[i] == radix_bucket_py(float(v), sub_bits=sub_bits), v
    pairs = sorted((float(v), got[i]) for i, v in enumerate(values))
    for (va, ba), (vb, bb) in zip(pairs, pairs[1:]):
        assert ba <= bb or va == vb, (va, vb, ba, bb)


def test_exact_quantile_on_adversarial_doubles(spark):
    """End-to-end: the radix-bucketed selection kernel must reproduce
    Spark's holistic percentile() on a column of adversarial doubles —
    denormals, negatives, powers of two, ±0.0 — for every quartile.
    (The bench-facing oracle queries cover realistic data; this covers
    the IEEE-754 corners the fixtures never hit.)"""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.selection import (
        exact_quantiles,
    )

    rows = [("a", v) for v in _ADVERSARIAL] + [("b", -7.25), ("c", 0.0)]
    df = spark.createDataFrame(rows, "col: string, v: double")
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    got = exact_quantiles(df, "col", "v", qs)
    for q in qs:
        want = {
            r["col"]: r["p"]
            for r in df.groupBy("col")
            .agg(F.expr(f"percentile(v, {q})").alias("p"))
            .collect()
        }
        for k in want:
            assert got[k][q] == want[k] or math.isclose(
                got[k][q], want[k], rel_tol=1e-15, abs_tol=5e-324
            ), (k, q, got[k][q], want[k])
