"""Exact order-preserving value bucketing with ZERO probe passes.

The bucketed kernels (``operators/selection``, ``operators/prefix``)
need a pure function value → bucket that is (a) exactly monotone —
every value in bucket i sorts ≤ every value in bucket j>i, so
cumulative bucket counts are exact global positions — and (b) a
deterministic function of the value alone, so equal values share a
bucket and two passes over the same data agree without coordination.

Until r15 the kernels derived boundaries from a probe pass
(``approxQuantile`` sketch or a min/max aggregate feeding
``width_bucket``): one extra full scan + one extra Spark action per
kernel call, and at fixture scale the extra action's driver
planning/scheduling floor (~0.03–0.3 s) dominates the pass itself.
This module replaces the probe with IEEE-754 radix bucketing — the
bucket is the value's binary EXPONENT plus the top ``sub_bits``
mantissa bits, sign-folded so the bucket order is the numeric order:

    v < 0  →  -(offset + mag(|v|))   (larger magnitude → smaller id)
    v = 0  →  0                      (±0.0 collapse — they compare equal)
    v > 0  →  +(offset + mag(v))

    mag(x) = floor(log2 x) · 2^sub_bits + floor((x / 2^floor(log2 x) - 1)
                                                · 2^sub_bits)

Exactness argument (the hash-oracle requirement — these kernels feed
bit-hashed queries): ``floor(log2 x)`` from libm can be off by one near
powers of two, so it is CORRECTED with exact power-of-two comparisons
(``pow(2, e)`` is exact for any representable 2^e, and the one-step
correction suffices because libm log error is ≪ 1). After that every
operation is exact IEEE-754 arithmetic: ``x / 2^e`` is an exact scale
(result in [1, 2), no mantissa bits lost), ``m - 1`` is exact by
Sterbenz's lemma (m ∈ [1, 2)), ``· 2^sub_bits`` is an exact scale, and
``floor`` of an exact value is exact. The bucket id is therefore a
deterministic, exactly monotone pure function of the double — the two
properties the kernels' correctness proofs need. Boundary placement
still only affects LOAD BALANCE, never results.

Balance posture, stated honestly: buckets are log-spaced — each covers
a 2^-sub_bits slice of one binary octave (≈ 9% relative width at the
default sub_bits=3), so any value distribution that is not concentrated
inside a single ~9%-relative-width interval splits across buckets. That
covers the kernels' production callers (prices, balances, cents,
latencies, 60-bit hash keys). A distribution clustered tighter than one
sub-bucket degrades parallelism (one big bucket), never correctness —
the same documented degradation the equal-width scheme had. Operators
whose order column is an arbitrary UNIQUE KEY with possibly tiny
relative spread (``operators/ids``, ``operators/packing`` — e.g. dense
ids 1_000_000..1_000_500 all share one sub-bucket) keep their
approxQuantile boundaries, which are balanced under ANY layout; for
them the probe pass is the contract, not overhead.

NaN/Inf are OUT OF CONTRACT (callers feed finite non-null doubles, as
before — the old probe schemes were equally undefined there).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: sub-bucket resolution: buckets per binary octave = 2 ** RADIX_SUB_BITS
RADIX_SUB_BITS = 3


def _offset(sub_bits: int) -> int:
    # |mag| < 1200 · 2^sub_bits (exponent range is [-1074, 1023]); the
    # offset keeps every positive-value bucket id > 0 and every
    # negative-value bucket id < 0, so sign groups never interleave.
    return 1200 << sub_bits


def radix_bucket(c, *, sub_bits: int = RADIX_SUB_BITS) -> Column:
    """Bucket id (int) of a finite double — exactly monotone in value.

    ``c``: a Column or column name."""
    v = (c if isinstance(c, Column) else F.col(c)).cast("double")
    av = F.abs(v)
    scale = 1 << sub_bits
    e0 = F.floor(F.log2(av))  # libm estimate, may be off by one
    p = F.pow(F.lit(2.0), e0.cast("double"))  # exact power of two
    e = (
        F.when(av < p, e0 - 1)
        .when(av >= p * 2, e0 + 1)
        .otherwise(e0)
    )
    m = av / F.pow(F.lit(2.0), e.cast("double"))  # exact scale, ∈ [1, 2)
    sub = F.floor((m - 1) * scale)  # exact (Sterbenz + pow-2 scale)
    mag = e * scale + sub + _offset(sub_bits)
    return (
        F.when(v == 0, F.lit(0)).when(v > 0, mag).otherwise(-mag)
    ).cast("int")


def radix_bucket_py(x: float, *, sub_bits: int = RADIX_SUB_BITS) -> int:
    """Driver-side mirror of :func:`radix_bucket` (tests, sanity checks).

    Uses ``math.frexp`` — exact by construction — so a property test can
    assert the Spark expression (libm log2 + correction) lands every
    adversarial double (denormals, powers of two, ±0.0, negatives) in
    the same bucket.
    """
    import math

    v = float(x)
    if v == 0.0:
        return 0
    av = abs(v)
    mant, ex = math.frexp(av)  # av = mant · 2^ex, mant ∈ [0.5, 1)
    e = ex - 1  # = floor(log2(av)), exactly
    m = mant * 2.0  # = av / 2^e, exact, ∈ [1, 2)
    scale = 1 << sub_bits
    mag = e * scale + int((m - 1.0) * scale) + _offset(sub_bits)
    return mag if v > 0 else -mag
