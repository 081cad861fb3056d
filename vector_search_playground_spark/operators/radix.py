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

    ``c``: a Column or column name.

    BRANCH-FREE on purpose (r15 profiling): codegen's common-
    subexpression elimination skips anything nested inside CASE WHEN
    branches, so an earlier when/otherwise formulation re-evaluated the
    log2/pow tree ~6× per row (measured 0.9 µs/row; this form runs one
    log2 + two pows, and every subterm is CSE-eligible). The zero case
    is folded arithmetically: ``av = abs(v) + (v = 0)`` makes v = 0
    flow through as av = 1 → mag = offset, and ``signum(v) · mag``
    collapses it to bucket 0 (±0.0 both give signum 0); sign folding by
    multiplication is exact because |mag| < 2^20 ≪ 2^53."""
    v = (c if isinstance(c, Column) else F.col(c)).cast("double")
    scale = 1 << sub_bits
    # v = 0 would make log2 NULL; feed it av = 1 instead (bucket killed
    # by signum below). The cast-of-predicate forms stay branch-free.
    av = F.abs(v) + (v == 0.0).cast("double")
    e0 = F.floor(F.log2(av))  # libm estimate, may be off by one
    p = F.pow(F.lit(2.0), e0.cast("double"))  # exact power of two
    # one-step correction, arithmetic not conditional: lt/ge ∈ {0, 1}
    # and are mutually exclusive (libm log error ≪ 1). p can under/
    # overflow only when e0 is already off by one at the extreme ends,
    # where lt/ge still correct it (av < 0.0 is false, av >= inf is
    # false), so e is always the true floor(log2(av)) ∈ [-1074, 1023].
    lt = (av < p).cast("bigint")
    ge = (av >= p + p).cast("bigint")
    e = e0 - lt + ge
    m = av / F.pow(F.lit(2.0), e.cast("double"))  # exact scale, ∈ [1, 2)
    sub = F.floor((m - 1) * scale)  # exact (Sterbenz + pow-2 scale)
    mag = e * scale + sub + _offset(sub_bits)
    return (F.signum(v) * mag).cast("int")


def bucket_bounds_py(
    b: int, *, sub_bits: int = RADIX_SUB_BITS
) -> tuple[float, float]:
    """Exact value range of bucket ``b``: the half-open double interval
    ``[lo, hi)`` with {finite v : lo <= v < hi} == {v : bucket(v) == b}.

    Lets a consumer that already KNOWS which buckets it needs (from a
    histogram pass) select their rows with two plain double compares —
    no log2/pow re-evaluation in the second pass (r15: the fat radix
    tree in pass-2 plans was recompiled by janino on every kernel call,
    ~0.5 s/call). The closed-form boundary ``2^e·(1 + sub/2^sub_bits)``
    rounds when the result is subnormal, so both edges are CORRECTED
    against the exact mirror with a nextafter walk (≤ a few ulps).

    ``b`` must be an id the bucket function can produce (e.g. taken
    from an observed histogram); 0 returns the ±0.0 singleton range.
    """
    import math

    scale = 1 << sub_bits
    off = _offset(sub_bits)

    def _ldexp_inf(m: float, e: int) -> float:
        try:
            return math.ldexp(m, e)
        except OverflowError:
            return math.inf

    def _pos_edges(mag: int) -> tuple[float, float]:
        # positive-magnitude bucket: candidate [lo, hi) then correct
        t = mag - off
        e = t // scale
        sub = t - e * scale
        lo = _ldexp_inf(1.0 + sub / scale, e)
        hi = (
            _ldexp_inf(1.0 + (sub + 1) / scale, e)
            if sub + 1 < scale
            else _ldexp_inf(1.0, e + 1)
        )
        big = math.inf
        while lo > 0.0 and radix_bucket_py(
            math.nextafter(lo, 0.0), sub_bits=sub_bits
        ) >= mag:
            lo = math.nextafter(lo, 0.0)
        while radix_bucket_py(lo, sub_bits=sub_bits) < mag:
            lo = math.nextafter(lo, big)
        while hi < big and radix_bucket_py(
            math.nextafter(hi, 0.0), sub_bits=sub_bits
        ) > mag:
            hi = math.nextafter(hi, 0.0)
        while hi < big and radix_bucket_py(hi, sub_bits=sub_bits) <= mag:
            hi = math.nextafter(hi, big)
        return lo, hi

    if b == 0:
        return 0.0, 5e-324  # {±0.0}: the next double up is min subnormal
    if b > 0:
        return _pos_edges(b)
    # negative bucket: |v| in [lo_a, hi_a)  ⇔  v in (-hi_a, -lo_a]
    lo_a, hi_a = _pos_edges(-b)
    lo = math.nextafter(-hi_a, math.inf) if hi_a != math.inf else -math.inf
    hi = math.nextafter(-lo_a, math.inf)
    return lo, hi


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
