"""Bucketed two-pass prefix sums over an ordered relation — the
scale-safe replacement for ``sum(...) OVER (ORDER BY ...)`` global
windows, which plan as a single-partition whale.

Pass 1 buckets rows by an exactly monotone radix function of the order
column (``operators/radix`` — binary exponent plus top mantissa bits,
sign-folded) and aggregates per-bucket (count, weight-sum) partials;
the driver prefixes the observed-bucket partials (metadata). Pass 2
runs the rank/cumsum window WITHIN each bucket and adds the bucket's
offset. Used by ``revenue_concentration`` (Pareto crossing),
``weighted_median`` (weighted selection), ``ks_2sample`` /
``mannwhitney_u`` (rank statistics); same discipline as
operators/packing.py's sequence packing.

r15: until r14 pass 1 derived equi-depth boundaries from an
``approxQuantile`` probe — one extra full scan + one extra Spark
action per kernel call (at fixture scale the extra action's driver
floor dominates the pass itself). Radix bucketing removes the probe:
the bucket is a pure function of the value, so the partials pass and
the window pass agree without coordination, and cumulative counts
over the ASCENDING observed bucket ids are exact global positions.
The trade, stated honestly: buckets are log-spaced (2^-sub_bits slices
of each binary octave, ≈9 % relative width at sub_bits=3) instead of
equi-depth, so a distribution concentrated inside ONE sub-bucket's
width degrades pass 2's parallelism (one big window partition), never
correctness — the callers order by prices/cents/counts/latencies,
which span many octaves. Operators whose order column is an arbitrary
unique key with possibly tiny relative spread (``operators/ids``,
``operators/packing``) keep their approxQuantile boundaries, which
are balanced under ANY layout; for them the probe is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_playground_spark.operators.radix import (
    RADIX_SUB_BITS,
    radix_bucket,
)


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    *,
    tiebreak_col: str,
    descending: bool = False,
    sub_bits: int = RADIX_SUB_BITS,
) -> tuple[DataFrame, int, int]:
    """(df + [rk, cum], n_rows, total_weight).

    ``rk`` = 1-based rank in (order_col, tiebreak_col) order;
    ``cum`` = inclusive running sum of ``weight_col`` in that order.
    Weights must be integral (cast to long) so ``cum`` is exact int64 —
    threshold tests downstream stay knife-edge-free. Order values must
    be non-null finite doubles (callers' existing contract).

    The input is scanned by BOTH passes (partials, then the
    within-bucket window): callers should ``.cache()`` ``df`` around
    the call and unpersist after consuming the result.
    """
    bucketed = df.withColumn(
        "__bkt", radix_bucket(F.col(order_col), sub_bits=sub_bits)
    )
    parts = {
        r["__bkt"]: (r["n"], r["s"])
        for r in bucketed.groupBy("__bkt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(weight_col).cast("long")).alias("s"),
        )
        .collect()
    }
    n_rows = sum(n for n, _ in parts.values())
    total = sum(s for _, s in parts.values())
    # offsets from cumulative partials over the observed buckets in
    # walk order (radix ids are monotone in value; every pass-2 row's
    # bucket was observed in pass 1 — same pure function, same rows)
    walk = sorted(parts, reverse=descending)
    off_n, off_s, cn, cs = {}, {}, 0, 0
    for b in walk:
        off_n[b], off_s[b] = cn, cs
        n, s = parts[b]
        cn, cs = cn + n, cs + s
    map_n = F.create_map(*[F.lit(x) for b in walk for x in (b, off_n[b])])
    map_s = F.create_map(*[F.lit(x) for b in walk for x in (b, off_s[b])])
    order = (
        [F.desc(order_col), F.asc(tiebreak_col)]
        if descending
        else [F.asc(order_col), F.asc(tiebreak_col)]
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed.withColumn(
        "rk", map_n[F.col("__bkt")] + F.count(F.lit(1)).over(w)
    ).withColumn(
        "cum",
        map_s[F.col("__bkt")] + F.sum(F.col(weight_col).cast("long")).over(w),
    )
    return out, n_rows, total


def grouped_bucketed_rank(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    *,
    tiebreak_col: str,
    sub_bits: int = RADIX_SUB_BITS,
    max_partials: int = 65536,
) -> DataFrame:
    """df + [``rk`` (1-based exact rank within its group by
    (order_col asc, tiebreak_col asc)), ``grp_n`` (group row count)] —
    the scale-safe replacement for ``row_number() OVER (PARTITION BY
    low_card_key ORDER BY ...)``, which sorts corpus/|groups| rows on
    ONE task (a whale wearing a hash exchange: the SinglePartition plan
    gate can't see it because the exchange looks partitioned).

    Same discipline as ``bucketed_cumsum``, grouped: the radix bucket
    function splits every row; ONE hash-agg counts (group, bucket)
    partials; the driver prefixes the |groups|·|observed buckets|
    partials per group (metadata — callers must have LOW-cardinality
    groups, which is exactly the whale case) and broadcast-joins the
    offsets back; the rank window then runs within (group, bucket).
    Equal order values never straddle buckets (bucketing is a pure
    function of the value), so the (order, tiebreak) window order
    within a bucket completes a total order. ``order_col`` must be
    non-null (a null value radix-buckets to NULL — no stated ordering
    contract), and ``group_cols`` values must be non-null too: the
    offsets come back through an inner equi-join, and SQL equality
    never matches NULL = NULL — a null-keyed group would silently drop
    its rows where the ``row_number()`` window it replaces would rank
    the null partition. Both contracts are ENFORCED (raise, not silent
    wrong answers) from the collected partials: the partials hash-agg
    carries a per-(group, bucket) null-order count alongside the row
    count, so the check costs no extra pass.

    The |groups|·|buckets| partials are driver-collected and broadcast
    back — the low-cardinality-group contract in numbers: the collect is
    bounded by ``max_partials`` (default 65536 ≈ 1k groups at ~64
    observed buckets) and exceeding it raises instead of quietly
    OOMing the driver.

    Parallelism bound, stated honestly: ties are indivisible under
    value bucketing — a group whose order values are heavily repeated
    parallelizes only up to its |distinct values| (the all-equal
    degenerate case collapses that group to one bucket and ranks it
    sequentially — still CORRECT, just serial, which is what any
    sort-based split does with an indivisible tie run). The production
    callers order by near-continuous columns (prices, cents, 60-bit
    hash keys) where tie runs are tiny.

    The input is scanned by both passes (partials, rank window):
    callers should ``.cache()`` ``df`` around the call.
    """
    bucketed = df.withColumn(
        "__bkt", radix_bucket(F.col(order_col), sub_bits=sub_bits)
    )
    parts = (
        bucketed.groupBy(*group_cols, "__bkt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(F.col(order_col).isNull(), 1)).alias("__nulls"),
        )
        .limit(max_partials + 1)
        .collect()
    )
    if len(parts) > max_partials:
        raise ValueError(
            f"grouped_bucketed_rank: >{max_partials} (group, bucket) "
            "partials — the group key is not low-cardinality, so the "
            "driver-side offset table would not be metadata-sized. "
            "Use a plain partitioned window (high-cardinality keys "
            "parallelize on their own) or raise max_partials knowingly."
        )
    if any(r["__nulls"] for r in parts):
        raise ValueError(
            "grouped_bucketed_rank: NULL order-column value — a null "
            "radix-buckets to NULL rather than by a stated ordering "
            "contract. Filter or coalesce "
            f"{order_col!r} first."
        )
    per_group: dict[tuple, dict[int, int]] = {}
    for r in parts:
        g = tuple(r[c] for c in group_cols)
        if any(v is None for v in g):
            raise ValueError(
                "grouped_bucketed_rank: NULL group key — the offsets "
                "rejoin on group equality and NULL never equals NULL, "
                "so null-keyed rows would be silently dropped. Filter "
                "or coalesce the group columns first."
            )
        per_group.setdefault(g, {})[r["__bkt"]] = r["__n"]
    rows = []
    for g, buckets in per_group.items():
        total = sum(buckets.values())
        off = 0
        for b in sorted(buckets):
            rows.append((*g, b, off, total))
            off += buckets[b]
    schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField("__bkt", T.IntegerType(), False),
            T.StructField("__off", T.LongType(), False),
            T.StructField("grp_n", T.LongType(), False),
        ]
    )
    offsets = df.sparkSession.createDataFrame(rows, schema)
    w = (
        Window.partitionBy(*group_cols, "__bkt")
        .orderBy(F.asc(order_col), F.asc(tiebreak_col))
    )
    return (
        bucketed.join(F.broadcast(offsets), [*group_cols, "__bkt"])
        .withColumn("rk", F.col("__off") + F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .drop("__bkt", "__off")
    )
