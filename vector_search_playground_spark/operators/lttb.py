"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, public
MSc thesis / timescaledb-toolkit ``lttb``): reduce each series to N
visually-representative points — the downsampler charting frontends use,
preserving spikes that bucket averages flatten.

Algorithm (exact, per series): keep the first and last points; split the
interior into N-2 equal-count buckets; walking left→right, pick from each
bucket the point forming the LARGEST TRIANGLE with the previously picked
point and the NEXT bucket's centroid.

Spark mapping: one shuffle on the series key, then the greedy walk runs
as a vectorized numpy kernel per group inside ``applyInPandas`` (the
walk is inherently sequential in its bucket loop — N_OUT iterations over
array slices, not per-row Python). Per-task state is one series; at
100 TB you key by (series, time_chunk) so each chunk downsamples
independently — same kernel, bounded memory either way.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def lttb_downsample(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    t_col: str = "ts_us",
    v_col: str = "value",
    n_out: int = 20,
) -> DataFrame:
    """(key, t, v, bucket) — ≤ ``n_out`` LTTB-selected points per series,
    deterministic (first-index tiebreak on equal areas via argmax)."""
    schema = f"{key_col} long, {t_col} long, {v_col} double, bucket int"

    def one_series(pdf: "pd.DataFrame"):
        import numpy as np

        pdf = pdf.sort_values([t_col]).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            out = pdf[[key_col, t_col, v_col]].copy()
            out["bucket"] = np.arange(n, dtype=np.int32)
            return out
        t = pdf[t_col].to_numpy(dtype=np.float64)
        v = pdf[v_col].to_numpy(dtype=np.float64)
        # n_out-2 interior buckets over indices [1, n-1)
        edges = 1 + np.floor(
            np.arange(n_out - 1, dtype=np.float64) * (n - 2) / (n_out - 2)
        ).astype(np.int64)
        picked = [0]
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            if b + 2 <= n_out - 2:
                nlo, nhi = edges[b + 1], edges[b + 2]
            else:
                nlo, nhi = n - 1, n  # last anchor: the final point
            cx, cy = t[nlo:nhi].mean(), v[nlo:nhi].mean()
            ax, ay = t[picked[-1]], v[picked[-1]]
            # 2·triangle area for every candidate in the bucket
            area = np.abs(
                (ax - cx) * (v[lo:hi] - ay) - (ax - t[lo:hi]) * (cy - ay)
            )
            picked.append(lo + int(area.argmax()))
        picked.append(n - 1)
        idx = np.array(picked)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy()[idx],
                t_col: pdf[t_col].to_numpy()[idx],
                v_col: v[idx],
                "bucket": np.arange(len(idx), dtype=np.int32),
            }
        )

    def per_partition(batches):
        # ONE Python call per task, not per series: the grouped-map API
        # pays a pandas round-trip for every group (thousands of tiny
        # series → call-overhead-bound); here each task concatenates its
        # partition's Arrow batches once and walks its series with a
        # local groupby. Partition = all rows of its series (hash
        # repartition below); at 100 TB key by (series, time_chunk) so
        # per-task state stays bounded.
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        yield pd.concat(
            [one_series(g) for _, g in pdf.groupby(key_col, sort=False)],
            ignore_index=True,
        )

    src = df.select(key_col, t_col, v_col)
    p = df.sparkSession.sparkContext.defaultParallelism
    return src.repartition(p, key_col).mapInPandas(per_partition, schema)


def lttb_downsample_quantized(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    t_col: str = "ts_us",
    v_col: str = "value",
    n_out: int = 20,
    t_unit: int = 1_000_000,
    v_scale: int = 100,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Exact-integer LTTB — the hash-certifiable variant (round-8
    graduation, the topk_diverse discipline: quantize the space so the
    greedy's argmax keys are exact integers, then the same algorithm is
    replicable as unrolled SQL with zero float knife-edges).

    ``tiebreak_col`` pins the point ORDER under duplicate timestamps
    (the repo-wide full-tiebreak discipline: epoch µs then event id) —
    without it, pandas' stable sort would preserve shuffle arrival
    order while the oracle's ROW_NUMBER breaks ties arbitrarily, and
    the certification could flap on correct code the first time a
    fixture carries a duplicate (key, ts) pair.

    Quantization defines the query's own semantics: per series, time is
    rebased to the series start and floored to ``t_unit`` ticks
    (seconds), values to half-up ``v_scale`` units (cents — the shared
    floor(x·k+0.5) convention). Triangle areas then use the
    centroid-times-m identity |(aₜ·m−Σt)(v−aᵥ) − (aₜ−t)(Σv−aᵥ·m)| —
    multiplying through by the next-bucket count m keeps everything in
    int64 (bounded by span/t_unit · v·v_scale · m ≈ 1e12 here) with the
    argmax unchanged. Ties pick the earliest point, matching the SQL's
    ORDER BY area DESC, i ASC.

    Output: (key, bucket, t_raw, v_q) — bucket is the selection ordinal,
    t_raw the picked point's ORIGINAL timestamp (integer, carried
    through), v_q the quantized value.
    """
    schema = f"{key_col} long, bucket int, {t_col} long, v_q long"
    n_interior = n_out - 2
    sort_cols = [t_col] + ([tiebreak_col] if tiebreak_col else [])

    def one_series(pdf: "pd.DataFrame"):
        import numpy as np

        pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
        n = len(pdf)
        t_raw = pdf[t_col].to_numpy(dtype=np.int64)
        t = (t_raw - t_raw.min()) // t_unit
        v = np.floor(
            pdf[v_col].to_numpy(dtype=np.float64) * v_scale + 0.5
        ).astype(np.int64)
        key = pdf[key_col].to_numpy()
        if n <= n_out:
            return pd.DataFrame(
                {
                    key_col: key,
                    "bucket": np.arange(n, dtype=np.int32),
                    t_col: t_raw,
                    "v_q": v,
                }
            )
        edges = 1 + (
            np.arange(n_out - 1, dtype=np.int64) * (n - 2)
        ) // n_interior
        picked = [0]
        for b in range(n_interior):
            lo, hi = edges[b], edges[b + 1]
            if b + 2 <= n_interior:
                nlo, nhi = edges[b + 1], edges[b + 2]
            else:
                nlo, nhi = n - 1, n
            m = int(nhi - nlo)
            st = int(t[nlo:nhi].sum())
            sv = int(v[nlo:nhi].sum())
            at, av = int(t[picked[-1]]), int(v[picked[-1]])
            area = np.abs(
                (at * m - st) * (v[lo:hi] - av)
                - (at - t[lo:hi]) * (sv - av * m)
            )
            picked.append(int(lo) + int(area.argmax()))
        picked.append(n - 1)
        idx = np.array(picked)
        return pd.DataFrame(
            {
                key_col: key[idx],
                "bucket": np.arange(len(idx), dtype=np.int32),
                t_col: t_raw[idx],
                "v_q": v[idx],
            }
        )

    def per_partition(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        yield pd.concat(
            [one_series(g) for _, g in pdf.groupby(key_col, sort=False)],
            ignore_index=True,
        )

    cols = [key_col, t_col, v_col] + ([tiebreak_col] if tiebreak_col else [])
    src = df.select(*cols)
    p = df.sparkSession.sparkContext.defaultParallelism
    return src.repartition(p, key_col).mapInPandas(per_partition, schema)
