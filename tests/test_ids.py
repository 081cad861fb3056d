"""dense_ids: correct dense ranks under any distribution, balanced buckets
under skew (the ADVICE r02 degenerate case: equal-width bucketing collapses
clustered keys into one bucket and re-creates the single-partition window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.operators.ids import dense_ids


def _check_ranks(df, order_col):
    rows = dense_ids(df, order_col).collect()
    by_value = sorted(rows, key=lambda r: r[order_col])
    assert [r["rid"] for r in by_value] == list(range(len(rows)))


def test_dense_ids_uniform(spark):
    df = spark.range(1000).select((F.col("id") * 7 % 9973).alias("k"))
    _check_ranks(df, "k")


def test_dense_ids_skewed_cluster_with_outliers(spark):
    """999 keys in [0, 999) and one at 10**12: equal-width buckets put
    everything in bucket 0; quantile boundaries must still spread the
    cluster across many buckets AND produce correct ranks."""
    vals = list(range(999)) + [10**12]
    df = spark.createDataFrame([(v,) for v in vals], "k: long")
    _check_ranks(df, "k")

    # white-box: the quantile boundaries must split the cluster into many
    # groups — equal-width bucketing gives max-bucket ≈ n, the failure this
    # operator guards against
    bounds = sorted(set(
        df.select(F.col("k").cast("double").alias("__v"))
        .approxQuantile("__v", [i / 64 for i in range(1, 64)], 1.0 / 256)
    ))
    import bisect

    sizes: dict[int, int] = {}
    for v in vals:
        b = bisect.bisect_right(bounds, v)
        sizes[b] = sizes.get(b, 0) + 1
    assert max(sizes.values()) < 100, sizes  # no bucket swallows the corpus
    assert len(sizes) > 30, sizes


def test_dense_ids_empty(spark):
    df = spark.createDataFrame([], "k: long")
    out = dense_ids(df, "k")
    assert out.count() == 0
    assert "rid" in out.columns


def test_dense_ids_all_equal_heavy_duplication(spark):
    """Degenerate boundary case: constant-ish columns must not crash even
    though every quantile collapses to the same value (note dense_ids
    documents a unique order column; near-constant inputs still rank)."""
    df = spark.createDataFrame([(i,) for i in range(100)], "k: long")
    _check_ranks(df.where(F.col("k") < 50), "k")


def test_atomic_build_loser_discards_and_serves_winner(tmp_path):
    """Two builders racing to the same fingerprint-keyed cache path must
    never interleave files: the second rename loses, discards its temp
    build, and the winner's artifact serves both (observed r9: a warm-up
    session and the suite both building lsh_index_sf0.001_* collided
    inside one directory via Spark's shared _temporary staging)."""
    import os

    from vector_search_playground_spark.sources import atomic_build

    path = str(tmp_path / "artifact")

    def build(marker):
        def write_to(p):
            os.makedirs(p)
            with open(os.path.join(p, "data"), "w") as fh:
                fh.write(marker)
        return write_to

    atomic_build(build("winner"), path)
    atomic_build(build("loser"), path)  # rename fails -> discarded
    assert open(os.path.join(path, "data")).read() == "winner"
    leftovers = [f for f in os.listdir(tmp_path) if ".build-" in f]
    assert not leftovers, leftovers


def test_atomic_build_overwrite_replaces_existing(tmp_path):
    """Rebuild semantics (ADVICE r9 high): with overwrite=True a build
    to an occupied path must REPLACE the artifact, not silently keep
    the stale one — the r9 bug served an index built from a different
    corpus while returning fresh centroids."""
    import os

    from vector_search_playground_spark.sources import atomic_build

    path = str(tmp_path / "artifact")

    def build(marker):
        def write_to(p):
            os.makedirs(p)
            with open(os.path.join(p, "data"), "w") as fh:
                fh.write(marker)
        return write_to

    atomic_build(build("stale"), path)
    atomic_build(build("fresh"), path, overwrite=True)
    assert open(os.path.join(path, "data")).read() == "fresh"
    leftovers = [
        f for f in os.listdir(tmp_path)
        if ".build-" in f or ".old-" in f
    ]
    assert not leftovers, leftovers


def test_atomic_build_overwrite_race_loser_serves_winner(
    tmp_path, monkeypatch
):
    """Two overwrite rebuilds racing at the same fingerprint-keyed path:
    the loser (whose commit rename finds the destination re-occupied by
    the winner's finished artifact) must keep the winner's build, clean
    up both its temp build and the copy it displaced, and return —
    same-key rebuilds are byte-equivalent, so raising would turn a
    benign race into a flake."""
    import os

    from vector_search_playground_spark.sources import atomic_build

    path = str(tmp_path / "artifact")

    def build(marker):
        def write_to(p):
            os.makedirs(p)
            with open(os.path.join(p, "data"), "w") as fh:
                fh.write(marker)
        return write_to

    atomic_build(build("v1"), path)

    real_rename = os.rename
    state = {"n": 0}

    def racing_rename(src, dst):
        state["n"] += 1
        if state["n"] == 2:
            # between the loser's displace (call 1) and its commit
            # (call 2), the winner lands its artifact at the path
            os.makedirs(dst)
            with open(os.path.join(dst, "data"), "w") as fh:
                fh.write("winner")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", racing_rename)
    atomic_build(build("loser"), path, overwrite=True)  # must not raise
    monkeypatch.undo()

    assert open(os.path.join(path, "data")).read() == "winner"
    leftovers = [
        f for f in os.listdir(tmp_path)
        if ".build-" in f or ".old-" in f
    ]
    assert not leftovers, leftovers


def test_atomic_build_genuine_rename_failure_raises(tmp_path):
    """A rename that fails for any reason OTHER than a complete artifact
    already occupying the destination must re-raise, not silently
    discard the finished build (ADVICE r9 medium). Here the destination
    is a stale regular FILE — no complete directory artifact exists, so
    swallowing the error would leave a wrong path that only surfaces
    later as a read failure."""
    import os

    import pytest

    from vector_search_playground_spark.sources import atomic_build

    path = str(tmp_path / "artifact")
    with open(path, "w") as fh:
        fh.write("stale file, not a directory")

    def write_to(p):
        os.makedirs(p)
        with open(os.path.join(p, "data"), "w") as fh:
            fh.write("built")

    with pytest.raises(OSError):
        atomic_build(write_to, path)
    # the finished-but-undeliverable temp build must not linger
    leftovers = [f for f in os.listdir(tmp_path) if ".build-" in f]
    assert not leftovers, leftovers
