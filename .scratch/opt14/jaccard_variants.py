"""In-session interleaved A/B of jaccard_join strategy variants.

One Spark session; per round, each variant is monkeypatched into
operators.setjoin and the three consumer queries run once. Same-session
interleaving cancels the host drift that poisoned cross-process A/Bs.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def make_jaccard_join(cand_hint, verify_hint, do_persist):
    def jaccard_join(shingled, threshold, *, round_to=6):
        if do_persist:
            shingled = shingled.persist()
        ex = shingled.select(
            "doc_id", F.size("shingles").alias("n"),
            F.explode_outer("shingles").alias("shingle"),
        ).where(F.col("shingle").isNotNull())
        freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
        EPS = 1e-9
        w = Window.partitionBy("doc_id").orderBy("freq", "shingle")
        prefix_len = (
            F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - EPS) + 1
        )
        prefixes = (
            ex.join(F.broadcast(freq), "shingle")
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= prefix_len)
            .select("doc_id", "n", "rk", "shingle")
        )
        if do_persist:
            prefixes = prefixes.persist()
        a = prefixes.select(
            F.col("doc_id").alias("a_id"), F.col("n").alias("an"),
            F.col("rk").alias("ark"), "shingle",
        )
        b = prefixes.select(
            F.col("doc_id").alias("b_id"), F.col("n").alias("bn"),
            F.col("rk").alias("brk"), "shingle",
        )
        required = F.ceil(
            F.lit(threshold / (1.0 + threshold)) * (F.col("an") + F.col("bn"))
            - EPS
        )
        overlap_ub = (
            F.least(F.col("an") - F.col("ark"), F.col("bn") - F.col("brk")) + 1
        )
        if cand_hint:
            a, b = a.hint(cand_hint), b.hint(cand_hint)
        cand = (
            a.join(b, "shingle")
            .where(
                (F.col("a_id") < F.col("b_id"))
                & (F.col("an") >= F.ceil(F.lit(threshold) * F.col("bn") - EPS))
                & (F.col("bn") >= F.ceil(F.lit(threshold) * F.col("an") - EPS))
                & (overlap_ub >= required)
            )
            .select("a_id", "b_id")
            .distinct()
        )
        sa = shingled.select(F.col("doc_id").alias("a_id"),
                             F.col("shingles").alias("a_sh"))
        sb = shingled.select(F.col("doc_id").alias("b_id"),
                             F.col("shingles").alias("b_sh"))
        if verify_hint:
            sa, sb = sa.hint(verify_hint), sb.hint(verify_hint)
        inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        union = (
            F.size("a_sh") + F.size("b_sh")
            - F.size(F.array_intersect("a_sh", "b_sh"))
        )
        return (
            cand.join(sa, "a_id")
            .join(sb, "b_id")
            .withColumn("jaccard", inter / union)
            .where(F.col("jaccard") >= threshold)
            .select("a_id", "b_id",
                    F.round("jaccard", round_to).alias("jaccard"))
        )

    return jaccard_join


VARIANTS = {
    "cur(sh+sh+persist)": make_jaccard_join("shuffle_hash", "shuffle_hash", True),
    "cand-only-hint": make_jaccard_join("shuffle_hash", None, True),
    "no-hints+persist": make_jaccard_join(None, None, True),
    "orig(no-hint,no-persist)": make_jaccard_join(None, None, False),
}

QIDS = ["dedup_paragraph", "dedup_ngram", "doc_dup_fraction"]


def main() -> int:
    from vector_search_playground_spark import registry
    from vector_search_playground_spark.operators import setjoin
    from vector_search_playground_spark.session import get_spark

    spark = get_spark(app_name="jaccard-ab", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    registry.QUERIES["knn_search"](spark, "/root/testdata/sf0.001").collect()
    sf = "/root/testdata/sf0.1"
    results: dict[tuple[str, str], list[float]] = {}
    orig = setjoin.jaccard_join
    # warm every variant once (codegen), untimed
    for name, fn in VARIANTS.items():
        setjoin.jaccard_join = fn
        registry.QUERIES["dedup_paragraph"](spark, sf).write.format(
            "noop").mode("overwrite").save()
        spark.catalog.clearCache()
    for rnd in range(4):
        for name, fn in VARIANTS.items():
            setjoin.jaccard_join = fn
            for qid in QIDS:
                t0 = time.perf_counter()
                registry.QUERIES[qid](spark, sf).write.format(
                    "noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                spark.catalog.clearCache()
                results.setdefault((name, qid), []).append(dt)
    setjoin.jaccard_join = orig
    print(f"{'variant':26s} {'query':18s} {'min':>6} runs")
    for (name, qid), runs in results.items():
        print(f"{name:26s} {qid:18s} {min(runs):6.3f} "
              f"{[round(r, 2) for r in runs]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
