"""Local replica of the driver's per-round correctness pass.

Runs the first N rotation slots (or an explicit qid list) exactly the
way the driver does — ``__spark_entry__.queries()`` order, rows +
schema + order-insensitive value-hash vs the registered DuckDB oracle
at sf0.01 — so a round's rotation can be proven green BEFORE the
driver stamps CORRECTNESS_r{N}.json.

Usage:
    python tools/driver_replica.py                 # first 50 slots
    python tools/driver_replica.py 80              # first 80 slots
    python tools/driver_replica.py qid1 qid2 ...   # named ids
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as em

    from tests.oracle_harness import compare, duck_connect
    from vector_search_playground_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs, oracles = em.queries(), em.oracle_sql()
    args = sys.argv[1:]
    if args and all(a in qs for a in args):
        slots = args
    else:
        n = int(args[0]) if args else 50
        slots = list(qs)[:n]

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf)
    bad: list[str] = []
    for i, qid in enumerate(slots):
        t0 = time.perf_counter()
        try:
            df = qs[qid](spark, sf)
            if qid in oracles:
                compare(df, con, oracles[qid], qid)
                status = "hash-pass"
            else:
                n_rows = df.count()
                assert n_rows >= 0
                status = f"rows-only ({n_rows})"
        except Exception as exc:
            status = f"FAIL: {exc}"
            bad.append(qid)
            traceback.print_exc()
        print(
            f"[{i + 1}/{len(slots)}] {qid}: {status} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print("FAILED:", bad)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
