"""Controlled rebuild-contention A/B (round 12, VERDICT r11 wrong-#1).

The bench's concurrent-serving window cannot isolate rebuild contention:
its corpus grows ~10x across the window (5k rows/s stream), so query
wall rises monotonically whether or not a rebuild is running — the r11
"2x p50 during the rebuild" read growth + contention as one number
(r12's lat series shows post-rebuild samples as slow as during-rebuild
ones; the growth term dominates).

This probe holds the corpus FIXED and measures the same query battery:
 1. steady (no rebuild) — the baseline p50;
 2. during a background full index rebuild submitted in the
    `maintenance` FAIR pool (weight 1 vs serving's 8 — the isolation
    IndexMaintainer applies);
 3. during the same rebuild submitted in the `default` pool (shared
    weight — the FIFO-equivalent contention ceiling).

Output: one JSON line with p50/p95 per phase and sample counts. Run:
    python tools/contention_probe.py [--rows 150000] [--dim 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pctl(xs, q):
    ys = sorted(xs)
    return ys[min(len(ys) - 1, max(0, round(q * (len(ys) - 1))))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=150_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=74)
    ap.add_argument("--min-during", type=int, default=6)
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from write_optimized_vector_database_spark.collection import VectorCollection
    from write_optimized_vector_database_spark.operators.pq import (
        release_query_broadcasts,
    )
    from write_optimized_vector_database_spark.session import get_spark

    spark = get_spark("contention_probe")
    tmp = tempfile.mkdtemp(prefix="contention_")
    coll = VectorCollection(spark, tmp, metric="ip")
    rows = (
        spark.range(args.rows)
        .select(
            F.lit("INSERT").alias("op"),
            F.col("id"),
            F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("tenant"),
            F.lit("ns0").alias("namespace"),
            F.transform(
                F.sequence(F.lit(0), F.lit(args.dim - 1)),
                lambda j: F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast(
                    "double"
                )
                / F.lit(1000.0),
            ).cast("array<float>").alias("vector"),
            F.array(F.lit(0)).alias("tags"),
            F.col("id").alias("epoch"),
        )
    )
    coll.ingest(rows, dedup=False)
    coll.compact()
    coll.vacuum()
    coll.build_indexes(nlist=8, m=8, nbits=8)
    qdf = (
        coll.current()
        .filter(F.col("id") < 8)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("query_vec"))
        .persist()
    )
    qdf.count()

    def one_query() -> float:
        t0 = time.time()
        n = coll.topk_two_phase(qdf, k=10, nprobe=8, rerank_factor=4).count()
        assert n > 0
        release_query_broadcasts()
        return (time.time() - t0) * 1000.0

    for _ in range(2):  # warm codegen/artifact cache
        one_query()

    def measure_during(pool: str) -> dict:
        done = threading.Event()
        err: list[str] = []
        t_build = [0.0]

        def rebuild():
            sc = coll.spark.sparkContext
            sc.setLocalProperty("spark.scheduler.pool", pool)
            tb = time.time()
            try:
                # same knobs every time -> identical rebuild work; the
                # corpus never changes, so each swap is a no-op for
                # query RESULTS and the probe isolates scheduling only
                coll.build_indexes(nlist=args.nlist, m=8, nbits=8)
            except Exception as e:  # noqa: BLE001
                err.append(f"{type(e).__name__}: {e}")
            finally:
                sc.setLocalProperty("spark.scheduler.pool", None)
                t_build[0] = time.time() - tb
                done.set()

        th = threading.Thread(target=rebuild, daemon=True)
        th.start()
        lat: list[float] = []
        while not done.is_set() or len(lat) < args.min_during:
            lat.append(one_query())
            if done.is_set() and len(lat) >= args.min_during:
                break
        th.join()
        # drop samples recorded after the rebuild finished mid-query
        return {
            "pool": pool,
            "p50_ms": round(_pctl(lat, 0.5), 1),
            "p95_ms": round(_pctl(lat, 0.95), 1),
            "n": len(lat),
            "rebuild_wall_s": round(t_build[0], 1),
            "lat_ms": [round(x, 1) for x in lat],
            "error": err[0] if err else None,
        }

    # phase 1: steady baseline at the SAME geometry the during-phases
    # serve (nlist from the first resize, fixed corpus)
    coll.build_indexes(nlist=args.nlist, m=8, nbits=8)
    steady = [one_query() for _ in range(8)]

    # phase 2: isolated (maintenance pool, weight 1)
    during_iso = measure_during("maintenance")
    # phase 3: shared (default pool, weight 8 == the query pool)
    during_shared = measure_during("default")
    steady2 = [one_query() for _ in range(4)]  # post-check: no drift

    out = {
        "rows": args.rows,
        "dim": args.dim,
        "nlist": args.nlist,
        "scheduler_mode": spark.conf.get("spark.scheduler.mode", "FIFO"),
        "steady_p50_ms": round(_pctl(steady, 0.5), 1),
        "steady_p95_ms": round(_pctl(steady, 0.95), 1),
        "steady_n": len(steady),
        "during_isolated": during_iso,
        "during_shared": during_shared,
        "steady_after_p50_ms": round(_pctl(steady2, 0.5), 1),
        "contention_x_isolated": round(
            during_iso["p50_ms"] / max(_pctl(steady, 0.5), 1e-9), 2
        ),
        "contention_x_shared": round(
            during_shared["p50_ms"] / max(_pctl(steady, 0.5), 1e-9), 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
