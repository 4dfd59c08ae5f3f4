"""sf1-equivalent soak of the flagship write/read paths.

Runs ingest → compact → build_indexes → two-phase search →
incremental refresh at two op scales (the bench's sf0.1-equivalent
replication and 10× that, ~sf1), and reports the per-stage scaling
exponent e = log10(t_hi/t_lo). Linear stages show e ≈ 1; anything
super-linear (driver loop, O(n²) join, unsampled training) shows up
as e >> 1. Results land in docs/SCALE.md's appendix.

Usage: python tools/soak.py [--lo 160] [--hi 1600]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_scale(spark, rep: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    from write_optimized_vector_database_spark.collection import VectorCollection
    from write_optimized_vector_database_spark.operators.changelog import (
        synthetic_changelog,
    )

    tmp = tempfile.mkdtemp(prefix=f"soak_{rep}_")
    t: dict[str, float] = {}
    try:
        log = synthetic_changelog(spark, SF_DIR)
        big = (
            log.crossJoin(spark.range(rep).select(F.col("id").alias("__rep")))
            .withColumn("id", F.col("id") + F.col("__rep") * 10_000_000)
            .withColumn("epoch", F.col("epoch") + F.col("__rep") * 1_000_000)
            .drop("__rep")
        )
        t["n_ops"] = big.count()
        coll = VectorCollection(spark, tmp, metric="ip")
        t0 = time.time()
        coll.ingest(big)
        t["ingest"] = time.time() - t0
        t0 = time.time()
        coll.compact()
        t["compact"] = time.time() - t0
        t0 = time.time()
        coll.build_indexes(nlist=64, m=8, nbits=8)
        t["build_indexes"] = time.time() - t0
        qdf = (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .filter(F.col("vec_id") < 8)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
        )
        t0 = time.time()
        coll.topk_two_phase(qdf, k=10, nprobe=8, rerank_factor=4).collect()
        t["two_phase_search"] = time.time() - t0
        # constant-absolute-size refresh delta (the scheduled-maintenance
        # shape); offsets scale with rep so delta ids land beyond the
        # replica band and delta epochs stay ABOVE the index high-water
        # (otherwise refresh sees 0 touched rows and measures nothing)
        delta = (
            log.withColumn("id", F.col("id") + (rep + 1) * 10_000_000)
            .withColumn("epoch", F.col("epoch") + (rep + 1) * 1_000_000)
        )
        coll.ingest(delta)
        t0 = time.time()
        coll.refresh_indexes()
        t["refresh_indexes"] = time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {k: round(v, 3) for k, v in t.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=160)
    ap.add_argument("--hi", type=int, default=1600)
    args = ap.parse_args()

    from write_optimized_vector_database_spark.session import get_spark

    spark = get_spark("soak")
    lo = run_scale(spark, args.lo)
    hi = run_scale(spark, args.hi)
    factor = hi["n_ops"] / lo["n_ops"]
    out = {"sf_dir": SF_DIR, "rep_lo": args.lo, "rep_hi": args.hi, "lo": lo, "hi": hi}
    exps = {}
    for k in ("ingest", "compact", "build_indexes", "two_phase_search", "refresh_indexes"):
        if lo[k] > 0 and hi[k] > 0:
            exps[k] = round(math.log(hi[k] / lo[k]) / math.log(factor), 3)
    out["scale_factor"] = round(factor, 2)
    out["exponents"] = exps
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
