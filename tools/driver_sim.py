"""Local simulation of the driver's correctness gate.

For each entry in __spark_entry__.queries(): run the Spark query at
sf0.01, run the matching oracle_sql() in DuckDB (fixture tables
pre-registered as views), and compare row count + column names + an
order-insensitive value hash. Use this as the fast feedback loop before
every commit; the real driver writes CORRECTNESS_r{N}.json the same way.

Usage:
    python tools/driver_sim.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _pandas_to_py(v):
    """numpy scalar → Python scalar, preserving the dtype class (int64→int,
    float64→float — so a HUGEINT-gone-float64 still canonicalizes as 53.0)."""
    import numpy as np
    import pandas as pd

    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if v is pd.NaT:
        return None
    return v


def canon_value(v) -> str:
    import datetime as dt
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, dt.datetime):
        # mirror the driver's pandas fetch: tz-aware (Spark/Arrow, UTC)
        # and naive (DuckDB) timestamps compare as the same naive wall
        # time, exactly as datetime64[ns] did on both sides
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return str(v)
    if isinstance(v, dt.date):
        # pandas promoted DATE to midnight datetime64 on both sides
        return str(dt.datetime(v.year, v.month, v.day))
    if isinstance(v, decimal.Decimal):
        # DuckDB HUGEINT/DECIMAL arrives as decimal128 through Arrow.
        # Canonicalize through float64 ON PURPOSE: the real driver's
        # pandas fetch turns HUGEINT into float64, so an oracle missing a
        # ::BIGINT cast must fail here (53.0 vs 53) exactly as it fails
        # in CORRECTNESS_r{N}.json.
        return repr(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # bit-exact float canonicalization
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return h, canon_rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from write_optimized_vector_database_spark.session import get_spark

    spark = get_spark("driver_sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            # Arrow fetch, NOT toPandas: pandas turns a NULL-able BIGINT
            # into float64, which silently rounds int64 values above 2^53
            # (e.g. xxhash64-derived columns) on BOTH sides — a real
            # low-bit mismatch could false-pass. Arrow keeps int64+null
            # exact. Type MISMATCHES the real driver catches still fail
            # here: a DuckDB HUGEINT shows up as decimal128 and
            # canon_value floats it (53.0 vs 53), mirroring the driver's
            # pandas dtype behavior.
            stbl = sdf.toArrow()
            srows = list(
                zip(*[stbl.column(c).to_pylist() for c in stbl.column_names])
            ) if stbl.num_columns else []
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"weak  {name}: rows-only ({len(srows)} rows, {spark_s:.1f}s)")
            continue
        try:
            # Arrow fetch (see the Spark side above): exact integers,
            # HUGEINT → decimal128 → canon floats it like the driver.
            otbl = con.execute(oracles[name]).arrow()
            ocols = list(otbl.column_names)
            orows = list(
                zip(*[otbl.column(c).to_pylist() for c in ocols])
            ) if otbl.num_columns else []
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        sh, scanon = frame_fingerprint(scols, srows)
        oh, ocanon = frame_fingerprint(ocols, orows)
        if sh != oh:
            problems.append(f"hash {sh} vs {oh}")
            if args.verbose:
                sset, oset = set(scanon), set(ocanon)
                for r in list(sset - oset)[:5]:
                    print(f"    spark-only: {r}")
                for r in list(oset - sset)[:5]:
                    print(f"    oracle-only: {r}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok    {name}: {len(srows)} rows, hash {sh}, {spark_s:.1f}s")
    spark.stop()
    print(f"{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
