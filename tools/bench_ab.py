"""Same-window A/B adjudicator for round-over-round bench movers
(VERDICT r12 #4).

Cross-window bench ratios conflate code changes with host noise: the
r12 driver window carried 9x the CPU steal of the builder window and
read 1.057x overall, while a per-query A/B in ONE window showed zero
code-attributable regressions. This tool promotes that adjudication
discipline (SCALE.md "Rebuild-window contention, measured properly";
tools/contention_probe.py) into a reusable step:

    python tools/bench_ab.py BENCH_r12.json BENCH_r13.json \
        [--top 8] [--threshold 1.3] [--reps 3] [--out AB_PROBE.json]

1. Diff the two runs' per-query seconds; select the top-N movers with
   ratio >= threshold AND new-time >= 0.5 s (jitter-scale entries are
   unadjudicable and excluded by the same floor bench.py medians use).
2. Re-run each mover in ONE fresh warm window: shared lifecycle
   fixtures pre-warmed exactly as bench.py does, one warm-up pass per
   query, then `reps` timed runs with per-run host-steal provenance;
   the clean-run median is the query's same-window time.
3. Verdict per query: `code_attributable` iff the SAME-WINDOW median
   still exceeds threshold x the baseline time — a mover that
   re-measures at baseline in a clean window was window noise, not a
   regression.

Prints one JSON line (movers, verdicts, window steal) and a human
table on stderr; cite its output in round scoreboards instead of raw
cross-window totals.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402  (module-level helpers only; main() not run)


def _load_queries(path: str) -> dict[str, float]:
    """Accepts a full bench JSON ({"queries": {...}}), the driver's
    BENCH_r{N}.json wrapper ({"parsed": {"queries": ...}} — `parsed`
    may be null when the driver truncated the tail; BENCH_FULL.json is
    the reliable per-window artifact), or a raw name->seconds map."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    qs = doc.get("queries", doc)
    out = (
        {k: float(v) for k, v in qs.items() if isinstance(v, (int, float))}
        if isinstance(qs, dict)
        else {}
    )
    # validate AFTER the numeric filter: a structurally-present map of
    # non-numeric values must abort like any other timing-free input,
    # never fall through to a false "windows agree"
    if not out:
        raise SystemExit(
            f"bench_ab: {path} carries no per-query timings "
            "(driver wrapper with parsed=null? use BENCH_FULL.json)"
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("baseline", help="older BENCH_*.json (the A window)")
    ap.add_argument("candidate", help="newer BENCH_*.json (the B window)")
    ap.add_argument("--top", type=int, default=8, help="max movers to re-run")
    ap.add_argument(
        "--threshold", type=float, default=1.3,
        help="ratio at/above which a query counts as a mover",
    )
    ap.add_argument("--reps", type=int, default=3, help="timed runs per mover")
    ap.add_argument(
        "--floor-s", type=float, default=0.5,
        help="ignore movers whose candidate time is under this (jitter scale)",
    )
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument(
        "--dry-run", action="store_true",
        help="list the selected movers without re-running them",
    )
    args = ap.parse_args()

    a = _load_queries(args.baseline)
    b = _load_queries(args.candidate)
    movers = sorted(
        (
            (name, a[name], b[name], b[name] / a[name])
            for name in a.keys() & b.keys()
            if a[name] > 0 and b[name] >= args.floor_s
            and b[name] / a[name] >= args.threshold
        ),
        key=lambda t: -t[3],
    )[: args.top]
    result: dict = {
        "baseline": os.path.basename(args.baseline),
        "candidate": os.path.basename(args.candidate),
        "threshold": args.threshold,
        "movers": [],
        "code_attributable": [],
    }
    if not movers:
        print("bench_ab: no movers at/above threshold — windows agree",
              file=sys.stderr)
        print(json.dumps(result))
        return
    for name, ta, tb, ratio in movers:
        print(
            f"bench_ab: mover {name}: {ta:.2f}s -> {tb:.2f}s "
            f"({ratio:.2f}x)", file=sys.stderr,
        )
    if args.dry_run:
        result["movers"] = [
            {"query": n, "a_s": ta, "b_s": tb, "cross_window_ratio": round(r, 3)}
            for n, ta, tb, r in movers
        ]
        print(json.dumps(result))
        return

    from write_optimized_vector_database_spark.queries import registry
    from write_optimized_vector_database_spark.session import get_spark

    spark = get_spark("bench_ab")
    reg = registry()
    # identical pre-warm discipline to bench.py: the shared lifecycle
    # fixtures must not bill their one-shot build to the first mover
    import write_optimized_vector_database_spark.queries_ext as _qx

    for warm_name in B.SHARED_LIFECYCLE_FIXTURES:
        try:
            getattr(_qx, warm_name)(spark, B.SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"bench_ab: fixture warmup {warm_name} failed: {e}",
                  file=sys.stderr)

    window_steal = 0
    for name, ta, tb, ratio in movers:
        if name not in reg:
            result["movers"].append(
                {"query": name, "a_s": ta, "b_s": tb, "error": "not registered"}
            )
            continue
        try:
            reg[name].fn(spark, B.SF_DIR).count()  # warm-up, untimed
            samples: list[tuple[float, int]] = []
            for _ in range(max(1, args.reps)):
                s0 = B._host_steal_jiffies()
                t0 = time.time()
                reg[name].fn(spark, B.SF_DIR).count()
                samples.append(
                    (time.time() - t0, B._host_steal_jiffies() - s0)
                )
        except Exception as e:  # noqa: BLE001
            result["movers"].append(
                {"query": name, "a_s": ta, "b_s": tb, "error": str(e)[:200]}
            )
            continue
        window_steal += sum(s[1] for s in samples)
        clean = [s[0] for s in samples if B._steal_clean(s[0], s[1], 500)]
        med = B._pctl(clean if clean else [s[0] for s in samples], 0.5)
        same_ratio = med / ta
        attributable = same_ratio >= args.threshold
        entry = {
            "query": name,
            "a_s": ta,
            "b_s": tb,
            "cross_window_ratio": round(ratio, 3),
            "same_window_median_s": round(med, 3),
            "same_window_ratio": round(same_ratio, 3),
            "runs": [round(s[0], 3) for s in samples],
            "runs_steal_jf": [s[1] for s in samples],
            "clean_n": len(clean),
            "code_attributable": attributable,
        }
        result["movers"].append(entry)
        if attributable:
            result["code_attributable"].append(name)
        verdict = "CODE-ATTRIBUTABLE" if attributable else "window noise"
        print(
            f"bench_ab: {name}: same-window {med:.2f}s vs baseline "
            f"{ta:.2f}s ({same_ratio:.2f}x) -> {verdict}", file=sys.stderr,
        )
    result["window_steal_jf"] = window_steal
    spark.stop()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
