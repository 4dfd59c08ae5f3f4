"""Skew handling — salted two-stage aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these explicit operators cover the cases AQE cannot: a single
hot GROUP BY key whose partial aggregate still funnels into one reducer,
and deliberate hot-key joins (the reference's hot-partition/direct-flush
escape hatch, config.h:28-31, re-expressed).

Salted aggregation = two stages: (key, salt) partial aggregate spreads
the hot key over `n_salts` reducers, then a tiny final merge on key.
Works for any algebraic aggregate (sum/count/min/max expressible as a
merge of partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    aggs: output_name → (input_col, fn) with fn ∈ {sum, count, min, max}.
    The salt is derived from a high-cardinality column when given
    (deterministic), else a row-hash — never rand(), so retries are safe.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    # avg decomposes into (sum, count) partials merged as sum(sum)/sum(count)
    avg_names = [name for name, (_c, fn) in aggs.items() if fn == "avg"]
    for name, (_c, fn) in aggs.items():
        if fn not in merge_fn and fn != "avg":
            raise ValueError(f"{name}: non-algebraic fn {fn!r}")
    expanded = dict(aggs)
    for name in avg_names:
        c, _ = expanded.pop(name)
        expanded[f"__avg_s_{name}"] = (c, "sum")
        expanded[f"__avg_n_{name}"] = (c, "count")
    aggs = expanded
    if salt_source is None:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    else:
        s = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(s), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            *[
                first_fn[fn](F.col(c)).alias(f"__p_{name}")
                for name, (c, fn) in aggs.items()
            ]
        )
    )
    out = partial.groupBy(*key_cols).agg(
        *[
            merge_fn[fn](F.col(f"__p_{name}")).alias(name)
            for name, (c, fn) in aggs.items()
        ]
    )
    for name in avg_names:
        out = out.withColumn(
            name, F.col(f"__avg_s_{name}") / F.col(f"__avg_n_{name}")
        ).drop(f"__avg_s_{name}", f"__avg_n_{name}")
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    big_salt_source: str | None = None,
) -> DataFrame:
    """Hot-key equi-join: the big side gets a deterministic salt, the
    small side is replicated n_salts× (explode), and the join runs on
    (key, salt) — a single hot key spreads over n_salts tasks. The small
    side must be broadcast-sized × n_salts."""
    if big_salt_source is None:
        bsalt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    else:
        bsalt = F.pmod(F.xxhash64(F.col(big_salt_source)), F.lit(n_salts))
    b = big.withColumn("__salt", bsalt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "__salt"]).drop("__salt")
