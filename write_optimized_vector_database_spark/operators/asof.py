"""As-of join — a composed operator Spark lacks natively.

Implemented the scalable way (no per-key Python, no merge_asof driver
loop): union both sides with a marker, one window per key ordered by
(ts, side), and `last(value, ignorenulls=True)` carries the most recent
left-side value forward onto right-side rows. One shuffle on the key;
the same pattern holds at 100 TB (standard CDC/as-of event-sequence
formulation). Right rows travel as a struct through the union, so
duplicate timestamps never cause join-back fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = True,
    tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each `right` row, attach the newest `left` row with
    left.ts < right.ts (strict) or left.ts ≤ right.ts (strict=False),
    per `on` key.

    Returns all right columns + `asof_<col>` for each left value column
    (null when no prior left row exists). `tiebreak` names a left value
    column used to break equal-ts ties deterministically (highest wins).

    `tolerance_seconds` bounds the lookback (pandas merge_asof
    tolerance): a match older than the bound is nulled out, not
    attached. Implemented by carrying the matched left ts and comparing
    epoch-microsecond integers — exact, engine-independent arithmetic.
    """
    value_cols = value_cols or [c for c in left.columns if c not in (on, ts_col)]
    carry_ts = tolerance_seconds is not None
    internal_cols = list(value_cols) + (["__ts"] if carry_ts else [])
    right_cols = right.columns
    l_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
        ).alias("__right"),
        *[F.col(c).alias(f"asof_{c}") for c in value_cols],
        *([F.col(ts_col).alias("asof___ts")] if carry_ts else []),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__right"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"asof_{c}")
            for c in value_cols
        ],
        *(
            [F.lit(None).cast(left.schema[ts_col].dataType).alias("asof___ts")]
            if carry_ts
            else []
        ),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # At equal ts: strict ⇒ the left row must sort AFTER the right row
    # (side 1 first) so the window up to the current right row excludes it;
    # non-strict ⇒ left first (side 0 first) so it is included.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    order = [F.col(ts_col).asc(), side_order]
    if tiebreak:
        order.append(F.col(f"asof_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = list(value_cols) + (["__ts"] if carry_ts else [])
    filled = (
        unioned.select(
            "__side",
            "__right",
            *[
                F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                for c in carried
            ],
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    asof_out = [F.col(f"asof_{c}") for c in value_cols]
    if carry_ts:
        within = F.col("asof___ts").isNotNull() & (
            (
                F.unix_micros(F.col(f"__right.{ts_col}"))
                - F.unix_micros(F.col("asof___ts"))
            )
            <= int(tolerance_seconds * 1_000_000)
        )
        asof_out = [
            F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in value_cols
        ]
    return filled.select(
        *[F.col(f"__right.{c}").alias(c) for c in right_cols],
        *asof_out,
    )
