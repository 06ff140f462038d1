"""As-of (nearest-preceding-event) join — SURVEY.md §2.3 surface completion.

The reference's domain needs this join shape (attach the nearest weather
reading at-or-before each availability interval; SURVEY.md §2.3 "the
domain needs as-of"), and every market-data / telemetry workload needs it
too. Spark has no built-in ASOF JOIN, so this implements the scalable
**union + ordered-window** plan:

1. tag left rows (probe) and right rows (reference series), project both
   to a common shape, ``unionByName`` them;
2. one shuffle on the join key, one in-partition sort on
   ``(ts, side, seq)`` — right rows sort *before* left rows at equal
   timestamps, making the match backward-inclusive;
3. ``last(value_struct, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries the most
   recent right-side payload forward onto each left row;
4. keep left rows, unpack the struct.

Why not the obvious alternatives:

- per-key ``join + filter(ts_r <= ts_l) + row_number``: materializes the
  full (left × matching-right) product before ranking — quadratic per
  key for dense series; the union-window plan is O(n log n) per key and
  shuffles each row exactly once;
- broadcast + UDF binary search: caps the right side at driver memory —
  wrong at 100 TB.

Skew note: the window partitions by the join key, so one pathological
key serializes into one task. For known-hot keys, range-bucket the
timestamp (add ``bucket(ts)`` to the partition key, carry the previous
bucket's last row forward) — the composition stays declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_SEQ = "__asof_seq"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, attach ``value_cols`` from
    the latest right row with ``right_ts <= left_ts`` on the same key.

    Ties on ``right_ts`` resolve to the right row that sorts last by its
    first value column (deterministic). Left rows with no match (or none
    within ``tolerance_seconds``) keep null values.

    Output: all left columns plus ``<value_col><suffix>`` for each value
    column, and ``<right_ts><suffix>`` (the matched timestamp).
    """
    left_cols = left.columns
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left_cols if c not in on],
    )
    unioned = r.unionByName(l)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col(_SIDE), F.col(_PAYLOAD))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        # interval comparison (not epoch math): works for TIMESTAMP_NTZ and
        # is immune to session-timezone/DST reinterpretation
        tol_iv = F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
        in_tol = F.col("__ts") <= F.col(_PAYLOAD)[right_ts] + tol_iv
        matched = matched.withColumn(
            _PAYLOAD, F.when(in_tol, F.col(_PAYLOAD))
        )

    out_vals = [
        F.col(_PAYLOAD)[c].alias(f"{c}{suffix}") for c in [right_ts, *value_cols]
    ]
    return matched.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
        *out_vals,
    )
