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
key serializes into one task. :func:`asof_join_bucketed` is the hot-key
escalation: it range-buckets the timestamp so the window partitions by
(key, bucket) — per-task work is bounded by one bucket of one key — and
carries each bucket's closing right-side payload into the next bucket
via a second, tiny window over bucket summaries (cardinality = buckets,
not rows). Same results, one extra narrow aggregation.
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
    # SQL equi-join semantics: NULL keys never match. The window partitions
    # by the keys, so without this a NULL-key left row would inherit the
    # payload of NULL-key right rows sharing its partition; drop those
    # right rows so NULL-key left rows keep null values (as the LATERAL
    # form would produce). A NULL right TIMESTAMP must go the same way
    # (r04 review): `ts_r <= ts_l` is NULL-never-true in the LATERAL
    # form, but ascending order sorts NULLs FIRST, so a NULL-ts right
    # row would otherwise become a carry-in payload for every left row
    # with no earlier real match.
    r = r.filter(F.col("__ts").isNotNull())
    for _k in on:
        r = r.filter(F.col(_k).isNotNull())
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
        # is immune to session-timezone/DST reinterpretation. Microsecond
        # granularity — int(tolerance) SECOND silently truncated
        # fractional tolerances to 0 (review finding)
        tol_iv = F.expr(
            f"INTERVAL {int(round(tolerance_seconds * 1_000_000))} MICROSECOND"
        )
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


def _bucket_of(
    ts: F.Column, width_seconds: int, ts_type: str = "timestamp_ntz"
) -> F.Column:
    """Integer time bucket: floor(seconds-since-epoch / width).

    TIMESTAMP_NTZ buckets via NTZ interval arithmetic (NTZ cannot cast
    to numeric). TIMESTAMP (LTZ) buckets via ``unix_micros`` on the
    instant: casting LTZ to NTZ would render the SESSION zone's wall
    clock, which is DST-non-monotonic — around a fall-back hour bucket
    order could invert relative to the instant order the as-of window
    sorts by, silently dropping valid backward matches (review
    finding). Callers pass the resolved dtype of the timestamp column.
    """
    if ts_type == "timestamp":
        secs = F.floor(F.unix_micros(ts) / F.lit(1_000_000))
    else:
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        secs = (ts.cast("timestamp_ntz") - epoch).cast("long")
    return F.floor(secs / F.lit(int(width_seconds))).cast("long")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    bucket_seconds: int,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Hot-key-safe as-of join: identical results to :func:`asof_join`,
    but the big sort+window partitions by (key, time-bucket) so one
    pathological key spreads across ``keyspan / bucket_seconds`` tasks
    instead of serializing into one.

    Carry-forward: a bucket's matches may come from an earlier bucket,
    so each (key, bucket)'s CLOSING right payload is aggregated (tiny:
    one struct per bucket), a prefix-max window over those summaries
    computes each bucket's carry-in (window cardinality = buckets, not
    rows), and the carry-in enters the bucket as one virtual right row
    that sorts before all real rows (its timestamp predates the bucket).
    Choose ``bucket_seconds`` ≈ hot-key span / desired parallelism;
    correctness does not depend on the choice (property-tested).
    """
    lt_type = dict(left.dtypes)[left_ts]
    rt_type = dict(right.dtypes)[right_ts]
    if (lt_type == "timestamp") != (rt_type == "timestamp"):
        # _bucket_of buckets LTZ on unix_micros (instant) but NTZ on
        # wall-clock seconds; mixing the two bases silently misaligns the
        # carry-forward chain near bucket boundaries (review finding)
        raise ValueError(
            "asof_join_bucketed: mixed timestamp families "
            f"({left_ts}: {lt_type}, {right_ts}: {rt_type}) bucket in "
            "different bases (LTZ instant vs NTZ wall clock); cast one side "
            "so both are TIMESTAMP or both TIMESTAMP_NTZ"
        )
    left_cols = left.columns
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in on
        ],
    ).withColumn(
        "__b",
        _bucket_of(F.col("__ts"), bucket_seconds, dict(right.dtypes)[right_ts]),
    )
    # NULL keys / NULL right timestamps never match (same rationale as
    # in asof_join — here a NULL ts would additionally poison the NULL
    # bucket's prefix-max carry chain)
    r = r.filter(F.col("__ts").isNotNull())
    for _k in on:
        r = r.filter(F.col(_k).isNotNull())

    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left_cols if c not in on],
    ).withColumn(
        "__b",
        _bucket_of(F.col("__ts"), bucket_seconds, dict(left.dtypes)[left_ts]),
    )

    # r feeds three plan branches (bucket universe, closings, the final
    # union) and l two — persist both so the source scan+projection runs
    # once per side, not once per branch (3 saved corpus passes at
    # scale). Tracked so cache.cache_scope()/release_all() can unpersist
    # once the caller's terminal action completes.
    from citibike_analysis_spark.cache import track

    r = track(r.persist())
    l = track(l.persist())

    # per-(key, bucket) closing payload → prefix-max over earlier buckets.
    # The bucket universe must include LEFT-side buckets: a left row in a
    # bucket with no right rows still needs its carry-in (shrunk-out by
    # the property test when this joined closings only).
    buckets = (
        r.select(*on, "__b").unionByName(l.select(*on, "__b")).distinct()
    )
    closings = r.groupBy(*on, "__b").agg(F.max(_PAYLOAD).alias("__last"))
    w_prev = (
        Window.partitionBy(*on)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        buckets.join(closings, [*on, "__b"], "left")
        .withColumn("__carry", F.max("__last").over(w_prev))
        .filter(F.col("__carry").isNotNull())
        .select(
            *on,
            F.col("__carry")[right_ts].alias("__ts"),
            F.lit(0).alias(_SIDE),
            F.col("__carry").alias(_PAYLOAD),
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left_cols
                if c not in on
            ],
            "__b",
        )
    )

    unioned = r.unionByName(carry).unionByName(l)
    w = (
        Window.partitionBy(*on, "__b")
        .orderBy(F.col("__ts"), F.col(_SIDE), F.col(_PAYLOAD))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        # microsecond granularity, same as asof_join (review finding)
        tol_iv = F.expr(
            f"INTERVAL {int(round(tolerance_seconds * 1_000_000))} MICROSECOND"
        )
        in_tol = F.col("__ts") <= F.col(_PAYLOAD)[right_ts] + tol_iv
        matched = matched.withColumn(_PAYLOAD, F.when(in_tol, F.col(_PAYLOAD)))

    out_vals = [
        F.col(_PAYLOAD)[c].alias(f"{c}{suffix}") for c in [right_ts, *value_cols]
    ]
    return matched.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
        *out_vals,
    )
