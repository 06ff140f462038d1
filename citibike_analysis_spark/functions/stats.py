"""Cross-engine-exact rounded means (SURVEY.md §2.11 support).

``round(avg(x), 4)`` over float columns is NOT a well-defined number:
the float sum depends on partition/merge order, and when the true mean
lands exactly on a rounding midpoint the engines disagree — Spark's
Round sees ``BigDecimal.valueOf`` (shortest-string) digits, DuckDB
rounds the exact binary value, and a ±1e-12 summation difference flips
the 4th decimal. This is not hypothetical: the test corpus quantizes
measures to 2 decimals, so group means are rationals like
``2129.99 / 40 = 53.249750`` — EXACT midpoints at scale 4 (any odd
scaled sum over n=40 is one). A float ``round(avg(...), 4)`` on such a
cell is a per-run coin flip.

Fix: compute the rounded mean entirely in integer space. Inputs are
exact decimals of scale ``in_scale`` (here: money/measure columns with
2 decimals), so ``round(x·10^in)`` recovers the exact scaled integer
(float error ~1e-9 ≪ 0.5). The scaled integer sum is exact and
order-free in a decimal(38,0)/HUGEINT accumulator; the half-away-from-
zero round of ``S·10^(out-in) / n`` is done with an exact remainder
test (no float division anywhere near a midpoint); the final
``scaled / 10^out`` is one IEEE op on an integer — bit-identical in
every engine and far from any midpoint the comparator's 9-decimal
normalization could see.

Map-side SHAPE is identical to plain avg: sum + count partials, both
mergeable — so the rewrite changes no shuffle and no aggregation mode.
It is NOT free, though: the per-row scale/round/cast (+ hi/lo split
where enabled) and the extra sum column are a real constant factor —
measured ×2.3 on q01's wide aggregate when every output column carried
its own private partials (r03 → judged). The constant is linear in rows,
so it neither grows nor shrinks with scale; the mitigation is SHARING:
:func:`exact_scaled_sum` computes one scaled-integer partial per input
column, from which every rounded sum/avg over that column is derived
(see q01), and ``split=False`` drops the hi/lo split for columns whose
scaled magnitude keeps a raw long sum overflow-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


_SPLIT_BITS = 20
_SPLIT = 1 << _SPLIT_BITS  # 1048576


def _split_sum(c: Column, in_scale: int, over=None, split: bool = True):
    """Exact sum of the scaled-integer image of ``c`` with all PER-ROW
    work in long space — a decimal(38,0) accumulator per row costs ~4x
    on a wide aggregate (measured on q01 at sf0.1), so the scaled value
    is split hi/lo around 2^20 with two bit ops and summed as two longs;
    the exact decimal total ``hi·2^20 + lo`` is reassembled once per
    group. Arithmetic shift floors for negatives, and two's-complement
    AND then yields lo = sc − hi·2^20 ∈ [0, 2^20) — both exact.
    Overflow bounds (int64 ≈ 9.2e18): lo < 2^20 → safe to ~8.8e12 rows
    per group; hi ≤ scaled/2^20 (≤ ~10^5 for 6-decimal money) → safe to
    ~9e13 — both past the 100 TB operating point, unlike a raw long sum
    of 6-decimal-scaled money, which overflows at ~8e7 rows per group.

    ``split=False`` drops the hi/lo split (one sum, no bit ops) for
    columns the CALLER knows are small: with |scaled| ≤ B, a raw long
    sum is safe to 9.2e18/B rows per group — e.g. B=10^4 (quantities
    ≤ 50, rates ≤ 1 at 2 decimals) is safe past 9e14 rows per group,
    two orders beyond the 100 TB operating point.

    The integer recovery uses ``rint`` (one IEEE round-to-nearest-even
    instruction inside codegen), NOT ``round`` — Spark's Round on
    doubles allocates a java BigDecimal per row, which was most of the
    r03 q01 regression. Exactness is unaffected: the scaled value sits
    within ~1e-9 of the true integer (module contract), so every
    tie-breaking convention recovers the same integer — ties at .5
    cannot occur."""
    sc = F.rint(c * F.lit(int(10**in_scale))).cast("long")
    if not split:
        s = F.sum(sc)
        if over is not None:
            s = s.over(over)
        return s.cast("decimal(38,0)")
    hi = F.shiftright(sc, _SPLIT_BITS)
    lo = sc.bitwiseAND(F.lit(_SPLIT - 1))
    sh, sl = F.sum(hi), F.sum(lo)
    if over is not None:
        sh, sl = sh.over(over), sl.over(over)
    return sh.cast("decimal(38,0)") * F.lit(_SPLIT) + sl.cast("decimal(38,0)")


def _exact_parts(col: Column | str, in_scale: int):
    c = F.col(col) if isinstance(col, str) else col
    s = _split_sum(c, in_scale)
    n = F.count(c).cast("decimal(38,0)")
    return s, n


def _exact_round(s: Column, n: Column, in_scale: int, out_scale: int) -> Column:
    if out_scale < in_scale:
        raise ValueError("out_scale must be >= in_scale")
    sk = s * F.lit(int(10 ** (out_scale - in_scale)))
    r = sk % n  # exact decimal remainder, sign follows the dividend
    base = ((sk - r) / n).cast("long")  # exactly divisible -> exact quotient
    adj = (
        F.when(r * 2 >= n, F.lit(1))
        .when(r * 2 <= -n, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return F.when(
        n > 0, (base + adj).cast("double") / F.lit(float(10**out_scale))
    ).otherwise(F.lit(None).cast("double"))


def exact_scaled_sum(
    col: Column | str, in_scale: int, split: bool = True
) -> Column:
    """The shared partial: exact scaled-integer group sum of ``col``
    (decimal(38,0) = Σ round(x·10^in_scale)) as an aggregate column.

    Compute it ONCE per input column in ``.agg(...)``, then derive every
    rounded sum/avg over that column with :func:`round_from_scaled` /
    :func:`round_avg_from_scaled` in a following ``.select`` — per-group
    work, free. This is the wide-aggregate fast path: q01 derives 7 of
    its 8 measures from 5 such partials instead of carrying private
    partials per output column (the r03 ×2.3 regression).

    ``split=False``: see :func:`_split_sum` — only for columns whose
    scaled magnitude bound keeps a raw long sum overflow-safe.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _split_sum(c, in_scale, split=split)


def round_from_scaled(s: Column, in_scale: int, out_scale: int) -> Column:
    """Finish ``round(sum(x), out_scale)`` from an :func:`exact_scaled_sum`
    group column — half-away-from-zero in exact integer space for
    ``out_scale < in_scale``, identity rescale otherwise."""
    if out_scale >= in_scale:
        return s.cast("double") / F.lit(float(10**in_scale))
    d = F.lit(int(10 ** (in_scale - out_scale))).cast("decimal(38,0)")
    r = s % d
    base = ((s - r) / d).cast("long")
    adj = (
        F.when(r * 2 >= d, F.lit(1))
        .when(r * 2 <= -d, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return (base + adj).cast("double") / F.lit(float(10**out_scale))


def round_avg_from_scaled(
    s: Column, n: Column, in_scale: int, out_scale: int
) -> Column:
    """Finish ``round(avg(x), out_scale)`` from an :func:`exact_scaled_sum`
    group column and a row count ``n`` (cast to decimal(38,0) by the
    caller contract — share one ``count(*)`` across all avg measures
    when the input columns are non-null, as q01 does)."""
    return _exact_round(s, n, in_scale, out_scale)


def spark_sql_scaled_sum(expr: str, in_scale: int, split: bool = True) -> str:
    """Spark-SQL-dialect fragment for :func:`exact_scaled_sum` — emits
    the scaled-integer group sum as SQL text. Used by wide aggregates
    (q01) that are registered as ONE ``spark.sql()`` string: building
    the same plan out of Column objects costs hundreds of py4j round
    trips (~0.35 s of driver time per call, measured — half of q01's
    whole sf0.1 runtime), while a SQL string is parsed JVM-side in one.
    Semantics are identical to the Column form; ``rint`` per the module
    contract (ties cannot occur)."""
    m = int(10**in_scale)
    sc = f"CAST(rint(({expr}) * {m}) AS BIGINT)"
    if not split:
        return f"CAST(sum({sc}) AS DECIMAL(38,0))"
    return (
        f"(CAST(sum(shiftright({sc}, {_SPLIT_BITS})) AS DECIMAL(38,0)) * {_SPLIT}"
        f" + CAST(sum({sc} & {_SPLIT - 1}) AS DECIMAL(38,0)))"
    )


def spark_sql_round_from_scaled(s: str, in_scale: int, out_scale: int) -> str:
    """Spark-SQL mirror of :func:`round_from_scaled` over a named scaled
    sum column/fragment ``s``."""
    if out_scale >= in_scale:
        return f"(CAST({s} AS DOUBLE) / {int(10**in_scale)})"
    d = int(10 ** (in_scale - out_scale))
    r = f"({s} % {d})"
    base = f"CAST(({s} - {r}) / {d} AS BIGINT)"
    adj = (
        f"(CASE WHEN 2 * {r} >= {d} THEN 1 "
        f"WHEN 2 * {r} <= -{d} THEN -1 ELSE 0 END)"
    )
    return f"(CAST({base} + {adj} AS DOUBLE) / {int(10**out_scale)})"


def spark_sql_round_avg_from_scaled(
    s: str, n: str, in_scale: int, out_scale: int
) -> str:
    """Spark-SQL mirror of :func:`round_avg_from_scaled`; ``n`` is a
    positive row-count fragment (grouped context — no empty groups)."""
    if out_scale < in_scale:
        # same guard the Column mirror enforces — int(10**negative) is 0,
        # which would silently turn every group's avg into 0.0
        raise ValueError("out_scale must be >= in_scale")
    k = int(10 ** (out_scale - in_scale))
    sk = f"(({s}) * {k})"
    nn = f"CAST({n} AS DECIMAL(38,0))"
    r = f"({sk} % {nn})"
    base = f"CAST(({sk} - {r}) / {nn} AS BIGINT)"
    adj = (
        f"(CASE WHEN 2 * {r} >= {nn} THEN 1 "
        f"WHEN 2 * {r} <= -{nn} THEN -1 ELSE 0 END)"
    )
    return f"(CAST({base} + {adj} AS DOUBLE) / {int(10**out_scale)})"


def round_sum_exact(
    col: Column | str, in_scale: int, out_scale: int
) -> Column:
    """``round(sum(col), out_scale)`` for inputs that are exact decimals
    of scale ``in_scale`` (e.g. a product of 2-decimal money columns is
    an exact 4- or 6-decimal value, and its float image is within
    ~1e-5 of the exact scaled integer — far under the 0.5 the recovery
    round needs). For ``out_scale < in_scale`` the exact scaled sum can
    land exactly on a rounding midpoint (a 4-decimal sum ending in 50 is
    a 1-in-100 event PER GROUP), which is where float round+sum flips
    per engine/run — so the down-rounding is done with an exact integer
    remainder test, like :func:`round_avg_exact`."""
    c = F.col(col) if isinstance(col, str) else col
    return round_from_scaled(_split_sum(c, in_scale), in_scale, out_scale)


def sql_round_sum_exact(
    expr: str, in_scale: int, out_scale: int
) -> str:
    """DuckDB mirror of :func:`round_sum_exact`. The engines need not
    produce bit-identical float products — each side independently
    recovers the same exact scaled integer before any rounding."""
    m = int(10**in_scale)
    s = f"sum(CAST(round(({expr}) * {m}) AS HUGEINT))"
    if out_scale >= in_scale:
        return f"(CAST({s} AS DOUBLE) / {m})"
    d = int(10 ** (in_scale - out_scale))
    r = f"({s} % {d})"
    base = f"(({s} - {r}) // {d})"
    adj = (
        f"(CASE WHEN 2 * {r} >= {d} THEN 1 "
        f"WHEN 2 * {r} <= -{d} THEN -1 ELSE 0 END)"
    )
    return f"(CAST({base} + {adj} AS DOUBLE) / {int(10**out_scale)})"


def round_avg_exact(
    col: Column | str, in_scale: int = 2, out_scale: int = 4
) -> Column:
    """``round(avg(col), out_scale)`` as a deterministic, engine-portable
    aggregate, for columns whose values are exact decimals of scale
    ``in_scale``. See module docstring for why plain float avg+round is
    a coin flip on midpoint cells."""
    s, n = _exact_parts(col, in_scale)
    return _exact_round(s, n, in_scale, out_scale)


def round_avg_exact_over(
    col: Column | str, w: Window, in_scale: int = 2, out_scale: int = 4
) -> Column:
    """Windowed form of :func:`round_avg_exact` (same math, partials
    evaluated ``.over(w)``)."""
    c = F.col(col) if isinstance(col, str) else col
    s = _split_sum(c, in_scale, over=w)
    n = F.count(c).over(w).cast("decimal(38,0)")
    return _exact_round(s, n, in_scale, out_scale)


def round_ratio_exact(
    s: Column, n: Column, in_scale: int = 2, out_scale: int = 4
) -> Column:
    """``round(s / (n·10^in_scale), out_scale)`` from an explicit
    (scaled-integer sum, count) pair — the two-argument form of
    :func:`round_avg_exact` for shapes where the exact partials survive
    an intermediate stage (e.g. q10's min-of-hourly-means: min_by picks
    the argmin hour's (s, n), the round happens once at the end).
    Same half-away-from-zero convention; NULL when n is 0/NULL."""
    return _exact_round(
        s.cast("decimal(38,0)"), n.cast("decimal(38,0)"), in_scale, out_scale
    )


def sql_round_ratio_exact(
    s: str, n: str, in_scale: int = 2, out_scale: int = 4
) -> str:
    """DuckDB mirror of :func:`round_ratio_exact` over SQL fragments
    ``s`` (scaled-integer sum) and ``n`` (count)."""
    if out_scale < in_scale:
        raise ValueError("out_scale must be >= in_scale")
    k = int(10 ** (out_scale - in_scale))
    sk = f"(CAST({s} AS HUGEINT) * {k})"
    r = f"({sk} % ({n}))"
    base = f"(({sk} - {r}) // ({n}))"
    adj = (
        f"(CASE WHEN 2 * {r} >= ({n}) THEN 1 "
        f"WHEN 2 * {r} <= -({n}) THEN -1 ELSE 0 END)"
    )
    return (
        f"(CASE WHEN ({n}) > 0 THEN "
        f"CAST({base} + {adj} AS DOUBLE) / {int(10**out_scale)} END)"
    )


def sql_round_avg_exact(
    expr: str, in_scale: int = 2, out_scale: int = 4, over: str = ""
) -> str:
    """The DuckDB-side mirror of :func:`round_avg_exact` — emits the SQL
    fragment computing the identical integer-space rounded mean, so the
    differential oracle compares exact numbers, not float coin flips.
    ``over`` (e.g. ``"OVER w"``) turns both partials into window calls.
    """
    if out_scale < in_scale:
        raise ValueError("out_scale must be >= in_scale")
    m = int(10**in_scale)
    k = int(10 ** (out_scale - in_scale))
    s = f"sum(CAST(round(({expr}) * {m}) AS HUGEINT)) {over}".rstrip()
    n = f"count({expr}) {over}".rstrip()
    sk = f"(({s}) * {k})"
    r = f"({sk} % ({n}))"
    base = f"(({sk} - {r}) // ({n}))"
    adj = (
        f"(CASE WHEN 2 * {r} >= ({n}) THEN 1 "
        f"WHEN 2 * {r} <= -({n}) THEN -1 ELSE 0 END)"
    )
    return (
        f"(CASE WHEN ({n}) > 0 THEN "
        f"CAST({base} + {adj} AS DOUBLE) / {int(10**out_scale)} END)"
    )
