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

Map-side shape is identical to plain avg: sum + count partials, both
mergeable — nothing about the rewrite costs extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


_SPLIT_BITS = 20
_SPLIT = 1 << _SPLIT_BITS  # 1048576


def _split_sum(c: Column, in_scale: int, over=None):
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
    of 6-decimal-scaled money, which overflows at ~8e7 rows per group."""
    sc = F.round(c * F.lit(int(10**in_scale))).cast("long")
    hi = F.shiftright(sc, _SPLIT_BITS)
    lo = sc.bitwiseAND(F.lit(_SPLIT - 1))
    sh, sl = F.sum(hi), F.sum(lo)
    if over is not None:
        sh, sl = sh.over(over), sl.over(over)
    return sh.cast("decimal(38,0)") * F.lit(_SPLIT) + sl.cast("decimal(38,0)")


def _exact_parts(col: Column | str, in_scale: int, out_scale: int):
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
    s = _split_sum(c, in_scale)
    if out_scale >= in_scale:
        # exact value already representable at out_scale: round is identity
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
    s, n = _exact_parts(col, in_scale, out_scale)
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


def sql_round_avg_exact(
    expr: str, in_scale: int = 2, out_scale: int = 4, over: str = ""
) -> str:
    """The DuckDB-side mirror of :func:`round_avg_exact` — emits the SQL
    fragment computing the identical integer-space rounded mean, so the
    differential oracle compares exact numbers, not float coin flips.
    ``over`` (e.g. ``"OVER w"``) turns both partials into window calls.
    """
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
