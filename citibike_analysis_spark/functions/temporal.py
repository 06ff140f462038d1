"""Temporal scalar functions (SURVEY.md §2.8 F1-F9, §2.2 P8).

The reference implements these as row-at-a-time pandas ``Series.apply``
lambdas (e.g. hour truncation via ``x.replace(minute=0, ...)`` at
reference README.md:471, weekday classification at README.md:1138-1143).
Here each is a single Catalyst expression — vectorized, codegen'd, and
usable in both batch and streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trunc_hour(ts: Column | str) -> Column:
    """F1 — truncate a timestamp to the hour.

    Reference: ``x.replace(minute=0, second=0, microsecond=0)``
    (README.md:471,879) and the string-surgery variant
    (notebooks/CitiBike-1.ipynb:41).
    """
    return F.date_trunc("hour", ts)


def trunc_day(ts: Column | str) -> Column:
    """F2 — truncate a timestamp to midnight (README.md:511)."""
    return F.date_trunc("day", ts)


def hour_of_day(ts: Column | str) -> Column:
    """F3 — extract the hour 0-23 (README.md:1061)."""
    return F.hour(ts)


def round_to_hour(ts: Column | str) -> Column:
    """F3' — round to the *nearest* hour, half-to-even.

    pandas ``dt.round('H')`` (notebooks/citibike_ck.ipynb:368) rounds the
    half-hour boundary to the even hour (banker's rounding). Re-expressed
    with field arithmetic (works for both TIMESTAMP and TIMESTAMP_NTZ, no
    session-timezone dependence): microseconds-into-hour < 30 min round
    down, > 30 min round up, exactly :30:00.000000 goes to the even
    neighbor hour. The remainder is computed to full microsecond
    precision via ``date_part('SECOND')`` (a decimal carrying the
    fraction), so :30:00.000001 rounds UP exactly as pandas does —
    a millisecond-granularity check would banker-round it (ADVICE r1).
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    base = F.date_trunc("hour", ts)
    rem_us = F.minute(ts).cast("long") * F.lit(60_000_000).cast("long") + (
        F.date_part(F.lit("SECOND"), ts) * 1_000_000
    ).cast("long")
    half = F.lit(1_800_000_000).cast("long")
    bump = (
        F.when(rem_us > half, F.lit(1))
        .when(rem_us < half, F.lit(0))
        .otherwise(F.hour(ts) % 2)  # exactly :30:00.000000 → half to even
    )
    return base + bump * F.expr("INTERVAL 1 HOUR")


def day_name(ts: Column | str) -> Column:
    """F4 — full weekday name, e.g. 'Monday' (README.md:1122)."""
    return F.date_format(ts, "EEEE")


def day_type(ts: Column | str) -> Column:
    """F5 — 'weekend' | 'weekday' classifier.

    Reference ``get_day_type`` UDF (README.md:1138-1143). Spark
    ``dayofweek``: 1=Sunday, 7=Saturday.
    """
    return F.when(F.dayofweek(ts).isin(1, 7), F.lit("weekend")).otherwise(
        F.lit("weekday")
    )


def time_of_day(ts: Column | str) -> Column:
    """F6 — 'HH:mm:ss' time-of-day string (README.md:1100)."""
    return F.date_format(ts, "HH:mm:ss")


def epoch_to_local(epoch_secs: Column | str, tz: str = "America/New_York") -> Column:
    """F8/P8 — epoch seconds → local wall-clock timestamp.

    The reference hand-rolls a fixed UTC-4 shift
    (``dt.utcfromtimestamp(x-14400)``, README.md:708) which silently breaks
    across DST transitions; ``from_utc_timestamp`` applies real tz rules.
    """
    return F.from_utc_timestamp(F.timestamp_seconds(epoch_secs), tz)
