"""HTTP weather source tests (SURVEY.md §2.1 S3): partition-parallel
fetch plumbing with an injected transport, quota guard, and the
hourly-array normalization (explode + renames + tz-correct epoch
conversion + observed literal).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from citibike_analysis_spark.sources.http_weather import (
    fake_transport,
    fetch_raw,
    weather_for_keys,
)

KEY_SCHEMA = T.StructType(
    [
        T.StructField("zip", T.StringType()),
        T.StructField("time_day", T.TimestampNTZType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)


def _keys(spark, n_days=2):
    rows = [
        ("07306", dt.datetime(2019, 5, 12) + dt.timedelta(days=i), 40.73, -74.06)
        for i in range(n_days)
    ] + [("10001", dt.datetime(2019, 5, 12), 40.75, -73.99)]
    return spark.createDataFrame(rows, KEY_SCHEMA)


def test_fetch_and_normalize_shape(spark):
    out = weather_for_keys(_keys(spark), transport=fake_transport)
    rows = out.collect()
    assert len(rows) == 3 * 24  # 24 hourly rows per key
    cols = set(out.columns)
    # camelCase fully renamed away; observed literal present
    assert {"weather_summary", "precip_intensity", "wind_speed", "wind_gust",
            "cloud_cover", "temperature", "humidity", "time_hour",
            "weather_status", "zip"} <= cols
    assert not any(c for c in cols if any(ch.isupper() for ch in c))
    assert {r["weather_status"] for r in rows} == {"observed"}


def test_epoch_converted_with_real_tz_rules(spark):
    out = weather_for_keys(_keys(spark, 1), transport=fake_transport)
    first = (
        out.filter(F.col("zip") == "10001")
        .orderBy("time_hour")
        .select(F.date_format("time_hour", "yyyy-MM-dd HH:mm").alias("t"))
        .first()["t"]
    )
    # epoch for 2019-05-12 00:00 UTC renders as 20:00 on the 11th in
    # America/New_York (EDT, UTC-4) — real tz conversion, not a naive shift
    assert first == "2019-05-11 20:00"


def test_quota_guard_refuses_up_front(spark):
    many = spark.range(5).select(
        F.lit("10001").alias("zip"),
        F.lit(dt.datetime(2019, 5, 12)).cast("timestamp_ntz").alias("time_day"),
        F.lit(40.75).alias("latitude"),
        F.lit(-73.99).alias("longitude"),
    )
    calls = []

    def counting(lat, long, day):
        calls.append(day)
        return fake_transport(lat, long, day)

    with pytest.raises(ValueError, match="quota"):
        fetch_raw(many, transport=counting, max_calls=3)
    assert calls == []  # refused before spending any quota


def test_transport_runs_distributed(spark):
    # the transport executes inside mapInPandas tasks, not on the driver:
    # repartition the keys and check every key produced a payload
    keys = _keys(spark).repartition(3)
    raw = fetch_raw(keys, transport=fake_transport)
    assert raw.filter(F.col("payload").isNull()).count() == 0
    assert raw.count() == 3


def test_fetch_accepts_date_typed_keys(spark):
    # review finding: schemas.WEATHER_NA declares time_day as DATE; date
    # keys crashed the Arrow conversion to RAW_SCHEMA's TimestampNTZ
    # AFTER the transport had already spent quota
    import datetime as dt

    from citibike_analysis_spark.sources.http_weather import weather_for_keys

    keys = spark.createDataFrame(
        [("07306", 40.73, -74.06, dt.date(2019, 5, 12))],
        "zip string, latitude double, longitude double, time_day date",
    )
    out = weather_for_keys(keys, transport=fake_transport).collect()
    assert len(out) == 24  # one row per hour of the fetched day
    assert {r["time_day"] for r in out} == {dt.datetime(2019, 5, 12)}
