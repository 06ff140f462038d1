"""Real-fixture tests (SURVEY.md §5.2.6): the two CSVs the reference
actually ships — input/df_weather_fix.csv (the hourly patch table the
author re-fetched from the weather API) and input/df_weather_na.csv
(the (zip, day, lat, long) re-fetch key list) — read through the
engine's schema-declared reader and checked against the reference's own
published invariants.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from citibike_analysis_spark.schemas import WEATHER_FIX, WEATHER_NA
from citibike_analysis_spark.sources.files import read_csv

REF = "/root/reference/input"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/df_weather_fix.csv"),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def fix(spark):
    return read_csv(spark, f"{REF}/df_weather_fix.csv", WEATHER_FIX)


@pytest.fixture(scope="module")
def keys(spark):
    return read_csv(spark, f"{REF}/df_weather_na.csv", WEATHER_NA)


def test_published_cardinalities(fix, keys):
    # 1,416 re-fetch keys (README.md:545) × 24 hourly rows = 33,984
    assert keys.count() == 1416
    assert fix.count() == 33984


def test_zip_leading_zeros_survive_the_read(fix, keys):
    # the reference's headline bug: NJ zips losing their leading zero to
    # numeric inference — the declared-schema reader must preserve them
    nj = {r["zip"] for r in keys.select("zip").distinct().collect()
          if r["zip"].startswith("0")}
    assert "07306" in nj
    assert nj <= {r["zip"] for r in fix.select("zip").distinct().collect()}


def test_no_nulls_after_typed_parse(fix, keys):
    # a wrong timestampFormat/dtype would surface as silent nulls here
    for df in (fix, keys):
        null_counts = df.select(
            *[F.sum(F.col(c).isNull().cast("int")).alias(c) for c in df.columns]
        ).first()
        assert all(v == 0 for v in null_counts.asDict().values()), null_counts


def test_every_key_got_exactly_24_hourly_rows(fix, keys):
    # the author's implied fetch invariant: each (zip, day) key produced
    # one complete day of hourly weather, no orphans in either direction
    per_key = fix.groupBy(
        "zip", F.to_date("time_hour").alias("time_day")
    ).agg(F.count("*").alias("n"))
    assert per_key.filter(F.col("n") != 24).count() == 0
    assert per_key.join(keys, ["zip", "time_day"], "left_anti").count() == 0
    assert keys.join(per_key, ["zip", "time_day"], "left_anti").count() == 0


def test_patch_table_domain(fix):
    # every patch row is an observation (the whole point of the re-fetch:
    # replacing 'predicted'/missing rows with observed data)
    assert {r["weather_status"] for r in
            fix.select("weather_status").distinct().collect()} == {"observed"}
