"""Reference-shaped synthetic fixtures (FIXTURES.md).

Deterministic (seed=7) availability / weather_fix tables mirroring the
reference's value domains and its *blocky* missing-weather structure
(contiguous (zip, day) spans are NULL or 'predicted', per
FIXTURES.md §1 / reference README.md:459-464).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

ZIPS = ["07306", "07302", "10001", "10002", "11201", "11205"]  # NJ leading zeros
HOODS = {
    "07306": ("Journal Square", "New Jersey"),
    "07302": ("Downtown JC", "New Jersey"),
    "10001": ("Chelsea", "Manhattan"),
    "10002": ("Lower East Side", "Manhattan"),
    "11201": ("Brooklyn Heights", "Brooklyn"),
    "11205": ("Fort Greene", "Brooklyn"),
}
N_STATIONS = 12
DAYS = 10
START = dt.datetime(2019, 5, 12)


def availability_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    stations = []
    for i in range(N_STATIONS):
        z = ZIPS[i % len(ZIPS)]
        hood, borough = HOODS[z]
        stations.append(
            {
                "station_id": 100 + i,
                "station_name": f"Station {100 + i}",
                "station_status": "In Service" if i != 11 else "Not In Service",
                "latitude": 40.65 + 0.01 * i,
                "longitude": -74.05 + 0.01 * i,
                "zip": z,
                "borough": borough,
                "hood": hood,
            }
        )
    intervals = pd.date_range(START, periods=DAYS * 96, freq="15min")
    rows = []
    for st in stations:
        bikes = rng.integers(0, 40, size=len(intervals))
        docks = 40 - bikes
        for ts, b, d in zip(intervals, bikes, docks):
            rows.append(
                {
                    **st,
                    "time_interval": ts,
                    "available_bikes": int(b),
                    "available_docks": int(d),
                }
            )
    df = pd.DataFrame(rows)

    # blocky weather status: per (zip, day), one of observed/predicted/null
    def status_for(z: str, day: int) -> str | None:
        r = (ZIPS.index(z) * 31 + day * 7) % 10
        if r < 5:
            return "observed"
        if r < 6:
            return "predicted"
        return None

    day_idx = (df["time_interval"] - START).dt.days
    df["weather_status"] = [
        status_for(z, d) for z, d in zip(df["zip"], day_idx)
    ]
    observed = df["weather_status"] == "observed"
    n = len(df)
    for col, lo, hi in [
        ("precip_intensity", 0.0, 0.65),
        ("temperature", 44.0, 95.0),
        ("humidity", 0.0, 1.0),
        ("wind_speed", 0.0, 20.0),
        ("wind_gust", 0.0, 30.0),
        ("cloud_cover", 0.0, 1.0),
    ]:
        vals = rng.uniform(lo, hi, size=n).round(3)
        df[col] = np.where(df["weather_status"].notna(), vals, np.nan)
        df.loc[~df["weather_status"].notna(), col] = None
    df["weather_summary"] = np.where(
        df["weather_status"].notna(), "Clear", None
    )
    # predicted rows carry (bogus) predicted values — the pipeline replaces them
    return df


def weather_fix_pdf(avail: pd.DataFrame) -> pd.DataFrame:
    """Hourly patch rows covering every (zip, hour) needing repair."""
    rng = np.random.default_rng(11)
    need = avail[avail["weather_status"].isna() | (avail["weather_status"] == "predicted")]
    keys = (
        need.assign(time_hour=need["time_interval"].dt.floor("h"))[["zip", "time_hour"]]
        .drop_duplicates()
        .reset_index(drop=True)
    )
    n = len(keys)
    return pd.DataFrame(
        {
            "time_hour": keys["time_hour"],
            "precip_intensity": rng.uniform(0, 0.65, n).round(3),
            "temperature": rng.uniform(44, 95, n).round(2),
            "humidity": rng.uniform(0, 1, n).round(3),
            "wind_speed": rng.uniform(0, 20, n).round(2),
            "wind_gust": rng.uniform(0, 30, n).round(2),
            "weather_summary": "Overcast",
            "cloud_cover": rng.uniform(0, 1, n).round(3),
            "zip": keys["zip"],
            "weather_status": "observed",
        }
    )


def availability_sdf(spark):
    from citibike_analysis_spark.schemas import AVAILABILITY

    pdf = availability_pdf()
    cols = [f.name for f in AVAILABILITY.fields]
    return spark.createDataFrame(pdf[cols], schema=AVAILABILITY)


def weather_fix_sdf(spark):
    from citibike_analysis_spark.schemas import WEATHER_FIX

    pdf = weather_fix_pdf(availability_pdf())
    cols = [f.name for f in WEATHER_FIX.fields]
    return spark.createDataFrame(pdf[cols], schema=WEATHER_FIX)
