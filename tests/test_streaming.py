"""Streaming tests (SURVEY.md §5.2.5): micro-batch rollup correctness,
late-data handling via watermark, checkpoint resume, and the feed
flatten (12-hour timestamp format).
"""

from __future__ import annotations

import json
import shutil
import tempfile
from datetime import datetime, timedelta

import pytest

from citibike_analysis_spark.streaming.ingest import flatten_feed, read_feed_stream
from citibike_analysis_spark.streaming.rollup import (
    availability_rollup,
    latest_rollup,
    upsert_station_dimension,
    write_rollup,
)

BASE = datetime(2019, 5, 12, 8, 0, 0)


def _feed_line(station_id: int, ts: datetime, bikes: int, docks: int = 30) -> str:
    # 12-hour clock format as the real feed emits (reference README.md:94)
    return json.dumps(
        {
            "id": station_id,
            "stationName": f"S{station_id}",
            "availableBikes": bikes,
            "availableDocks": docks,
            "totalDocks": bikes + docks,
            "statusValue": "In Service",
            "statusKey": 1,
            "latitude": 40.7,
            "longitude": -74.0,
            "testStation": False,
            "lastCommunicationTime": ts.strftime("%Y-%m-%d %I:%M:%S %p"),
        }
    )


def test_flatten_feed_parses_12h_timestamps(spark):
    raw = spark.createDataFrame(
        [(_feed_line(72, BASE.replace(hour=20, minute=38, second=21), 5),)], ["value"]
    )
    flat = flatten_feed(raw)
    row = flat.select("station_id", "available_bikes", "last_communication_time").first()
    assert row["station_id"] == 72
    assert row["available_bikes"] == 5
    assert row["last_communication_time"] == datetime(2019, 5, 12, 20, 38, 21)


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"cbs_{k}_") for k in ("in", "ckpt", "out", "snap")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_rollup_min_over_interval_and_resume(spark, dirs):
    # batch 1: two samples in the 08:00 interval for station 72 —
    # docks differ too, pinning the min-on-both-measures contract
    # (r04 review: docks briefly rolled up as max, silently
    # undercounting the docks=0 replenishment signal)
    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_feed_line(72, BASE + timedelta(minutes=1), 7, docks=0) + "\n")
        f.write(_feed_line(72, BASE + timedelta(minutes=4), 3, docks=27) + "\n")

    stream = read_feed_stream(spark, dirs["in"])
    q = write_rollup(availability_rollup(stream), dirs["ckpt"], dirs["out"], "r1")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = latest_rollup(spark, dirs["out"])
    row = state.filter("station_id = 72").collect()[0]
    assert row["time_interval"] == BASE
    assert row["available_bikes"] == 3  # min over the 3-min samples
    assert row["available_docks"] == 0  # min: the replenishment signal survives
    assert row["n_samples"] == 2

    # restart from the same checkpoint with one more (lower) sample:
    # state resumes — the interval min updates without a full replay
    with open(f"{dirs['in']}/b2.json", "w") as f:
        f.write(_feed_line(72, BASE + timedelta(minutes=9), 1) + "\n")
    stream2 = read_feed_stream(spark, dirs["in"])
    q2 = write_rollup(availability_rollup(stream2), dirs["ckpt"], dirs["out"], "r2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    state = latest_rollup(spark, dirs["out"])
    row = state.filter("station_id = 72").collect()[0]
    assert row["available_bikes"] == 1
    assert row["n_samples"] == 3  # resumed state: 2 prior samples + 1 new


def test_watermark_drops_very_late_rows(spark, dirs):
    # stage arrivals while the query runs (pre-existing files can be
    # batched in arbitrary order): first 08:00, then 10:00 to advance the
    # watermark to 09:30, then a >30min-late 08:01 row that must be dropped
    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_feed_line(72, BASE, 9) + "\n")
    stream = read_feed_stream(spark, dirs["in"], max_files_per_trigger=1)
    q = write_rollup(availability_rollup(stream), dirs["ckpt"], dirs["out"], "rwm")
    try:
        q.processAllAvailable()
        with open(f"{dirs['in']}/b2.json", "w") as f:
            f.write(_feed_line(72, BASE + timedelta(hours=2), 8) + "\n")
        q.processAllAvailable()
        with open(f"{dirs['in']}/b3.json", "w") as f:
            f.write(_feed_line(72, BASE + timedelta(minutes=1), 0) + "\n")  # late
        q.processAllAvailable()
    finally:
        q.stop()
    state = latest_rollup(spark, dirs["out"])
    by_interval = {r["time_interval"]: r["available_bikes"] for r in state.collect()}
    # the late 0-bike sample must NOT have lowered the closed 08:00 window
    assert by_interval[BASE] == 9
    assert by_interval[BASE + timedelta(hours=2)] == 8


def test_station_dimension_upsert_idempotent(spark, dirs):
    b1 = flatten_feed(
        spark.createDataFrame(
            [
                (_feed_line(72, BASE, 5),),
                (_feed_line(72, BASE + timedelta(minutes=3), 7),),
                (_feed_line(79, BASE, 2),),
            ],
            ["value"],
        )
    )
    upsert_station_dimension(b1, dirs["snap"])
    snap = spark.read.parquet(dirs["snap"])
    assert snap.count() == 2  # one row per station
    assert snap.filter("station_id = 72").first()["available_bikes"] == 7  # latest wins

    # replay the same batch: converges (idempotent)
    upsert_station_dimension(b1, dirs["snap"])
    assert spark.read.parquet(dirs["snap"]).count() == 2

    # later batch updates in place
    b2 = flatten_feed(
        spark.createDataFrame(
            [(_feed_line(79, BASE + timedelta(minutes=6), 11),)], ["value"]
        )
    )
    upsert_station_dimension(b2, dirs["snap"])
    snap = spark.read.parquet(dirs["snap"])
    assert snap.count() == 2
    assert snap.filter("station_id = 79").first()["available_bikes"] == 11


def test_stations_flat_schema_matches_flatten_feed_output(spark):
    # review finding: the registry schema for landed flatten_feed output
    # declared a nonexistent station_status column and a LongType id —
    # readers following the declared-schema rule got an all-NULL column
    # and a parquet int32-vs-long type rejection
    from citibike_analysis_spark.schemas import STATIONS_FLAT
    from citibike_analysis_spark.streaming.ingest import flatten_feed

    raw = spark.createDataFrame(
        [(_feed_line(72, datetime(2019, 5, 12, 8, 0, 0), 5),)], "value string"
    )
    out_types = dict(flatten_feed(raw).dtypes)
    for f in STATIONS_FLAT.fields:
        assert f.name in out_types, f.name
        assert out_types[f.name] == f.dataType.simpleString(), f.name
