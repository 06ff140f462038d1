"""Streaming enrichment tests (SURVEY.md §2.9 rows 3-4, §2.10 U5):
dedup-within-watermark, stream-static weather join, and the
applyInPandasWithState session tracker.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from citibike_analysis_spark.streaming.enrich import (
    dedup_samples,
    join_weather,
    track_sessions,
)
from citibike_analysis_spark.streaming.ingest import read_feed_stream
from tests.test_streaming import _feed_line

BASE = datetime(2019, 5, 12, 8, 0, 0)


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"cbs_en_{k}_") for k in ("in", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _run_stream(df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_dedup_within_watermark_drops_redeliveries(spark, dirs):
    # the feed repeats a station's last report until it phones home again:
    # same (station, comm-time) arrives in two different micro-batches
    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_feed_line(72, BASE, 5) + "\n")
        f.write(_feed_line(72, BASE, 5) + "\n")  # in-batch duplicate
    with open(f"{dirs['in']}/b2.json", "w") as f:
        f.write(_feed_line(72, BASE, 5) + "\n")  # cross-batch re-delivery
        f.write(_feed_line(72, BASE + timedelta(minutes=3), 4) + "\n")
    stream = dedup_samples(read_feed_stream(spark, dirs["in"]))
    _run_stream(
        stream.select("station_id", "last_communication_time"), "dd", dirs["ckpt"]
    )
    out = spark.table("dd").collect()
    assert len(out) == 2  # one per distinct (station, comm-time)


def test_stream_static_weather_join(spark, dirs):
    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_feed_line(72, BASE.replace(minute=10), 5) + "\n")
        f.write(_feed_line(79, BASE.replace(minute=40), 2) + "\n")
    weather = spark.createDataFrame(
        [("10001", BASE, 61.2, "observed")],
        "zip string, time_hour timestamp, temperature double, weather_status string",
    )
    stream = read_feed_stream(spark, dirs["in"]).withColumn(
        "zip", F.lit("10001")
    )
    joined = join_weather(stream, weather)
    _run_stream(
        joined.select("station_id", "temperature", "weather_status"),
        "wj",
        dirs["ckpt"],
    )
    got = {r["station_id"]: r["temperature"] for r in spark.table("wj").collect()}
    # both samples fall in the 08:00 hour → both enriched
    assert got == {72: 61.2, 79: 61.2}


def test_stateful_sessions_close_on_event_time_timeout(spark, dirs):
    # station 72 goes quiet; OTHER stations keep reporting and advance
    # the watermark past 72's last-seen + gap — the timeout branch must
    # close and emit 72's session even though 72 itself never reports
    # again (idle keys must not hold state forever)
    stream = track_sessions(read_feed_stream(spark, dirs["in"]))
    q = (
        stream.writeStream.format("memory")
        .queryName("st")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .start()
    )
    try:
        with open(f"{dirs['in']}/b1.json", "w") as f:
            f.write(_feed_line(72, BASE, 5) + "\n")
        q.processAllAvailable()
        with open(f"{dirs['in']}/b2.json", "w") as f:
            f.write(_feed_line(99, BASE + timedelta(hours=4), 1) + "\n")
        q.processAllAvailable()  # watermark → 11:30, past 72's 08:30 timeout
        with open(f"{dirs['in']}/b3.json", "w") as f:
            f.write(_feed_line(99, BASE + timedelta(hours=4, minutes=1), 2) + "\n")
        q.processAllAvailable()  # timeout fires on the post-advance batch
    finally:
        q.stop()
    rows = spark.table("st").collect()
    assert [(r["station_id"], r["n_samples"]) for r in rows] == [(72, 1)]
    assert rows[0]["session_start"] == rows[0]["session_end"] == BASE


def test_stateful_sessions_close_on_gap(spark, dirs):
    # session 1: two samples 5 min apart; a sample 2h later exceeds the
    # 30-min gap, closing session 1 in-batch and opening session 2
    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_feed_line(72, BASE, 5) + "\n")
        f.write(_feed_line(72, BASE + timedelta(minutes=5), 4) + "\n")
    with open(f"{dirs['in']}/b2.json", "w") as f:
        f.write(_feed_line(72, BASE + timedelta(hours=2), 3) + "\n")
    sessions = track_sessions(read_feed_stream(spark, dirs["in"]))
    _run_stream(sessions, "ss", dirs["ckpt"])
    out = spark.table("ss").collect()
    assert len(out) == 1  # only the closed session emits
    row = out[0]
    assert row["station_id"] == 72
    assert row["session_start"] == BASE
    assert row["session_end"] == BASE + timedelta(minutes=5)
    assert row["n_samples"] == 2


def test_streaming_document_dedup_by_content(spark, dirs):
    # identical text re-delivered under a different doc_id / later ts is
    # dropped; genuinely new content passes
    import json

    from citibike_analysis_spark.streaming.enrich import dedup_documents

    def line(doc_id, ts, text):
        return json.dumps(
            {"doc_id": doc_id, "ts": ts.isoformat(sep=" "), "text": text}
        )

    with open(f"{dirs['in']}/b1.jsonl", "w") as f:
        f.write(line(1, BASE, "the same document body") + "\n")
        f.write(line(2, BASE + timedelta(minutes=1), "the same document body") + "\n")
        f.write(line(3, BASE + timedelta(minutes=2), "a different document") + "\n")
    with open(f"{dirs['in']}/b2.jsonl", "w") as f:  # cross-batch re-crawl
        f.write(line(4, BASE + timedelta(minutes=5), "the same document body") + "\n")

    schema = "doc_id LONG, ts TIMESTAMP, text STRING"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(
        dirs["in"]
    )
    out = dedup_documents(stream, "ts")
    _run_stream(out.select("doc_id", "text"), "docdd", dirs["ckpt"])
    rows = spark.table("docdd").collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 3]
    assert "_content_hash" not in spark.table("docdd").columns


def test_stream_stream_interval_join(spark, dirs):
    # both sides are live streams: each sample joins the weather row
    # whose hour covers it, across micro-batches, with bounded state
    import json
    import os

    from citibike_analysis_spark.streaming.enrich import join_weather_streams

    os.makedirs(f"{dirs['in']}/samples", exist_ok=True)
    os.makedirs(f"{dirs['in']}/weather", exist_ok=True)

    def sline(station, ts):
        return json.dumps(
            {"station_id": station, "zip": "07306",
             "last_communication_time": ts.isoformat(sep=" ")}
        )

    def wline(hour, temp):
        return json.dumps(
            {"zip": "07306", "time_hour": hour.isoformat(sep=" "), "temp": temp}
        )

    # batch 1: two samples in hour 08:00, weather for 08:00
    with open(f"{dirs['in']}/samples/b1.jsonl", "w") as f:
        f.write(sline(72, BASE + timedelta(minutes=5)) + "\n")
        f.write(sline(79, BASE + timedelta(minutes=40)) + "\n")
    with open(f"{dirs['in']}/weather/b1.jsonl", "w") as f:
        f.write(wline(BASE, 61.0) + "\n")
    # batch 2: a sample in hour 09:00 whose weather arrives in the SAME
    # run but a different file — cross-file buffering on the weather side
    with open(f"{dirs['in']}/samples/b2.jsonl", "w") as f:
        f.write(sline(72, BASE + timedelta(hours=1, minutes=10)) + "\n")
    with open(f"{dirs['in']}/weather/b2.jsonl", "w") as f:
        f.write(wline(BASE + timedelta(hours=1), 64.0) + "\n")

    samples = (
        spark.readStream.schema(
            "station_id LONG, zip STRING, last_communication_time TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .json(f"{dirs['in']}/samples")
    )
    weather = (
        spark.readStream.schema("zip STRING, time_hour TIMESTAMP, temp DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(f"{dirs['in']}/weather")
    )
    joined = join_weather_streams(samples, weather)
    _run_stream(
        joined.select("station_id", "last_communication_time", "temp"),
        "ssj",
        dirs["ckpt"],
    )
    got = {
        (r["station_id"], r["temp"]) for r in spark.table("ssj").collect()
    }
    assert got == {(72, 61.0), (79, 61.0), (72, 64.0)}


def test_streaming_scrub_redacts_and_gates(spark, dirs):
    """PII scrub + min-token gate at ingest: stateless column exprs run
    under Structured Streaming unchanged; scrub-then-dedup lands PII
    variants of the same document as ONE redacted row."""
    import json as _json

    from citibike_analysis_spark.streaming.enrich import dedup_documents, scrub_documents

    def doc_line(doc_id, ts, text):
        return _json.dumps({"doc_id": doc_id, "ts": ts, "text": text})

    body = "the quick brown fox jumps over the lazy dog again"
    with open(f"{dirs['in']}/d1.json", "w") as f:
        f.write(doc_line(0, "2019-05-12 08:00:00", f"mail a@b.io {body}") + "\n")
        f.write(doc_line(1, "2019-05-12 08:01:00", f"mail c@d.io {body}") + "\n")
        f.write(doc_line(2, "2019-05-12 08:02:00", "too short") + "\n")
    schema = "doc_id long, ts string, text string"
    stream = (
        spark.readStream.schema(schema)
        .json(dirs["in"])
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = dedup_documents(scrub_documents(stream, min_tokens=5), "ts")
    q = (
        out.writeStream.format("memory")
        .queryName("scrub")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("scrub").collect()
    # docs 0 and 1 redact to the SAME text -> one survivor; doc 2 gated out
    assert len(rows) == 1
    assert rows[0]["text"] == f"mail [EMAIL] {body}"


def test_streaming_heavy_hitters_accumulate_across_batches(spark, dirs):
    """Stateful MG across micro-batches: with capacity above the vocab
    size the lower bounds are EXACT cumulative counts, and a second
    batch updates (not resets) the state."""
    import json as _json

    from citibike_analysis_spark.streaming.sketches import track_frequent_tokens

    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 0, "text": "x x x y"}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(dirs["in"])
    out = track_frequent_tokens(stream, capacity=16, n_shards=2)
    q = (
        out.writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .option("checkpointLocation", dirs["ckpt"])
        .start()
    )
    try:
        q.processAllAvailable()
        with open(f"{dirs['in']}/b2.json", "w") as f:
            f.write(_json.dumps({"doc_id": 1, "text": "x y z"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("hh").collect()
    # latest emission per token carries the cumulative exact count
    latest = {}
    for r in rows:
        latest[r["token"]] = max(latest.get(r["token"], 0), r["count_lb"])
    assert latest == {"x": 4, "y": 2, "z": 1}
    # each token lives in exactly one shard
    shards = {}
    for r in rows:
        shards.setdefault(r["token"], set()).add(r["shard"])
    assert all(len(s) == 1 for s in shards.values())
    # exact regime: no shard ever pruned, so the sticky flag is false —
    # the signal q121's exact-regime guard asserts on
    assert all(r["pruned"] is False for r in rows)


def test_mg_pruned_flag_is_sticky_once_capacity_exceeded(spark, dirs):
    """r08 ADVICE (medium): pruning shrinks the counter set back below
    capacity, so a final-size check passes on a shard whose count_lb is
    already a strict lower bound. The sticky `pruned` flag must fire
    when the prune branch runs — and STAY set on later batches even if
    the set never exceeds capacity again."""
    import json as _json

    from citibike_analysis_spark.streaming.sketches import track_frequent_tokens

    # 5 distinct tokens into capacity 2 on one shard -> prune fires and
    # the surviving set is <= 2 (< capacity: the size check sees nothing)
    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 0, "text": "a a a b c d e"}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(dirs["in"])
    out = track_frequent_tokens(stream, capacity=2, n_shards=1)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_pruned")
        .outputMode("update")
        .option("checkpointLocation", dirs["ckpt"])
        .start()
    )
    try:
        q.processAllAvailable()
        batch1 = spark.table("hh_pruned").collect()
        assert batch1, "prune batch emitted no counters"
        assert all(r["pruned"] is True for r in batch1)
        assert len(batch1) <= 2  # pruned back under capacity: size check blind
        # a later batch that does NOT prune must still report pruned=True
        with open(f"{dirs['in']}/b2.json", "w") as f:
            f.write(_json.dumps({"doc_id": 1, "text": "a"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("hh_pruned").collect()
    assert all(r["pruned"] is True for r in rows)  # sticky across batches


def test_mg_update_unpacks_legacy_3field_state_as_pruned():
    """r09 ADVICE: the r08 `pruned` field changed the
    applyInPandasWithState state schema — a pre-change checkpoint is
    rejected by Spark's compatibility check (documented in
    track_frequent_tokens), but the update function itself must also
    read a 3-field legacy row tolerantly, and the only safe reading of
    counts with no prune history is pruned=True (lower bounds, never
    certified exact). Pure-python: fakes GroupState, no stream."""
    import pandas as pd

    from citibike_analysis_spark.streaming.sketches import _mg_update

    class FakeState:
        def __init__(self, legacy):
            self.exists = True
            self.get = legacy  # 3-field pre-r08 row: no `pruned`
            self.updated = None

        def update(self, v):
            self.updated = v

    st = FakeState((["a", "b"], [3, 1], 4))
    out = list(
        _mg_update(capacity=64)(
            (0,), iter([pd.DataFrame({"token": ["a"]})]), st
        )
    )
    assert len(out) == 1
    emitted = out[0]
    assert set(emitted["pruned"]) == {True}  # conservative: unknown history
    assert dict(zip(emitted["token"], emitted["count_lb"])) == {"a": 4, "b": 1}
    # and the re-written state carries the sticky flag forward
    assert st.updated[3] is True


def test_late_in_watermark_sample_extends_session_start(spark, dirs):
    """r04 review: a sample arriving in a LATER micro-batch with an
    event time within gap BEFORE the open session's start must extend
    the start backward (the batch sessionize answer) — the old loop
    absorbed it into n without moving start."""
    stream = track_sessions(read_feed_stream(spark, dirs["in"]))
    q = (
        stream.writeStream.format("memory")
        .queryName("ls")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .start()
    )
    try:
        with open(f"{dirs['in']}/b1.json", "w") as f:
            f.write(_feed_line(72, BASE, 5) + "\n")
        q.processAllAvailable()
        with open(f"{dirs['in']}/b2.json", "w") as f:
            # 10 min EARLIER than the open session's start, within the
            # 30-min watermark and gap: extends start to 07:50
            f.write(_feed_line(72, BASE - timedelta(minutes=10), 6) + "\n")
        q.processAllAvailable()
        with open(f"{dirs['in']}/b3.json", "w") as f:
            # out-of-gap sample closes the (extended) session
            f.write(_feed_line(72, BASE + timedelta(hours=2), 3) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("ls").collect()
    assert len(out) == 1
    row = out[0]
    assert row["session_start"] == BASE - timedelta(minutes=10)
    assert row["session_end"] == BASE
    assert row["n_samples"] == 2


def test_track_sessions_survives_null_event_time(spark, dirs):
    # review finding: a feed row with a missing/null lastCommunicationTime
    # reached the stateful fn as NaT (the late-data predicate is NULL →
    # kept), poisoned the interval merge, and crashed the micro-batch —
    # a crash-LOOP, since restart replays the same offsets
    import json as _json
    import os

    os.makedirs(f"{dirs['in']}", exist_ok=True)
    with open(f"{dirs['in']}/b1.json", "w") as f:
        f.write(_feed_line(72, BASE, 5) + "\n")
        f.write(_feed_line(72, BASE + timedelta(minutes=5), 6) + "\n")
        # station that never phoned home: no lastCommunicationTime at all
        f.write(_json.dumps({"id": 73, "stationName": "S73",
                             "availableBikes": 1, "availableDocks": 1,
                             "totalDocks": 2, "statusValue": "In Service",
                             "statusKey": 1, "latitude": 40.7,
                             "longitude": -74.0, "testStation": False}) + "\n")
    with open(f"{dirs['in']}/b2.json", "w") as f:
        # a much-later report advances the watermark past 72's gap
        f.write(_feed_line(99, BASE + timedelta(hours=3), 2) + "\n")

    sessions = track_sessions(read_feed_stream(spark, dirs["in"]))
    _run_stream(sessions, "nat_sessions", dirs["ckpt"])
    got = {
        r["station_id"]: (r["session_start"], r["session_end"], r["n_samples"])
        for r in spark.table("nat_sessions").collect()
    }
    assert got[72] == (BASE, BASE + timedelta(minutes=5), 2)
    assert 73 not in got  # the null-ts row carries no session info


def test_stream_stream_join_keeps_samples_when_weather_hour_missing(spark, dirs):
    # review finding: the inner stream-stream join silently dropped every
    # sample in an hour whose weather row never arrived — whole hours of
    # station data vanishing during a weather outage; LEFT OUTER emits
    # them null-padded once both watermarks pass the hour
    import json
    import os

    from citibike_analysis_spark.streaming.enrich import join_weather_streams

    os.makedirs(f"{dirs['in']}/samples", exist_ok=True)
    os.makedirs(f"{dirs['in']}/weather", exist_ok=True)

    def sline(station, ts):
        return json.dumps(
            {"station_id": station, "zip": "07306",
             "last_communication_time": ts.isoformat(sep=" ")}
        )

    def wline(hour, temp):
        return json.dumps(
            {"zip": "07306", "time_hour": hour.isoformat(sep=" "), "temp": temp}
        )

    with open(f"{dirs['in']}/samples/b1.jsonl", "w") as f:
        f.write(sline(72, BASE + timedelta(minutes=5)) + "\n")       # hour 08: matched
        f.write(sline(79, BASE + timedelta(hours=1, minutes=10)) + "\n")  # hour 09: NO weather
    with open(f"{dirs['in']}/weather/b1.jsonl", "w") as f:
        f.write(wline(BASE, 61.0) + "\n")
    # later events on BOTH sides push both watermarks far past hour 09,
    # forcing the unmatched hour-09 sample to emit null-padded
    with open(f"{dirs['in']}/samples/b2.jsonl", "w") as f:
        f.write(sline(88, BASE + timedelta(hours=9)) + "\n")
    with open(f"{dirs['in']}/weather/b2.jsonl", "w") as f:
        f.write(wline(BASE + timedelta(hours=9), 70.0) + "\n")

    samples = (
        spark.readStream.schema(
            "station_id LONG, zip STRING, last_communication_time TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .json(f"{dirs['in']}/samples")
    )
    weather = (
        spark.readStream.schema("zip STRING, time_hour TIMESTAMP, temp DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(f"{dirs['in']}/weather")
    )
    joined = join_weather_streams(samples, weather)
    _run_stream(
        joined.select("station_id", "last_communication_time", "temp"),
        "ssj_outer",
        dirs["ckpt"],
    )
    got = {r["station_id"]: r["temp"] for r in spark.table("ssj_outer").collect()}
    assert got[72] == 61.0
    assert 79 in got and got[79] is None  # dropped entirely pre-fix
