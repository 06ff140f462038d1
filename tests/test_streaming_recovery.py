"""Crash-recovery integration tests (SURVEY.md §5.2.5, VERDICT r02 #8).

Two landing chains, each killed MID-SINK by an injected failure and
restarted from its checkpoint, then compared against an uninterrupted
run of the same data — the exactly-once contract a 100 TB ingest
pipeline actually needs (foreachBatch is at-least-once; convergence
must come from idempotent sinks + checkpoint replay):

- stations: feed → flatten → availability rollup changelog, plus the
  dimension upsert query; crash thrown inside the upsert sink AFTER the
  rollup query committed its batch.
- documents: scrub (PII redact + min-token gate) → dedup-within-
  watermark → per-epoch overwrite landing; crash thrown AFTER the
  epoch's files were written but BEFORE Spark committed the offset, so
  the restart MUST replay the epoch and the overwrite MUST make that
  replay invisible.

Plus unit coverage of the snapshot swap's crash windows
(``_recover_snapshot``): promote a complete staging write, fall back to
the renamed-aside previous snapshot, never promote a partial staging,
and clear stale leftovers.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from datetime import datetime, timedelta

import pytest

from citibike_analysis_spark.streaming.enrich import dedup_documents, scrub_documents
from citibike_analysis_spark.streaming.ingest import flatten_feed, read_feed_stream
from citibike_analysis_spark.streaming.rollup import (
    _recover_snapshot,
    availability_rollup,
    latest_rollup,
    upsert_station_dimension,
    write_rollup,
)

BASE = datetime(2019, 5, 12, 8, 0, 0)


def _feed_line(station_id: int, ts: datetime, bikes: int, docks: int = 30) -> str:
    return json.dumps(
        {
            "id": station_id,
            "stationName": f"S{station_id}",
            "availableBikes": bikes,
            "availableDocks": docks,
            "statusValue": "In Service",
            "lastCommunicationTime": ts.strftime("%Y-%m-%d %I:%M:%S %p"),
        }
    )


@pytest.fixture()
def dirs():
    keys = ("in", "ckpt_a", "ckpt_b", "out", "snap", "in2", "ckpt2", "out2", "snap2", "land", "ckpt_d", "flag")
    d = {k: tempfile.mkdtemp(prefix=f"cbs_rec_{k}_") for k in keys}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _run_dimension_query(spark, in_dir, ckpt, snap, crash_flag: str | None):
    """Dimension-upsert stream; if ``crash_flag`` names a missing file,
    epoch 1's sink raises AFTER batch receipt (then drops the flag so the
    restarted query's replay of epoch 1 succeeds)."""

    def sink(batch, epoch_id):
        if batch.isEmpty():
            return
        if crash_flag is not None and epoch_id >= 1 and not os.path.exists(crash_flag):
            with open(crash_flag, "w") as f:
                f.write("crashed")
            raise RuntimeError("injected crash: dimension sink, epoch 1")
        upsert_station_dimension(batch, snap)

    stream = read_feed_stream(spark, in_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )


def _station_state(spark, out_dir, snap_dir):
    roll = sorted(
        (r["time_interval"], r["station_id"], r["available_bikes"], r["n_samples"])
        for r in latest_rollup(spark, out_dir).collect()
    )
    snap = sorted(
        (r["station_id"], r["available_bikes"], r["available_docks"])
        for r in spark.read.parquet(snap_dir).collect()
    )
    return roll, snap


def _drive_station_pipeline(spark, in_dir, ckpt_a, ckpt_b, out, snap, crash: bool, flag_dir: str):
    """Write two feed files, run rollup + dimension queries over both,
    optionally crashing the dimension sink on epoch 1 and restarting."""
    with open(f"{in_dir}/b1.json", "w") as f:
        f.write(_feed_line(72, BASE + timedelta(minutes=1), 7) + "\n")
        f.write(_feed_line(79, BASE + timedelta(minutes=2), 4) + "\n")

    qa = write_rollup(
        availability_rollup(read_feed_stream(spark, in_dir)), ckpt_a, out, "rec_a"
    )
    flag = os.path.join(flag_dir, "crashed.flag") if crash else None
    qb = _run_dimension_query(spark, in_dir, ckpt_b, snap, flag)
    try:
        qa.processAllAvailable()
        qb.processAllAvailable()

        with open(f"{in_dir}/b2.json", "w") as f:
            f.write(_feed_line(72, BASE + timedelta(minutes=16), 2) + "\n")
            f.write(_feed_line(79, BASE + timedelta(minutes=17), 9) + "\n")

        qa.processAllAvailable()  # rollup commits batch 1 before the crash
        if crash:
            with pytest.raises(Exception, match="injected crash"):
                qb.processAllAvailable()
                qb.awaitTermination()
        else:
            qb.processAllAvailable()
    finally:
        qa.stop()
        qb.stop()

    if crash:
        assert os.path.exists(flag)
        # restart ONLY the crashed query from its checkpoint: epoch 1 is
        # uncommitted, so the engine must replay it into the sink
        qb2 = _run_dimension_query(spark, in_dir, ckpt_b, snap, flag)
        try:
            qb2.processAllAvailable()
        finally:
            qb2.stop()


def test_station_landing_crash_recovery(spark, dirs):
    _drive_station_pipeline(
        spark, dirs["in"], dirs["ckpt_a"], dirs["ckpt_b"], dirs["out"], dirs["snap"],
        crash=True, flag_dir=dirs["flag"],
    )
    crashed = _station_state(spark, dirs["out"], dirs["snap"])

    _drive_station_pipeline(
        spark, dirs["in2"], dirs["ckpt2"], tempfile.mkdtemp(), dirs["out2"], dirs["snap2"],
        crash=False, flag_dir=dirs["flag"],
    )
    clean = _station_state(spark, dirs["out2"], dirs["snap2"])

    assert crashed == clean  # exactly-once: crash+restart ≡ uninterrupted
    # and the recovered state is the expected one, not just self-consistent
    snap_rows = dict((sid, bikes) for sid, bikes, _ in crashed[1])
    assert snap_rows == {72: 2, 79: 9}


DOC_SCHEMA = "doc_id long, ts timestamp, text string"


def _doc_line(doc_id: int, ts: datetime, text: str) -> str:
    return json.dumps({"doc_id": doc_id, "ts": ts.isoformat(sep=" "), "text": text})


def _run_doc_landing(spark, in_dir, ckpt, land, crash_flag: str | None):
    """scrub → dedup-within-watermark → idempotent per-epoch landing.

    The sink writes ``land/epoch=N`` with mode=overwrite BEFORE the
    injected crash, so the replay after restart overwrites the same
    directory — duplication is structurally impossible, which is the
    exactly-once recipe for file sinks under at-least-once foreachBatch.
    """

    def sink(batch, epoch_id):
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(os.path.join(land, f"epoch={epoch_id}"))
        if crash_flag is not None and epoch_id >= 1 and not os.path.exists(crash_flag):
            with open(crash_flag, "w") as f:
                f.write("crashed")
            raise RuntimeError("injected crash: landing sink, epoch 1")

    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    landed = dedup_documents(scrub_documents(docs, min_tokens=5), ts_col="ts")
    return (
        landed.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )


LONG = "the quick brown fox jumps over the lazy dog near the riverbank today"
PII = "contact me at jane.doe@example.com or 555-123-4567 about the delivery schedule"


def test_scrub_dedup_landing_crash_recovery(spark, dirs):
    with open(f"{dirs['in']}/d1.json", "w") as f:
        f.write(_doc_line(1, BASE, LONG) + "\n")
        f.write(_doc_line(2, BASE + timedelta(minutes=1), PII) + "\n")
        f.write(_doc_line(3, BASE + timedelta(minutes=2), "too short") + "\n")

    flag = os.path.join(dirs["flag"], "doc.flag")
    q = _run_doc_landing(spark, dirs["in"], dirs["ckpt_d"], dirs["land"], flag)
    try:
        q.processAllAvailable()
        # epoch 1: a re-delivery of doc 1 (must dedup) + one new doc
        with open(f"{dirs['in']}/d2.json", "w") as f:
            f.write(_doc_line(4, BASE + timedelta(minutes=3), LONG) + "\n")  # dup content
            f.write(_doc_line(5, BASE + timedelta(minutes=4), LONG + " extended") + "\n")
        with pytest.raises(Exception, match="injected crash"):
            q.processAllAvailable()
            q.awaitTermination()
    finally:
        q.stop()

    # the crash landed epoch 1's files but never committed the offset —
    # restart replays epoch 1 (same epoch id, overwrite) AND must replay
    # the dedup state: doc 4 stays dropped because doc 1's hash is in the
    # checkpointed state store, not just in driver memory
    q2 = _run_doc_landing(spark, dirs["in"], dirs["ckpt_d"], dirs["land"], flag)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.option("basePath", dirs["land"]).parquet(dirs["land"]).collect()
    by_id = {r["doc_id"]: r["text"] for r in rows}
    assert sorted(by_id) == [1, 2, 5]  # 3 gated, 4 deduped, no duplicates
    assert "jane.doe@example.com" not in by_id[2]  # scrub happened pre-landing
    assert "555-123-4567" not in by_id[2]


# --------------------------------------------------------------------------
# snapshot swap crash windows (unit)
# --------------------------------------------------------------------------

def _write_snap(spark, path, rows):
    spark.createDataFrame(rows, "station_id long, v long").write.mode(
        "overwrite"
    ).parquet(path)


def test_recover_promotes_complete_staging(spark, dirs):
    base = os.path.join(dirs["snap"], "dim")
    _write_snap(spark, base + "__staging", [(1, 10)])  # has _SUCCESS
    _write_snap(spark, base + "__old", [(1, 9)])
    _recover_snapshot(spark, base)
    assert [r["v"] for r in spark.read.parquet(base).collect()] == [10]
    assert not os.path.exists(base + "__old")  # cleaned up


def test_recover_falls_back_to_old_when_staging_partial(spark, dirs):
    base = os.path.join(dirs["snap"], "dim")
    _write_snap(spark, base + "__staging", [(1, 10)])
    os.remove(os.path.join(base + "__staging", "_SUCCESS"))  # partial write
    _write_snap(spark, base + "__old", [(1, 9)])
    _recover_snapshot(spark, base)
    assert [r["v"] for r in spark.read.parquet(base).collect()] == [9]


def test_recover_noop_when_live_exists(spark, dirs):
    base = os.path.join(dirs["snap"], "dim")
    _write_snap(spark, base, [(1, 11)])
    _write_snap(spark, base + "__old", [(1, 9)])  # stale leftover
    _recover_snapshot(spark, base)
    assert [r["v"] for r in spark.read.parquet(base).collect()] == [11]
    assert not os.path.exists(base + "__old")


def test_upsert_survives_missing_live_snapshot(spark, dirs):
    """End-to-end: simulate a crash that lost the live dir mid-swap, then
    run a normal upsert — it must recover the previous snapshot and merge
    onto it rather than rebuilding from the current batch alone."""
    base = os.path.join(dirs["snap"], "dim")
    b1 = flatten_feed(
        spark.createDataFrame(
            [(_feed_line(72, BASE, 5),), (_feed_line(79, BASE, 2),)], ["value"]
        )
    )
    upsert_station_dimension(b1, base)
    # crash window: live dir renamed aside, new one never arrived
    os.rename(base, base + "__old")
    b2 = flatten_feed(
        spark.createDataFrame(
            [(_feed_line(79, BASE + timedelta(minutes=3), 8),)], ["value"]
        )
    )
    upsert_station_dimension(b2, base)
    snap = {r["station_id"]: r["available_bikes"] for r in spark.read.parquet(base).collect()}
    assert snap == {72: 5, 79: 8}  # station 72 survived via __old recovery


def test_admit_novel_documents_against_corpus(spark, dirs):
    """Stream-static admission: corpus hashes filter the stream, repeats
    within the stream dedup via watermark state, and a corpus grown
    between restarts is honored on the next run."""
    from pyspark.sql import functions as F

    from citibike_analysis_spark.streaming.enrich import admit_novel_documents

    corpus_path = os.path.join(dirs["snap"], "corpus")
    # land a corpus with one known document hash
    spark.createDataFrame([(LONG,)], "text string").select(
        F.md5("text").alias("content_hash")
    ).write.parquet(corpus_path)

    with open(f"{dirs['in']}/d1.json", "w") as f:
        f.write(_doc_line(1, BASE, LONG) + "\n")               # in corpus -> dropped
        f.write(_doc_line(2, BASE + timedelta(minutes=1), LONG + " two") + "\n")  # novel
        f.write(_doc_line(3, BASE + timedelta(minutes=2), LONG + " two") + "\n")  # stream repeat
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(dirs["in"])
    )
    admitted = admit_novel_documents(docs, corpus_path, ts_col="ts")
    land = os.path.join(dirs["land"], "novel")

    def sink(batch, epoch_id):
        if not batch.isEmpty():
            batch.write.mode("overwrite").parquet(
                os.path.join(land, f"epoch={epoch_id}")
            )

    q = (
        admitted.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", dirs["ckpt_d"])
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.option("basePath", land).parquet(land).collect()
    assert sorted(r["doc_id"] for r in rows) == [2]  # 1 corpus-dup, 3 stream-dup

    # corpus grows (doc 2's hash lands); restart admits only truly new docs
    spark.createDataFrame([(LONG + " two",)], "text string").select(
        F.md5("text").alias("content_hash")
    ).write.mode("append").parquet(corpus_path)
    with open(f"{dirs['in']}/d2.json", "w") as f:
        f.write(_doc_line(4, BASE + timedelta(minutes=30), LONG + " two") + "\n")  # now in corpus
        f.write(_doc_line(5, BASE + timedelta(minutes=31), LONG + " three") + "\n")  # novel
    docs2 = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(dirs["in"])
    )
    q2 = (
        admit_novel_documents(docs2, corpus_path, ts_col="ts")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", dirs["ckpt_d"])
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = spark.read.option("basePath", land).parquet(land).collect()
    assert sorted(r["doc_id"] for r in rows) == [2, 5]


def test_start_admission_picks_up_corpus_growth_without_restart(spark, dirs):
    """r03 VERDICT #8 / ADVICE: the foreachBatch admission re-resolves
    the corpus per micro-batch, so a hash landed by a concurrent job
    starts filtering from the NEXT micro-batch of the SAME running
    query — the continuous-pickup contract the plain stream-static form
    only honors on restart (plan-time file listing)."""
    from pyspark.sql import functions as F

    from citibike_analysis_spark.streaming.enrich import start_admission

    corpus_path = os.path.join(dirs["snap2"], "corpus")
    land = os.path.join(dirs["land"], "live")
    with open(f"{dirs['in2']}/d1.json", "w") as f:
        f.write(_doc_line(1, BASE, LONG) + "\n")  # no corpus yet -> admitted
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(dirs["in2"])
    )

    def sink(batch, epoch_id):
        if not batch.isEmpty():
            batch.write.mode("overwrite").parquet(
                os.path.join(land, f"epoch={epoch_id}")
            )

    q = start_admission(
        docs, corpus_path, sink, ts_col="ts", checkpoint_dir=dirs["ckpt2"]
    )
    try:
        q.processAllAvailable()
        # corpus lands a new hash while the query is RUNNING ...
        spark.createDataFrame([(LONG + " two",)], "text string").select(
            F.md5("text").alias("content_hash")
        ).write.parquet(corpus_path)
        with open(f"{dirs['in2']}/d2.json", "w") as f:
            # ... and filters the very next micro-batch, no restart
            f.write(_doc_line(2, BASE + timedelta(minutes=40), LONG + " two") + "\n")
            f.write(_doc_line(3, BASE + timedelta(minutes=41), LONG + " three") + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.option("basePath", land).parquet(land).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 3]


def test_start_admission_fails_batch_when_seen_corpus_vanishes(spark, dirs):
    """r04 review: once a corpus has been observed, an absent/unreadable
    corpus read must FAIL the micro-batch (Spark retries) instead of
    silently admitting known duplicates batch after batch (the
    admit-everything fallthrough is for first deployment only)."""
    import shutil

    from pyspark.errors import StreamingQueryException
    from pyspark.sql import functions as F

    from citibike_analysis_spark.streaming.enrich import start_admission

    corpus_path = os.path.join(dirs["snap2"], "corpus_v")
    land = os.path.join(dirs["land"], "vanish")
    spark.createDataFrame([(LONG,)], "text string").select(
        F.md5("text").alias("content_hash")
    ).write.parquet(corpus_path)
    with open(f"{dirs['in2']}/d1.json", "w") as f:
        f.write(_doc_line(1, BASE, LONG + " novel") + "\n")
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(dirs["in2"])
    )

    def sink(batch, epoch_id):
        if not batch.isEmpty():
            batch.write.mode("overwrite").parquet(
                os.path.join(land, f"epoch={epoch_id}")
            )

    q = start_admission(
        docs, corpus_path, sink, ts_col="ts", checkpoint_dir=dirs["ckpt2"]
    )
    try:
        q.processAllAvailable()  # corpus observed
        shutil.rmtree(corpus_path)  # compaction gone wrong / removed
        with open(f"{dirs['in2']}/d2.json", "w") as f:
            f.write(_doc_line(2, BASE + timedelta(minutes=1), LONG) + "\n")
        with pytest.raises(StreamingQueryException, match="absent/empty"):
            q.processAllAvailable()
            q.awaitTermination(30)
    finally:
        q.stop()
    rows = spark.read.option("basePath", land).parquet(land).collect()
    assert sorted(r["doc_id"] for r in rows) == [1]  # doc 2 never landed


def test_start_admission_seen_posture_survives_restart(spark, dirs):
    """r04 ADVICE: the 'corpus was seen → absent read must fail' posture
    used to live in driver memory only, so a crash-restart during a
    corpus outage silently re-admitted known duplicates. With a
    checkpoint configured, the fact is durable (a marker in the
    checkpoint dir): the RESTARTED query must still fail the batch."""
    import shutil

    from pyspark.errors import StreamingQueryException
    from pyspark.sql import functions as F

    from citibike_analysis_spark.streaming.enrich import start_admission

    corpus_path = os.path.join(dirs["snap2"], "corpus_r")
    land = os.path.join(dirs["land"], "restart")
    spark.createDataFrame([(LONG,)], "text string").select(
        F.md5("text").alias("content_hash")
    ).write.parquet(corpus_path)
    with open(f"{dirs['in2']}/d1.json", "w") as f:
        f.write(_doc_line(1, BASE, LONG + " novel") + "\n")

    def mk_docs():
        return (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(dirs["in2"])
        )

    def sink(batch, epoch_id):
        if not batch.isEmpty():
            batch.write.mode("overwrite").parquet(
                os.path.join(land, f"epoch={epoch_id}")
            )

    q = start_admission(
        mk_docs(), corpus_path, sink, ts_col="ts", checkpoint_dir=dirs["ckpt2"]
    )
    try:
        q.processAllAvailable()  # corpus observed; marker persisted
    finally:
        q.stop()

    shutil.rmtree(corpus_path)  # outage while the query is DOWN
    with open(f"{dirs['in2']}/d2.json", "w") as f:
        f.write(_doc_line(2, BASE + timedelta(minutes=1), LONG) + "\n")
    q2 = start_admission(
        mk_docs(), corpus_path, sink, ts_col="ts", checkpoint_dir=dirs["ckpt2"]
    )
    try:
        with pytest.raises(StreamingQueryException, match="absent/empty"):
            q2.processAllAvailable()
            q2.awaitTermination(30)
    finally:
        q2.stop()
    rows = spark.read.option("basePath", land).parquet(land).collect()
    assert sorted(r["doc_id"] for r in rows) == [1]  # the known dup never landed


@pytest.mark.parametrize(
    "query",
    [
        # the three state-encoding classes the RocksDB posture claims
        # (r07 verdict softened the claim to the one pinned class; r08
        # task #4 pins all three):
        # - dropDuplicatesWithinWatermark hash state (state-heaviest)
        "q129_streaming_dedup_replay",
        # - applyInPandasWithState session maps — the API whose state
        #   encoding differs MOST across providers (Arrow-serialized
        #   user state rows, not SQL-codegen'd aggregate buffers)
        "q120_streaming_sessions_replay",
        # - dual-watermark stream-stream join state (two keyed buffers
        #   + the join's range condition bookkeeping)
        "q123_streaming_weather_join_replay",
    ],
)
def test_rocksdb_state_store_provider_is_a_drop_in(spark, query):
    """The default HDFSBacked state store keeps streaming state ON THE
    JVM HEAP — fine for the audit fixtures, but the 100 TB posture for
    large state (millions of in-watermark dedup hashes, wide session
    maps) is Spark's RocksDB provider: off-heap, spill-to-disk,
    incremental checkpoints. providerClass is a runtime SQL conf read
    at QUERY start, so it is a pure deployment knob — this pins that
    each stateful replay class produces the IDENTICAL driver-verified
    result under RocksDB, i.e. the swap needs no code change anywhere."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from tests.oracle import compare, run_oracle

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        d = E.queries()[query](spark, "/root/testdata/sf0.001")
        cols, rows = run_oracle(E.oracle_sql()[query], "/root/testdata/sf0.001")
        assert not compare(d, cols, rows)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# --------------------------------------------------------------------------
# r14 (r13 verdict #1): streaming ANN index maintenance under crash +
# replay — the composition of the streaming tier and the persisted
# index lifecycle. The crash is injected AFTER an epoch's append
# committed but BEFORE Spark committed the offset (and before the PQ
# refresh ran), so the restart MUST replay the epoch; convergence has
# to come from the sink's id anti-join (exactly-once: nothing
# re-appends) and from the replay path re-running refresh_pq_codes
# (the torn append-without-refresh heals).
# --------------------------------------------------------------------------

EMB_SF = "/root/testdata/sf0.01"


def _write_emb_batches(spark, odd, in_dir, n_batches):
    import pyarrow as pa

    from citibike_analysis_spark.plans.relational import _write_replay_batches

    schema = pa.schema(
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
        ]
    )
    _write_replay_batches(
        odd.select("vec_id", "embedding"), in_dir, n_batches, schema, ["vec_id"]
    )


def test_index_maintenance_crash_replay_converges(spark, dirs, monkeypatch):
    """Kill the maintenance stream after epoch 1's lists append
    committed (offset uncommitted, codes un-refreshed), restart from
    the checkpoint: the replayed epoch must append NOTHING (anti-join
    exactly-once — verified through the monitoring seam's n_novel=0),
    must still heal the codes sibling, and the final index must equal
    a one-shot build over the same rows: probe parity, id-level audit
    clean, count caches exact."""
    import pyspark.sql.functions as F

    import citibike_analysis_spark.operators.similarity as sim
    from citibike_analysis_spark.operators.pq import (
        _IVFPQ_NCODES_PROP,
        attach_pq_codes,
        ivfpq_topk,
        verify_ivfpq_consistency,
    )
    from citibike_analysis_spark.operators.similarity import (
        _IVF_NROWS_PROP,
        build_ivf_index,
    )
    from citibike_analysis_spark.sources.tables import load_table
    from citibike_analysis_spark.streaming.ann import start_index_maintenance

    emb = load_table(spark, EMB_SF, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    train = even.select("vec_id", "embedding")
    t, ref = "ann_maint_crash_idx", "ann_maint_crash_ref"
    flag = os.path.join(dirs["flag"], "append_crash.flag")
    real_append = sim.append_to_ivf_index

    def torn_append(batch, table, **kw):
        out = real_append(batch, table, **kw)
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("crashed")
            raise RuntimeError("injected crash: after index append")
        return out

    try:
        build_ivf_index(emb, ref, nlist=8, train_iters=2, train_on=even)
        attach_pq_codes(spark, ref, m=8, ksub=16, train_iters=2, train_on=train)
        build_ivf_index(even, t, nlist=8, train_iters=2, train_on=even)
        attach_pq_codes(spark, t, m=8, ksub=16, train_iters=2, train_on=train)
        _write_emb_batches(spark, odd, dirs["in"], 2)

        def make_stream():
            return (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .parquet(dirs["in"])
            )

        seen_crashed: list[dict] = []
        monkeypatch.setattr(sim, "append_to_ivf_index", torn_append)
        q = start_index_maintenance(
            make_stream(), t, dirs["ckpt_a"], on_batch=seen_crashed.append
        )
        with pytest.raises(Exception, match="injected crash"):
            try:
                q.processAllAvailable()
                q.awaitTermination()
            finally:
                q.stop()
        assert os.path.exists(flag)
        # the crashed epoch never reached on_batch: its append landed
        # but neither refresh nor the seam ran
        monkeypatch.setattr(sim, "append_to_ivf_index", real_append)

        seen_resumed: list[dict] = []
        q2 = start_index_maintenance(
            make_stream(), t, dirs["ckpt_a"], on_batch=seen_resumed.append
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        # replayed epoch visible in the monitoring seam: rows arrived,
        # nothing novel, and the heal refresh ran for its rows
        replayed = [
            s
            for s in seen_resumed
            if s["n_batch_rows"] > 0 and s["n_novel"] == 0
        ]
        assert replayed, seen_resumed
        assert sum(s["n_codes_refreshed"] for s in seen_resumed) + sum(
            s["n_codes_refreshed"] for s in seen_crashed
        ) == odd.count()
        # this session cached the tables pre-stream; the maintenance
        # ran in the stream's cloned session (streaming/ann.py's
        # probe-visibility note)
        spark.catalog.refreshTable(t)
        spark.catalog.refreshTable(f"{t}__codes")
        n_total = emb.count()
        assert spark.table(t).count() == n_total  # no duplicate appends
        assert verify_ivfpq_consistency(spark, t) == 0
        lp = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
        }
        cp = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}__codes").collect()
        }
        assert int(lp[_IVF_NROWS_PROP]) == n_total
        assert int(cp[_IVFPQ_NCODES_PROP]) == n_total
        probe_q = emb.filter(F.col("vec_id") < 10)
        key = lambda rows: sorted(
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in rows
        )
        got = key(
            ivfpq_topk(
                spark, t, probe_q, k=5, nprobe=4, shortlist=50, n_queries=10
            ).collect()
        )
        want = key(
            ivfpq_topk(
                spark, ref, probe_q, k=5, nprobe=4, shortlist=50, n_queries=10
            ).collect()
        )
        assert got and got == want  # crash+replay ≡ one-shot build
    finally:
        for tb in (t, ref):
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {tb}{s}")


def test_lsh_index_maintenance_crash_replay_converges(spark, dirs, monkeypatch):
    """The LSH counterpart: streamed appends run in the family's
    recovery mode (finest-grain anti-joins), so a crash after an
    epoch's append committed — replayed on restart — appends nothing,
    and the maintained index equals build_lsh_index over the FULL
    corpus bit-for-bit (planes are parameter-derived, so
    append-equals-rebuild is exact)."""
    import pyspark.sql.functions as F

    import citibike_analysis_spark.operators.similarity as sim
    from citibike_analysis_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk,
        verify_lsh_index_consistency,
    )
    from citibike_analysis_spark.sources.tables import load_table
    from citibike_analysis_spark.streaming.ann import (
        start_lsh_index_maintenance,
    )

    emb = load_table(spark, EMB_SF, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    t, ref = "ann_lsh_maint_idx", "ann_lsh_maint_ref"
    flag = os.path.join(dirs["flag"], "lsh_append_crash.flag")
    real_append = sim.append_to_lsh_index

    def torn_append(batch, table, **kw):
        out = real_append(batch, table, **kw)
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("crashed")
            raise RuntimeError("injected crash: after lsh append")
        return out

    try:
        build_lsh_index(emb, ref)
        build_lsh_index(even, t)
        _write_emb_batches(spark, odd, dirs["in2"], 2)

        def make_stream():
            return (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .parquet(dirs["in2"])
            )

        monkeypatch.setattr(sim, "append_to_lsh_index", torn_append)
        q = start_lsh_index_maintenance(make_stream(), t, dirs["ckpt2"])
        with pytest.raises(Exception, match="injected crash"):
            try:
                q.processAllAvailable()
                q.awaitTermination()
            finally:
                q.stop()
        assert os.path.exists(flag)
        monkeypatch.setattr(sim, "append_to_lsh_index", real_append)
        seen: list[dict] = []
        q2 = start_lsh_index_maintenance(
            make_stream(), t, dirs["ckpt2"], on_batch=seen.append
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert len(seen) == 2  # replayed epoch + the remaining batch
        spark.catalog.refreshTable(t)
        spark.catalog.refreshTable(f"{t}__vecs")
        # no duplicate ids from the replay (the recovery-mode contract)
        verify_lsh_index_consistency(spark, t)
        assert (
            spark.table(f"{t}__vecs").count() == emb.count()
        )
        probe_q = emb.filter(F.col("vec_id") < 10)
        key = lambda rows: sorted(
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in rows
        )
        got = key(
            lsh_index_topk(spark, t, probe_q, k=5, n_queries=10).collect()
        )
        want = key(
            lsh_index_topk(spark, ref, probe_q, k=5, n_queries=10).collect()
        )
        assert got and got == want  # streamed ≡ one-shot full build
    finally:
        for tb in (t, ref):
            for s in ("", "__vecs", "__tombs"):
                spark.sql(f"DROP TABLE IF EXISTS {tb}{s}")


def test_index_maintenance_pause_compact_resume(spark, dirs):
    """The single-writer cadence the module docstring prescribes:
    stream a batch → STOP → compact (absorbing a removal) → restart
    from the same checkpoint → stream the next batch. The pause is
    exact (no batch lost or doubled), the compaction's purge holds
    under the resumed appends, and the count caches stay exact."""
    import pyspark.sql.functions as F

    from citibike_analysis_spark.operators.pq import (
        _IVFPQ_NCODES_PROP,
        attach_pq_codes,
        ivfpq_topk,
        verify_ivfpq_consistency,
    )
    from citibike_analysis_spark.operators.similarity import (
        _IVF_NROWS_PROP,
        build_ivf_index,
        compact_ivf_index,
        remove_from_ivf_index,
    )
    from citibike_analysis_spark.sources.tables import load_table
    from citibike_analysis_spark.streaming.ann import start_index_maintenance

    emb = load_table(spark, EMB_SF, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    removed = even.filter(F.col("vec_id") % 10 == 0).select("vec_id")
    t = "ann_maint_pause_idx"
    in_dir, ckpt = dirs["land"], dirs["ckpt_d"]
    try:
        build_ivf_index(even, t, nlist=8, train_iters=2, train_on=even)
        attach_pq_codes(
            spark, t, m=8, ksub=16, train_iters=2,
            train_on=even.select("vec_id", "embedding"),
        )
        # batch 0 only on disk; stream it, then stop
        import pyarrow as pa

        from citibike_analysis_spark.plans.relational import (
            _write_replay_batches,
        )

        schema = pa.schema(
            [
                pa.field("vec_id", pa.int64()),
                pa.field("embedding", pa.list_(pa.float32())),
            ]
        )
        b0 = odd.filter(F.col("vec_id") < 250)
        b1 = odd.filter(F.col("vec_id") >= 250)
        _write_replay_batches(
            b0.select("vec_id", "embedding"), in_dir, 1, schema, ["vec_id"]
        )

        def make_stream():
            return (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            )

        q = start_index_maintenance(make_stream(), t, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # maintenance window: remove + compact with the stream stopped
        remove_from_ivf_index(spark, t, removed)
        compact_ivf_index(spark, t)
        # resume: land batch 1 under the SAME checkpoint
        import pyarrow.parquet as pq_mod

        pdf = b1.select("vec_id", "embedding").toPandas()
        path = os.path.join(in_dir, "b900.parquet")
        pq_mod.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False).cast(schema), path
        )
        q2 = start_index_maintenance(make_stream(), t, ckpt)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        spark.catalog.refreshTable(t)
        spark.catalog.refreshTable(f"{t}__codes")
        n_expect = emb.count() - removed.count()
        assert spark.table(t).count() == n_expect  # b0 not doubled, b1 not lost
        assert verify_ivfpq_consistency(spark, t) == 0
        lp = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
        }
        cp = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}__codes").collect()
        }
        assert int(lp[_IVF_NROWS_PROP]) == n_expect
        assert int(cp[_IVFPQ_NCODES_PROP]) == n_expect
        # removed ids stay purged through the resumed appends
        probe_q = emb.filter(F.col("vec_id") < 10)
        surfaced = {
            r["neighbor_id"]
            for r in ivfpq_topk(
                spark, t, probe_q, k=5, nprobe=4, shortlist=50, n_queries=10
            ).collect()
        }
        assert surfaced and all(
            not (n % 10 == 0 and n % 2 == 0) for n in surfaced
        )
    finally:
        for s in ("", "__cents", "__tombs", "__codes", "__books"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{s}")


def test_index_maintenance_inline_compaction_cadence(spark, dirs, monkeypatch):
    """In-stream single-writer compaction (``compact_every``): the sink
    compacts inside its own foreachBatch body, so no stop/restart window
    is needed for file-accumulation maintenance. The cadence absorbs a
    tombstone queued before the stream started, and a crash injected
    right AFTER the first compaction completes (offset uncommitted) is
    healed by the replayed epoch re-running the idempotent compaction:
    final state equals a one-shot build over the surviving rows — probe
    parity, count caches exact, id audit clean, tombstones purged."""
    import pyspark.sql.functions as F

    import citibike_analysis_spark.operators.similarity as sim
    from citibike_analysis_spark.operators.pq import (
        _IVFPQ_NCODES_PROP,
        attach_pq_codes,
        ivfpq_topk,
        verify_ivfpq_consistency,
    )
    from citibike_analysis_spark.operators.similarity import (
        _IVF_NROWS_PROP,
        build_ivf_index,
        remove_from_ivf_index,
    )
    from citibike_analysis_spark.sources.tables import load_table
    from citibike_analysis_spark.streaming.ann import start_index_maintenance

    emb = load_table(spark, EMB_SF, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    removed = even.filter(F.col("vec_id") % 10 == 0).select("vec_id")
    train = even.select("vec_id", "embedding")
    t, ref = "ann_maint_inline_idx", "ann_maint_inline_ref"
    flag = os.path.join(dirs["flag"], "compact_crash.flag")
    real_compact = sim.compact_ivf_index

    def crash_after_compact(sp, table_):
        out = real_compact(sp, table_)
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("crashed")
            raise RuntimeError("injected crash: after inline compaction")
        return out

    try:
        keep = emb.join(removed, "vec_id", "left_anti")
        build_ivf_index(keep, ref, nlist=8, train_iters=2, train_on=even)
        attach_pq_codes(spark, ref, m=8, ksub=16, train_iters=2, train_on=train)
        build_ivf_index(even, t, nlist=8, train_iters=2, train_on=even)
        attach_pq_codes(spark, t, m=8, ksub=16, train_iters=2, train_on=train)
        # tombstone BEFORE the stream starts (removals are writes — the
        # out-of-band window); the in-stream cadence purges it
        remove_from_ivf_index(spark, t, removed)
        _write_emb_batches(spark, odd, dirs["in"], 2)

        def make_stream():
            return (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .parquet(dirs["in"])
            )

        monkeypatch.setattr(sim, "compact_ivf_index", crash_after_compact)
        seen_crashed: list[dict] = []
        q = start_index_maintenance(
            make_stream(), t, dirs["ckpt_a"], compact_every=2,
            on_batch=seen_crashed.append,
        )
        with pytest.raises(Exception, match="injected crash"):
            try:
                q.processAllAvailable()
                q.awaitTermination()
            finally:
                q.stop()
        assert os.path.exists(flag)  # compaction COMPLETED, then crashed
        monkeypatch.setattr(sim, "compact_ivf_index", real_compact)

        seen: list[dict] = []
        q2 = start_index_maintenance(
            make_stream(), t, dirs["ckpt_a"], compact_every=2,
            on_batch=seen.append,
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        # the replayed epoch re-ran the cadence slot: nothing novel, yet
        # a compaction entry landed in the seam (idempotent re-run)
        replay_compactions = [
            s for s in seen if s["n_novel"] == 0 and "compaction" in s
        ]
        assert replay_compactions, seen
        spark.catalog.refreshTable(t)
        spark.catalog.refreshTable(f"{t}__codes")
        n_expect = emb.count() - removed.count()
        assert spark.table(t).count() == n_expect
        assert not spark.catalog.tableExists(f"{t}__tombs")  # purged
        assert verify_ivfpq_consistency(spark, t) == 0
        lp = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
        }
        cp = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}__codes").collect()
        }
        assert int(lp[_IVF_NROWS_PROP]) == n_expect
        assert int(cp[_IVFPQ_NCODES_PROP]) == n_expect
        probe_q = emb.filter(F.col("vec_id") < 10)
        key = lambda rows: sorted(
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in rows
        )
        got = key(
            ivfpq_topk(
                spark, t, probe_q, k=5, nprobe=4, shortlist=50, n_queries=10
            ).collect()
        )
        want = key(
            ivfpq_topk(
                spark, ref, probe_q, k=5, nprobe=4, shortlist=50, n_queries=10
            ).collect()
        )
        assert got and got == want  # inline-compacted ≡ one-shot build
    finally:
        for tb in (t, ref):
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {tb}{s}")


def test_lsh_index_maintenance_inline_compaction_cadence(spark, dirs):
    """LSH counterpart of the in-stream cadence: ``compact_every``
    compacts inside foreachBatch (single writer, race-free), the seam
    carries the compaction stats, and the maintained-and-compacted
    index still equals a one-shot full build bit-for-bit (compaction
    rewrites through the same bucket spec; planes parameter-derived)."""
    import pyspark.sql.functions as F

    from citibike_analysis_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk,
        verify_lsh_index_consistency,
    )
    from citibike_analysis_spark.sources.tables import load_table
    from citibike_analysis_spark.streaming.ann import (
        start_lsh_index_maintenance,
    )

    emb = load_table(spark, EMB_SF, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    t, ref = "ann_lsh_inline_idx", "ann_lsh_inline_ref"
    in_dir = tempfile.mkdtemp(prefix="cbs_rec_lshin_")
    ckpt = tempfile.mkdtemp(prefix="cbs_rec_lshck_")
    try:
        build_lsh_index(emb, ref)
        build_lsh_index(even, t)
        _write_emb_batches(spark, odd, in_dir, 2)
        seen: list[dict] = []
        q = start_lsh_index_maintenance(
            (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            ),
            t,
            ckpt,
            compact_every=2,
            on_batch=seen.append,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert len(seen) == 2
        compactions = [s for s in seen if "compaction" in s]
        assert len(compactions) == 1  # epoch 1 only (cadence 2)
        spark.catalog.refreshTable(t)
        spark.catalog.refreshTable(f"{t}__vecs")
        verify_lsh_index_consistency(spark, t)
        assert spark.table(f"{t}__vecs").count() == emb.count()
        probe_q = emb.filter(F.col("vec_id") < 10)
        key = lambda rows: sorted(
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in rows
        )
        got = key(
            lsh_index_topk(spark, t, probe_q, k=5, n_queries=10).collect()
        )
        want = key(
            lsh_index_topk(spark, ref, probe_q, k=5, n_queries=10).collect()
        )
        assert got and got == want
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        for tb in (t, ref):
            for s in ("", "__vecs", "__tombs"):
                spark.sql(f"DROP TABLE IF EXISTS {tb}{s}")


def test_maintenance_compact_every_validated_at_call_time():
    """compact_every=0 must raise a ValueError when the stream is
    DECLARED, not a ZeroDivisionError inside foreachBatch that kills the
    first epoch (review)."""
    from citibike_analysis_spark.streaming.ann import (
        start_index_maintenance,
        start_lsh_index_maintenance,
    )

    for fn in (start_index_maintenance, start_lsh_index_maintenance):
        with pytest.raises(ValueError, match="compact_every"):
            fn(None, "t", "/tmp/nope", compact_every=0)
        with pytest.raises(ValueError, match="compact_every"):
            fn(None, "t", "/tmp/nope", compact_every=-2)


def test_span_admission_crash_replay_decisions_stable(spark, dirs, monkeypatch):
    """The span tier's streaming composition: coverage-gated admission
    over a persisted gram index. Crash AFTER epoch 0's gram append
    committed (offset uncommitted), restart: the replayed epoch must
    re-deliver the IDENTICAL admitted set (contributor self-exclusion —
    the batch's own landed grams cannot flip its coverage), append
    nothing (anti-join), and the final admitted sets must equal the
    batch oracle computed from per-batch reference indexes."""
    import pyspark.sql.functions as F

    import citibike_analysis_spark.operators.dedup as ded
    from citibike_analysis_spark.operators.dedup import (
        build_gram_index,
        gram_index_coverage,
    )
    from citibike_analysis_spark.sources.tables import load_table
    from citibike_analysis_spark.streaming.ann import start_span_admission

    docs = load_table(spark, EMB_SF, "documents").select("doc_id", "text")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    b0 = odd.filter(F.col("doc_id") < 250)
    b1 = odd.filter(F.col("doc_id") >= 250)
    t, ref0, ref1 = "span_adm_idx", "span_adm_ref0", "span_adm_ref1"
    in_dir = os.path.join(dirs["out"], "docs_in")
    ckpt = os.path.join(dirs["out"], "ckpt")
    os.makedirs(in_dir)
    flag = os.path.join(dirs["flag"], "span_adm_crash.flag")
    real_append = ded.append_to_gram_index

    def crash_after_append(sp, table_, batch, *a, **kw):
        out = real_append(sp, table_, batch, *a, **kw)
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("crashed")
            raise RuntimeError("injected crash: after gram append")
        return out

    K, MAXCOV = 8, 0.5

    def expected_admitted(batch_df, index_docs, ref):
        build_gram_index(index_docs, ref, k=K)
        try:
            cov = gram_index_coverage(spark, ref, batch_df)
            return {
                r.doc_id for r in cov.filter(F.col("coverage") <= MAXCOV).collect()
            }
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {ref}")

    try:
        want0 = expected_admitted(b0, even, ref0)
        want1 = expected_admitted(b1, even.unionByName(b0), ref1)
        assert want0 and want1  # non-degenerate
        n_rejected = (b0.count() - len(want0)) + (b1.count() - len(want1))
        assert n_rejected > 0  # the gate actually rejects something

        build_gram_index(even, t, k=K)
        import pyarrow as pa

        from citibike_analysis_spark.plans.relational import _write_replay_batches

        schema = pa.schema(
            [pa.field("doc_id", pa.int64()), pa.field("text", pa.string())]
        )
        _write_replay_batches(b0, in_dir, 1, schema, ["doc_id"])

        admitted_epochs: list[tuple[int, frozenset]] = []

        def sink(adf, epoch_id):
            admitted_epochs.append(
                (epoch_id, frozenset(r.doc_id for r in adf.select("doc_id").collect()))
            )

        def make_stream():
            return (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            )

        monkeypatch.setattr(ded, "append_to_gram_index", crash_after_append)
        q = start_span_admission(
            make_stream(), t, sink, max_coverage=MAXCOV, checkpoint_dir=ckpt
        )
        with pytest.raises(Exception, match="injected crash"):
            try:
                q.processAllAvailable()
                q.awaitTermination()
            finally:
                q.stop()
        assert os.path.exists(flag)  # epoch 0's grams landed, then crash
        first_delivery = dict(admitted_epochs)

        monkeypatch.setattr(ded, "append_to_gram_index", real_append)
        # land batch 1 and restart from the same checkpoint
        import pyarrow.parquet as pq_mod

        pdf = b1.toPandas()
        pq_mod.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False).cast(schema),
            os.path.join(in_dir, "b900.parquet"),
        )
        seen: list[dict] = []
        q2 = start_span_admission(
            make_stream(), t, sink, max_coverage=MAXCOV,
            checkpoint_dir=ckpt, on_batch=seen.append,
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        replayed = dict(admitted_epochs[len(first_delivery):])
        # replayed epoch 0: IDENTICAL admitted set despite its own grams
        # already being in the index (contributor self-exclusion)
        assert replayed[0] == first_delivery[0] == frozenset(want0)
        assert replayed[1] == frozenset(want1)
        # replayed epoch appended nothing; batch 1 appended its novelty
        by_epoch = {s["epoch_id"]: s for s in seen}
        assert by_epoch[0]["n_grams_appended"] == 0
        assert by_epoch[1]["n_grams_appended"] > 0
    finally:
        for tb in (t, ref0, ref1):
            spark.sql(f"DROP TABLE IF EXISTS {tb}")
