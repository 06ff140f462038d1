"""Unit tests for the as-of join and sessionization operators
(SURVEY.md §2.3 surface completion / §2.9 batch dual).

Edge cases pinned here: no-match rows stay null, backward-inclusive
equal-timestamp matching, deterministic tie-break at equal timestamps,
tolerance cutoff, single-event sessions, and exact-gap boundaries.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from citibike_analysis_spark.operators.asof import asof_join
from citibike_analysis_spark.operators.windows import sessionize


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


LEFT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("lid", T.LongType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("rid", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows, **kw):
        left = spark.createDataFrame(left_rows, LEFT_SCHEMA)
        right = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["rid", "v"], **kw
        )
        return {r["lid"]: (r["rid_asof"], r["v_asof"]) for r in out.collect()}

    def test_backward_inclusive_and_no_match(self, spark):
        got = self._run(
            spark,
            [("a", _ts(5), 1), ("a", _ts(10), 2), ("b", _ts(5), 3)],
            [("a", _ts(5), 100, 1.0), ("a", _ts(7), 101, 2.0)],
        )
        # equal timestamp matches (backward-inclusive); later row takes
        # the newest preceding; key with no right rows stays null
        assert got == {1: (100, 1.0), 2: (101, 2.0), 3: (None, None)}

    def test_equal_ts_tie_breaks_to_largest_payload(self, spark):
        got = self._run(
            spark,
            [("a", _ts(9), 1)],
            [("a", _ts(9), 100, 1.0), ("a", _ts(9), 102, 2.0), ("a", _ts(9), 101, 3.0)],
        )
        # ties on ts resolve to the right row sorting last by payload
        # struct (ts, rid, v) → max rid
        assert got == {1: (102, 2.0)}

    def test_tolerance_nulls_stale_matches(self, spark):
        got = self._run(
            spark,
            [("a", _ts(10), 1), ("a", _ts(20), 2)],
            [("a", _ts(9), 100, 1.0)],
            tolerance_seconds=120,
        )
        # 60s-old match survives a 120s tolerance; 11min-old does not
        assert got == {1: (100, 1.0), 2: (None, None)}

    def test_left_row_count_preserved(self, spark):
        left = [("a", _ts(m), m) for m in range(1, 30)]
        right = [("a", _ts(m, 30), 1000 + m, float(m)) for m in range(0, 30, 5)]
        got = self._run(spark, left, right)
        assert len(got) == len(left)


    def test_null_keys_never_match(self, spark):
        # ADVICE r1: SQL equi-join semantics — a NULL-key left row must
        # NOT inherit payloads from NULL-key right rows sharing the
        # window partition; it keeps null values like the LATERAL form.
        from citibike_analysis_spark.operators.asof import asof_join_bucketed

        left_rows = [(None, _ts(5), 1), ("a", _ts(5), 2)]
        right_rows = [(None, _ts(1), 10, 1.0), ("a", _ts(2), 20, 2.0)]
        got = self._run(spark, left_rows, right_rows)
        assert got == {1: (None, None), 2: (20, 2.0)}

        left = spark.createDataFrame(left_rows, LEFT_SCHEMA)
        right = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
        out = asof_join_bucketed(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["rid", "v"], bucket_seconds=60,
        )
        got_b = {r["lid"]: (r["rid_asof"], r["v_asof"]) for r in out.collect()}
        assert got_b == {1: (None, None), 2: (20, 2.0)}


class TestSessionize:
    SCHEMA = T.StructType(
        [
            T.StructField("u", T.StringType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("eid", T.LongType()),
        ]
    )

    def _run(self, spark, rows, gap):
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = sessionize(df, ["u"], "ts", gap_seconds=gap, tie_break=["eid"])
        return {r["eid"]: r["session_idx"] for r in out.collect()}

    def test_gap_boundary_is_exclusive(self, spark):
        got = self._run(
            spark,
            [
                ("a", _ts(0), 1),
                ("a", _ts(10), 2),   # exactly gap → same session
                ("a", _ts(20, 1), 3),  # gap + 1s → new session
            ],
            gap=600,
        )
        assert got == {1: 1, 2: 1, 3: 2}

    def test_per_key_independence_and_singletons(self, spark):
        got = self._run(
            spark,
            [("a", _ts(0), 1), ("b", _ts(0), 2), ("a", _ts(59), 3)],
            gap=60,
        )
        # each key starts at session 1; b's lone event is its own session
        assert got == {1: 1, 2: 1, 3: 2}


class TestAsofHardening:
    def test_fractional_tolerance_is_not_truncated(self, spark):
        # review finding: int(tolerance) SECOND rounded 0.5s down to an
        # INTERVAL 0, nulling matches the caller asked to keep
        left = spark.createDataFrame(
            [("k", _ts(0, 10), 1), ("k", _ts(0, 20), 2)], LEFT_SCHEMA
        )
        right = spark.createDataFrame(
            [
                ("k", _ts(0, 9) + dt.timedelta(milliseconds=600), 100, 1.0),
                ("k", _ts(0, 19), 200, 2.0),
            ],
            RIGHT_SCHEMA,
        )
        out = {
            r["lid"]: r["rid_asof"]
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="ts",
                value_cols=["rid", "v"], tolerance_seconds=0.5,
            ).collect()
        }
        # lid 1: right row 0.4s earlier — inside 0.5s, must match
        assert out[1] == 100
        # lid 2: right row 1.0s earlier — outside 0.5s, must null
        assert out[2] is None

    def test_bucketed_ltz_across_dst_fallback_matches_plain(self, spark):
        # review finding: bucketing LTZ via cast-to-NTZ used the SESSION
        # zone's wall clock, which repeats an hour at DST fall-back —
        # bucket order inverted relative to instant order and the
        # bucketed variant silently dropped valid backward matches
        from citibike_analysis_spark.operators.asof import asof_join_bucketed

        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            ltz = T.StructType(
                [
                    T.StructField("k", T.StringType()),
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("lid", T.LongType()),
                ]
            )
            rtz = T.StructType(
                [
                    T.StructField("k", T.StringType()),
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("rid", T.LongType()),
                    T.StructField("v", T.DoubleType()),
                ]
            )
            utc = dt.timezone.utc
            # 2025-11-02: America/New_York falls back at 06:00Z.
            # right row at 05:30Z (wall 01:30 EDT), left row at 06:15Z
            # (wall 01:15 EST) — instant-later but WALL-earlier
            left = spark.createDataFrame(
                [("k", dt.datetime(2025, 11, 2, 6, 15, tzinfo=utc), 1)], ltz
            )
            right = spark.createDataFrame(
                [("k", dt.datetime(2025, 11, 2, 5, 30, tzinfo=utc), 100, 1.0)],
                rtz,
            )
            kw = dict(
                on=["k"], left_ts="ts", right_ts="ts", value_cols=["rid", "v"]
            )
            plain = asof_join(left, right, **kw).collect()
            bucketed = asof_join_bucketed(
                left, right, bucket_seconds=900, **kw
            ).collect()
            assert plain[0]["rid_asof"] == 100
            assert bucketed[0]["rid_asof"] == 100  # was None pre-fix
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)

    def test_approx_ntile_tolerates_existing_cuts_column(self, spark):
        # review finding: the internal cutoff array was named bare
        # "cuts", colliding with same-named input columns
        from citibike_analysis_spark.operators.windows import approx_ntile

        df = spark.createDataFrame(
            [(i, f"c{i}") for i in range(40)], "v: long, cuts: string"
        )
        out = approx_ntile(df, "v", 4, out="bucket")
        assert set(out.columns) == {"v", "cuts", "bucket"}
        got = {r["v"]: r["bucket"] for r in out.collect()}
        assert got[0] == 1 and got[39] == 4
