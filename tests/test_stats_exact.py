"""functions/stats.py — cross-engine-exact rounded aggregates.

The helpers exist because float round(avg(...), s) is ill-defined on
midpoint cells (see the module docstring); these tests pin the exact
semantics against an independent Python big-int computation AND the
DuckDB fragment, with adversarial midpoint/negative/null cases that a
random generator would almost never hit.
"""

from __future__ import annotations

import sys
from fractions import Fraction

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from citibike_analysis_spark.functions.stats import (
    round_avg_exact,
    round_avg_exact_over,
    round_sum_exact,
    sql_round_avg_exact,
    sql_round_sum_exact,
)


def _py_round_avg(vals, in_scale, out_scale):
    vs = [v for v in vals if v is not None]
    if not vs:
        return None
    m = 10**in_scale
    s = sum(round(v * m) for v in vs)
    q = Fraction(s * 10 ** (out_scale - in_scale), len(vs))
    # half away from zero; then mirror the engine's exact evaluation
    # order (int -> nearest double, then one IEEE division) so the
    # comparison stays bit-exact even past 2^53
    sign = 1 if q >= 0 else -1
    scaled = sign * int(abs(q) + Fraction(1, 2))
    return float(scaled) / float(10**out_scale)


CASES = [
    # exact midpoint: 2129.99 over 40 rows -> 53.249750 -> 53.2498
    [53.25] * 39 + [52.24],
    # negative midpoint: mean -53.245 exactly at scale 3
    [-53.25, -53.24],
    # nulls ignored like avg()
    [1.11, None, 2.22, None],
    # all-null group
    [None, None],
    # single row
    [7.77],
    # zero mean from cancellation
    [5.55, -5.55],
]


@pytest.mark.parametrize("vals", CASES, ids=range(len(CASES)))
def test_round_avg_exact_matches_python_and_duckdb(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(round_avg_exact("v", 2, 4).alias("m")).collect()[0]["m"]
    expect = _py_round_avg(vals, 2, 4)
    assert got == expect

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES {}) s(v)".format(
        ", ".join(f"(CAST({v!r} AS DOUBLE))" if v is not None else "(CAST(NULL AS DOUBLE))" for v in vals)
    ))
    duck = con.execute(f"SELECT {sql_round_avg_exact('v', 2, 4)} FROM t").fetchone()[0]
    assert duck == expect


def test_round_sum_exact_midpoint_and_sign(spark):
    # scale-4 inputs whose sum ends in ...x.xx50 — the exact round-to-2
    # midpoint a float path flips on; plus the negative mirror
    rows = [(1.0050,), (2.0000,)]
    df = spark.createDataFrame(rows, "v double")
    got = df.agg(round_sum_exact("v", 4, 2).alias("s")).collect()[0]["s"]
    assert got == 3.01  # 3.0050 rounds half AWAY to 3.01
    neg = spark.createDataFrame([(-1.0050,), (-2.0,)], "v double")
    got_n = neg.agg(round_sum_exact("v", 4, 2).alias("s")).collect()[0]["s"]
    assert got_n == -3.01
    con = duckdb.connect()
    assert con.execute(
        f"SELECT {sql_round_sum_exact('v', 4, 2)} FROM (VALUES (1.0050), (2.0000)) t(v)"
    ).fetchone()[0] == 3.01


def test_round_sum_exact_upscale_is_identity(spark):
    df = spark.createDataFrame([(1.25,), (2.50,)], "v double")
    got = df.agg(round_sum_exact("v", 2, 4).alias("s")).collect()[0]["s"]
    assert got == 3.75
    # empty group -> NULL, matching round(sum(...))
    empty = spark.createDataFrame([], "v double")
    assert empty.agg(round_sum_exact("v", 2, 4).alias("s")).collect()[0]["s"] is None


def test_round_avg_exact_over_window_matches_per_group(spark):
    rows = [(1, 53.25)] * 39 + [(1, 52.24)] + [(2, 1.00), (2, 2.01)]
    df = spark.createDataFrame(rows, "g int, v double")
    w = Window.partitionBy("g")
    out = {
        r["g"]: r["m"]
        for r in df.select("g", round_avg_exact_over("v", w, 2, 4).alias("m"))
        .distinct()
        .collect()
    }
    # 39*53.25 + 52.24 = 2128.99 over 40 -> 53.224750 exact midpoint,
    # half-away -> 53.2248: the windowed form hits the same midpoint rule
    assert out[1] == 53.2248
    assert out[2] == 1.505


def test_large_magnitude_no_precision_loss(spark):
    # sums past 2^53: a double accumulator would silently round; the
    # split-long path must stay exact. 2e7 rows is slow — emulate with
    # large VALUES instead: scale-2 values ~9e12 so 1000 rows ≈ 9e15+
    # scaled units, past float53 territory once multiplied out.
    n, v = 1000, 9_000_000_000_000.37
    df = spark.createDataFrame([(v,)] * n, "v double")
    got = df.agg(round_avg_exact("v", 2, 4).alias("m")).collect()[0]["m"]
    assert got == _py_round_avg([v] * n, 2, 4)
    # and DuckDB lands on the bit-identical double
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {sql_round_avg_exact('v', 2, 4)} FROM "
        f"(SELECT CAST({v!r} AS DOUBLE) AS v FROM range(1000))"
    ).fetchone()[0]
    assert duck == got


def test_round_ratio_exact_matches_python_and_duckdb(spark):
    # the (s, n)-pair form added for q10's min-of-hourly-means: exact
    # half-away-from-zero rounding of s/(100·n) at scale 4, identical in
    # Spark, DuckDB (sql_round_ratio_exact), and Fraction arithmetic —
    # including exact midpoints and negative sums
    from citibike_analysis_spark.functions.stats import (
        round_ratio_exact,
        sql_round_ratio_exact,
    )

    cases = [
        (212999, 40),   # 53.249750 exactly — midpoint at scale 4
        (-10649, 2),    # -53.245 exactly — negative midpoint at scale 3
        (777, 1),
        (0, 3),
        (1, 3),         # non-terminating 1/300
        (-1, 3),
    ]
    df = spark.createDataFrame(cases, "s long, n long")
    got = {
        (r["s"], r["n"]): r["m"]
        for r in df.select(
            "s", "n",
            round_ratio_exact(F.col("s"), F.col("n")).alias("m"),
        ).collect()
    }
    con = duckdb.connect()
    for s, n in cases:
        q = Fraction(s, 100 * n) * 10**4
        sign = 1 if q >= 0 else -1
        expect = float(sign * int(abs(q) + Fraction(1, 2))) / 1e4
        assert got[(s, n)] == expect, (s, n)
        duck = con.execute(
            f"SELECT {sql_round_ratio_exact(str(s), str(n))}"
        ).fetchone()[0]
        assert duck == expect, (s, n)
