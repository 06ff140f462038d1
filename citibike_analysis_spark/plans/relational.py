"""Relational query surface (SURVEY.md §2) over the synthetic star schema.

Each query re-expresses one or more reference operators (ids cited per
query) as idiomatic DataFrame plans, paired with a DuckDB oracle. Shared
conventions keeping the Spark and DuckDB results hash-identical:

- computed integer columns are cast to BIGINT on both sides (DuckDB's
  ``sum(int)`` is HUGEINT, Spark's is LONG; date parts are BIGINT in
  DuckDB, INT in Spark);
- aggregated doubles are rounded identically on both sides (sum→2,
  avg/stddev→4, ratios/distances→6) — partial aggregation makes Spark's
  summation order nondeterministic, so raw double sums are not
  bit-stable across engines;
- every window ORDER BY carries a unique tie-break key (ntile/row_number
  on ties are otherwise order-dependent);
- timestamps are TIMESTAMP_NTZ wall-clock on the Spark side, matching
  DuckDB's naive TIMESTAMP (sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citibike_analysis_spark.functions.stats import (
    round_avg_exact,
    round_avg_exact_over,
    spark_sql_round_avg_from_scaled,
    spark_sql_round_from_scaled,
    spark_sql_scaled_sum,
    sql_round_avg_exact,
    sql_round_sum_exact,
)
from citibike_analysis_spark.operators.rollup import interval_rollup
from citibike_analysis_spark.operators.spatial import within_distance_pairs
from citibike_analysis_spark.operators.windows import top_k_per_group
from citibike_analysis_spark.plans import QuerySpec
from citibike_analysis_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01 — pricing summary: grouped conditional aggregation (A1, F18, P5, S1)
# Reference shape: the variability CTE (README.md:233-247) — grouped
# multi-aggregate with CASE WHEN measures over a date-filtered fact scan.
# --------------------------------------------------------------------------

# One exact scaled-integer partial per INPUT column/expression (5), not
# per output measure (which cost ×2.3 in r03): sum and avg of the same
# column derive from one shared partial, and all three avgs share
# count(*) (every measure column is non-null in lineitem). The hi/lo
# overflow split stays ONLY on the two product columns (scaled ≤
# 10^9/10^11, where a raw long sum overflows at 9.2e9/9.2e7 rows per
# group — inside the operating point). Direct columns skip it:
# quantity/discount scaled ≤ 5·10^3 (safe past 10^15 rows/group);
# extendedprice scaled ≤ 10^7 → safe to 9.2e11 rows PER GROUP, ×4-5
# above the largest flag/status group of a ~6·10^11-row 100 TB lineitem
# — flip to split=True if a deployment ever exceeds ~10^12 rows per
# group. Registered as ONE spark.sql() string: the equivalent Column-API
# construction costs ~0.35 s of py4j driver time PER CALL (measured —
# half of q01's sf0.1 runtime); the SQL text parses JVM-side in one
# round trip and produces the identical plan. Rounds sit exactly on
# round-to-2 midpoints ~1% of groups — both engines round in integer
# space, so results are engine- and summation-order-independent.
_Q01_SPARK_SQL = f"""
WITH g AS (
  SELECT l_returnflag, l_linestatus,
         {spark_sql_scaled_sum('l_quantity', 2, split=False)}      AS _sq,
         {spark_sql_scaled_sum('l_extendedprice', 2, split=False)} AS _sp,
         {spark_sql_scaled_sum('l_extendedprice * (1 - l_discount)', 4)} AS _sdp,
         {spark_sql_scaled_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS _sc,
         {spark_sql_scaled_sum('l_discount', 2, split=False)}      AS _sd,
         count(*) AS count_order
  FROM {{li}}
  WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       {spark_sql_round_from_scaled('_sq', 2, 2)} AS sum_qty,
       {spark_sql_round_from_scaled('_sp', 2, 2)} AS sum_base_price,
       {spark_sql_round_from_scaled('_sdp', 4, 2)} AS sum_disc_price,
       {spark_sql_round_from_scaled('_sc', 6, 2)} AS sum_charge,
       {spark_sql_round_avg_from_scaled('_sq', 'count_order', 2, 4)} AS avg_qty,
       {spark_sql_round_avg_from_scaled('_sp', 'count_order', 2, 4)} AS avg_price,
       {spark_sql_round_avg_from_scaled('_sd', 'count_order', 2, 4)} AS avg_disc,
       count_order
FROM g
"""


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return spark.sql(_Q01_SPARK_SQL, li=li)


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_round_sum_exact('l_quantity', 2, 2)}      AS sum_qty,
       {sql_round_sum_exact('l_extendedprice', 2, 2)} AS sum_base_price,
       {sql_round_sum_exact('l_extendedprice * (1 - l_discount)', 4, 2)} AS sum_disc_price,
       {sql_round_sum_exact('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6, 2)} AS sum_charge,
       {sql_round_avg_exact('l_quantity')}      AS avg_qty,
       {sql_round_avg_exact('l_extendedprice')} AS avg_price,
       {sql_round_avg_exact('l_discount')}      AS avg_disc,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — conditional flag counting (A1/F18/F13): the "times_no_bikes /
# times_no_docks" pattern (README.md:240-241) as zero-discount / zero-tax
# line counts per supplier.
# --------------------------------------------------------------------------

def q02_conditional_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.max("l_quantity").alias("max_qty"),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0))
        .cast("long")
        .alias("times_no_discount"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0))
        .cast("long")
        .alias("times_no_tax"),
        F.count("*").alias("n_lines"),
    )


Q02_SQL = """
SELECT l_suppkey,
       max(l_quantity)                                                AS max_qty,
       CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS times_no_discount,
       CAST(sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT)      AS times_no_tax,
       count(*)                                                       AS n_lines
FROM lineitem
GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# q03 — projection + conjunctive range/equality filter (P1, P3, P5, O1)
# --------------------------------------------------------------------------

def q03_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000.0)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


Q03_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
"""


# --------------------------------------------------------------------------
# q04 — IN-list filter + aggregation (P6): query('name in @list') pattern
# (notebooks/citibike_ck.ipynb:418).
# --------------------------------------------------------------------------

def q04_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .filter(F.col("p_size") >= 10)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            round_avg_exact("p_retailprice").alias("avg_price"),
        )
    )


Q04_SQL = f"""
SELECT p_brand, count(*) AS n_parts, {sql_round_avg_exact('p_retailprice')} AS avg_price
FROM part
WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33') AND p_size >= 10
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# q05 — dimension-join chain with broadcast (J1): revenue per region/nation.
# The zip→coords lookup join (README.md:633) generalized: small dims are
# broadcast so the fact scan never shuffles.
# --------------------------------------------------------------------------

def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


Q05_SQL = """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# q06 — left outer join + null patch (J2/P4): the weather-patch join
# (README.md:896) — missing dimension rows surface as NULL and are
# repaired with a default.
# --------------------------------------------------------------------------

def q06_left_join_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .withColumn("segment", F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")))
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


Q06_SQL = """
SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000.0) ON o_custkey = c_custkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q07 — split → union → dedup (J6/U1/A7): the split-patch-union-dedup
# pipeline (README.md:869-900). The two halves overlap, so the dedup is
# load-bearing; unionByName mirrors pandas concat-by-name semantics.
# --------------------------------------------------------------------------

def q07_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    open_orders = o.filter(F.col("o_orderstatus") == "O")
    big_orders = o.filter(F.col("o_totalprice") > 150000.0).select(
        "o_orderstatus", "o_totalprice", "o_orderkey"  # different column order
    )
    both = open_orders.unionByName(big_orders).dropDuplicates(["o_orderkey"])
    return both.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


Q07_SQL = """
SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total
FROM (
  SELECT DISTINCT o_orderkey, o_orderstatus, o_totalprice
  FROM (
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 150000.0
  )
)
"""


# --------------------------------------------------------------------------
# q08 — anti join (§2.3 "free" surface): customers with no orders.
# --------------------------------------------------------------------------

def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


Q08_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q09 — semi join as filter (J3): "keep fact rows whose key survived the
# ranking CTE" (README.md:281-287) — semi, not inner, so rank ties cannot
# duplicate fact rows.
# --------------------------------------------------------------------------

def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return (
        li.join(big, li.l_orderkey == big.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


Q09_SQL = """
SELECT l_returnflag, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_totalprice > 300000.0
)
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q10 — two-stage aggregation (A5): mean per (user, hour) then min over
# hours per user (notebooks/citibike_ck.ipynb:397-409).
# --------------------------------------------------------------------------

def q10_two_stage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-decimal min-of-means (review finding): value is 2-decimal
    # quantized, so `round(min(avg(value)), 4)` on doubles is the
    # midpoint coin flip functions/stats.py exists to eliminate — every
    # sibling avg query uses the exact path. Here the exact (s, n)
    # partials ride THROUGH the min: min_by picks the argmin hour by the
    # double proxy s/n (exact ordering at these magnitudes — distinct
    # hourly rationals differ by ≥ 1/(100·n²), ~11 orders above double
    # error; equal rationals round identically so ties don't matter),
    # and the single round happens in integer space at the end.
    from citibike_analysis_spark.functions.stats import round_ratio_exact

    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.sum(F.rint(F.col("value") * 100).cast("long")).alias("_s"),
        F.count("value").alias("_n"),
    )
    picked = hourly.groupBy("user_id").agg(
        F.min_by(
            F.struct(F.col("_s"), F.col("_n")), F.col("_s") / F.col("_n")
        ).alias("_m"),
        F.count("*").alias("n_hours"),
    )
    return picked.select(
        "user_id",
        round_ratio_exact(F.col("_m._s"), F.col("_m._n")).alias(
            "min_hourly_avg"
        ),
        "n_hours",
    )


from citibike_analysis_spark.functions.stats import sql_round_ratio_exact as _srre

Q10_SQL = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts,
         sum(CAST(round(value * 100) AS BIGINT)) AS s,
         count(value) AS n
  FROM events GROUP BY 1, 2
), picked AS (
  -- single arg_min over a packed struct: two separate arg_mins could
  -- pick DIFFERENT tied hours and pair s from one with n from another
  SELECT user_id,
         arg_min({{'s': s, 'n': n}}, s / CAST(n AS DOUBLE)) AS m,
         count(*) AS n_hours
  FROM hourly GROUP BY 1
)
SELECT user_id,
       {_srre("m.s", "m.n")} AS min_hourly_avg,
       n_hours
FROM picked
"""


# --------------------------------------------------------------------------
# q11 — pivot aggregation (A6): event_type × day-of-week matrix of mean
# value (pivot_table at notebooks/citibike_ck.ipynb:418-419). Explicit
# pivot values avoid the extra distinct-scan pass.
# --------------------------------------------------------------------------

def q11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday … 7=Saturday → normalize to 0=Sunday.
    dow = (F.dayofweek(F.col("ts")) - F.lit(1)).cast("long")
    # The exact rounded mean is a composition of two aggregates, which a
    # pivot .agg() can't host directly — aggregate per (type, dow) first,
    # then pivot the (already 1-row-per-cell) means with first(). Same
    # two-shuffle plan Spark generates for pivot-over-avg anyway.
    cell = (
        e.withColumn("dow", dow)
        .groupBy("event_type", "dow")
        .agg(round_avg_exact("value").alias("_m"))
    )
    pivoted = (
        cell.groupBy("event_type").pivot("dow", list(range(7))).agg(F.first("_m"))
    )
    return pivoted.select(
        "event_type", *[F.col(str(d)).alias(f"d{d}") for d in range(7)]
    )


_Q11_CELL = [
    sql_round_avg_exact(f"CASE WHEN dayofweek(ts) = {d} THEN value END")
    for d in range(7)
]

Q11_SQL = f"""
SELECT event_type,
       {_Q11_CELL[0]} AS d0,
       {_Q11_CELL[1]} AS d1,
       {_Q11_CELL[2]} AS d2,
       {_Q11_CELL[3]} AS d3,
       {_Q11_CELL[4]} AS d4,
       {_Q11_CELL[5]} AS d5,
       {_Q11_CELL[6]} AS d6
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q12 — distinct / cardinality profiling (A7/A8/A9).
# --------------------------------------------------------------------------

def q12_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    pairs = e.select("user_id", "event_type").distinct()
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


Q12_SQL = """
SELECT count(*) AS n_pairs,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_types
FROM (SELECT DISTINCT user_id, event_type FROM events)
"""


# --------------------------------------------------------------------------
# q13 — summary statistics (A10): describe()-style numeric profile with
# exact interpolated percentiles.
# --------------------------------------------------------------------------

def q13_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_extendedprice").alias("n"),
        round_avg_exact("l_extendedprice").alias("mean"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("stddev"),
        F.round(F.min("l_extendedprice"), 2).alias("min"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
        F.round(F.max("l_extendedprice"), 2).alias("max"),
    )


Q13_SQL = f"""
SELECT count(l_extendedprice) AS n,
       {sql_round_avg_exact('l_extendedprice')} AS mean,
       round(stddev_samp(l_extendedprice), 4) AS stddev,
       round(min(l_extendedprice), 2) AS min,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(max(l_extendedprice), 2) AS max
FROM lineitem
"""


# --------------------------------------------------------------------------
# q14 — first-row-per-group (A11/W3/O3): representative row per key via
# row_number over a fully-determined order (README.md:570,585).
# --------------------------------------------------------------------------

def q14_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    picked = top_k_per_group(
        p,
        ["p_brand"],
        [F.asc("p_retailprice"), F.asc("p_partkey")],
        k=1,
        rank_fn=F.row_number(),
    )
    return picked.select("p_brand", "p_partkey", "p_retailprice")


Q14_SQL = """
SELECT p_brand, p_partkey, p_retailprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS rk
  FROM part
)
WHERE rk = 1
"""


# --------------------------------------------------------------------------
# q15 — grouped collect to sorted list (A12): station → neighbor-list
# shape (notebooks/CitiBike-1.ipynb:225-240) as order → line numbers.
# Serialized to a string so the hash comparison is representation-stable.
# --------------------------------------------------------------------------

def q15_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list(F.col("l_linenumber")))
            ).alias("line_numbers"),
            F.count("*").alias("n_lines"),
        )
        .filter(F.col("n_lines") >= 6)
    )


Q15_SQL = """
SELECT l_orderkey,
       string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_numbers,
       count(*) AS n_lines
FROM lineitem
GROUP BY l_orderkey
HAVING count(*) >= 6
"""


# --------------------------------------------------------------------------
# q16 — global ntile percentile bucketing (W1): README.md:249-258. Unique
# tie-break key (suppkey) makes the bucket assignment deterministic.
# Reference-parity form; the 100 TB-safe variant is
# operators.windows.approx_ntile (rows-only checked, see llm module).
# --------------------------------------------------------------------------

def q16_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


Q16_SQL = """
SELECT s_suppkey, s_acctbal,
       CAST(ntile(10) OVER (ORDER BY s_acctbal, s_suppkey) AS BIGINT) AS decile,
       round(percent_rank() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank
FROM supplier
"""


# --------------------------------------------------------------------------
# q17 — rank within partition + top-1 filter (W2/O3): rank stations within
# hood by score (README.md:259-277) as top customer per nation.
# --------------------------------------------------------------------------

def q17_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    top = top_k_per_group(
        joined, ["n_name"], [F.desc("c_acctbal"), F.asc("c_custkey")], k=1
    )
    return top.select("n_name", "c_custkey", "c_acctbal")


Q17_SQL = """
SELECT n_name, c_custkey, c_acctbal
FROM (
  SELECT n_name, c_custkey, c_acctbal,
         rank() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rk = 1
"""


# --------------------------------------------------------------------------
# q18 — analytic windows: lag + running total (§2.5 extended surface).
# Deterministic frame: ordered by (ts, event_id) within user.
# --------------------------------------------------------------------------

def q18_lag_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
    )


Q18_SQL = """
SELECT event_id, user_id,
       round(lag(value) OVER w, 2) AS prev_value,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# q19 — tumbling-window interval rollup (W4): the 15-minute availability
# grain (README.md:200) over the events stream, batch form.
# --------------------------------------------------------------------------

def q19_interval_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return interval_rollup(
        e,
        "ts",
        ["event_type"],
        [
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.count("*").alias("n_events"),
        ],
        interval="15 minutes",
    ).select("bucket_ts", "event_type", "min_value", "max_value", "n_events")


Q19_SQL = """
SELECT make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900) * 1000000) AS bucket_ts,
       event_type,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q20 — the flagship reduction query (§3.1; README.md:232-288): grouped
# conditional agg → triple global ntile → gated composite score → rank
# per group → top-1 → semi-join back to the fact table. Re-keyed from
# (station, hood) to (supplier, nation).
# --------------------------------------------------------------------------

def _supplier_variability(li: DataFrame) -> DataFrame:
    """Per-supplier variability metrics — the flagship's first aggregate.
    ONE definition shared by q20 (both percentile strategies, hence the
    q104 scalable form) and the q56 audit, so the gating inputs cannot
    drift between the plan and the audit that cross-checks it (r04
    review: this block existed in three hand-maintained copies). q02
    keeps its own variant (it adds n_lines — a different surface)."""
    return li.groupBy("l_suppkey").agg(
        F.max("l_quantity").alias("max_qty"),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0))
        .cast("long")
        .alias("times_no_discount"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0))
        .cast("long")
        .alias("times_no_tax"),
    )


def q20_interesting_suppliers(
    spark: SparkSession,
    sf_dir: str,
    gates: tuple[int, int, int] = (40, 30, 30),
    percentile_strategy: str = "exact",
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    variability = _supplier_variability(li)
    if percentile_strategy == "approx":
        # the 100 TB plan (SURVEY.md §7 "scale redesign of global
        # windows"): three approx-quantile bucketings — no global sort,
        # no single-task stage. Ties land in the lowest qualifying
        # bucket, so gate selections can differ from exact ntile at
        # bucket boundaries (bounded in tests/test_operators.py).
        from citibike_analysis_spark.cache import track
        from citibike_analysis_spark.operators.windows import (
            approx_ntile_multi,
        )

        # ONE pass computes all three cutoff arrays and ONE broadcast
        # join assigns all three buckets (r14, guide §2.2): the chained
        # three approx_ntile calls each consumed their input twice
        # (cutoff agg + assignment join), embedding the variability plan
        # 2^3 = 8 times — the profiled execution ran eight racing
        # 32-task materializations of the persist plus three sketch
        # aggregations where one suffices. The persist stays: the multi
        # form still references variability twice (agg + join), and the
        # final semi-join side makes a third consumer.
        variability = track(variability.persist())
        percentiles = approx_ntile_multi(
            variability,
            ["max_qty", "times_no_discount", "times_no_tax"],
            100,
            ["max_qty_pctl", "no_discount_pctl", "no_tax_pctl"],
        )
    else:
        percentiles = variability.select(
            "*",
            F.ntile(100)
            .over(Window.orderBy(F.asc("max_qty"), F.asc("l_suppkey")))
            .cast("long")
            .alias("max_qty_pctl"),
            F.ntile(100)
            .over(Window.orderBy(F.asc("times_no_discount"), F.asc("l_suppkey")))
            .cast("long")
            .alias("no_discount_pctl"),
            F.ntile(100)
            .over(Window.orderBy(F.asc("times_no_tax"), F.asc("l_suppkey")))
            .cast("long")
            .alias("no_tax_pctl"),
        )
    gated = percentiles.filter(
        (F.col("max_qty_pctl") > gates[0])
        & (F.col("no_discount_pctl") > gates[1])
        & (F.col("no_tax_pctl") > gates[2])
    ).withColumn(
        "score",
        F.col("max_qty_pctl") + F.col("no_discount_pctl") + F.col("no_tax_pctl"),
    )
    with_nation = gated.join(
        F.broadcast(s.select("s_suppkey", "s_nationkey")),
        gated.l_suppkey == F.col("s_suppkey"),
    ).join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    top = top_k_per_group(
        with_nation, ["n_name"], [F.desc("score"), F.asc("l_suppkey")], k=1
    ).select(F.col("l_suppkey").alias("pick_suppkey"))

    # top is provably small (≤ one supplier per nation): broadcast the
    # semi-join so the fact scan never shuffles (README.md:598-639 ladder).
    return (
        li.join(F.broadcast(top), li.l_suppkey == F.col("pick_suppkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


Q20_SQL = """
WITH variability AS (
  SELECT l_suppkey,
         max(l_quantity) AS max_qty,
         CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS times_no_discount,
         CAST(sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS times_no_tax
  FROM lineitem
  GROUP BY l_suppkey
), percentiles AS (
  SELECT *,
         CAST(ntile(100) OVER (ORDER BY max_qty, l_suppkey) AS BIGINT) AS max_qty_pctl,
         CAST(ntile(100) OVER (ORDER BY times_no_discount, l_suppkey) AS BIGINT) AS no_discount_pctl,
         CAST(ntile(100) OVER (ORDER BY times_no_tax, l_suppkey) AS BIGINT) AS no_tax_pctl
  FROM variability
), gated AS (
  SELECT *, max_qty_pctl + no_discount_pctl + no_tax_pctl AS score
  FROM percentiles
  WHERE max_qty_pctl > 40 AND no_discount_pctl > 30 AND no_tax_pctl > 30
), ranked AS (
  SELECT g.l_suppkey, n_name,
         rank() OVER (PARTITION BY n_name ORDER BY score DESC, g.l_suppkey) AS rk
  FROM gated g
  JOIN supplier ON g.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
SELECT l_suppkey, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
WHERE EXISTS (SELECT 1 FROM ranked WHERE rk = 1 AND ranked.l_suppkey = lineitem.l_suppkey)
GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# q21 — spatial within-radius self-join (J5): the nearest-stations join
# (notebooks/CitiBike-1.ipynb:222-240). Synthetic station coordinates are
# derived from customer keys with exact integer arithmetic so both engines
# construct identical doubles. Spark side runs the grid-bucketed band
# join; the oracle brute-forces the cross join — same result, which is
# precisely the operator's correctness property.
# --------------------------------------------------------------------------

def _stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("station_id"),
        (F.lit(40.5) + ((F.col("c_custkey") * 37) % 1000) * F.lit(0.0003)).alias("lat"),
        (F.lit(-74.1) + ((F.col("c_custkey") * 91) % 1000) * F.lit(0.0003)).alias("lon"),
        (F.col("c_custkey") % 20 != 0).alias("in_service"),
    )


def q21_spatial_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _stations(spark, sf_dir).filter("in_service")
    pairs = within_distance_pairs(
        st, "station_id", "lat", "lon", radius_km=0.5, max_abs_lat_deg=41.0
    )
    return pairs.select(
        F.col("a_station_id").cast("long").alias("station_id"),
        F.col("b_station_id").cast("long").alias("neighbor_id"),
        F.round("dist_km", 6).alias("dist_km"),
    )


Q21_SQL = """
WITH stations AS (
  SELECT c_custkey AS station_id,
         40.5 + ((c_custkey * 37) % 1000) * 0.0003 AS lat,
         -74.1 + ((c_custkey * 91) % 1000) * 0.0003 AS lon
  FROM customer
  WHERE c_custkey % 20 <> 0
)
SELECT CAST(a.station_id AS BIGINT) AS station_id,
       CAST(b.station_id AS BIGINT) AS neighbor_id,
       round(2 * 6371.0088 * asin(sqrt(
         sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
         + cos(radians(a.lat)) * cos(radians(b.lat))
           * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
       )), 6) AS dist_km
FROM stations a
JOIN stations b ON a.station_id <> b.station_id
WHERE 2 * 6371.0088 * asin(sqrt(
        sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
        + cos(radians(a.lat)) * cos(radians(b.lat))
          * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
      )) < 0.5
"""


# --------------------------------------------------------------------------
# q22 — temporal derivation stack (F1-F7, F4/F5): the derived time-column
# block (README.md:1004-1143) over events.
# --------------------------------------------------------------------------

def q22_temporal_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.functions.temporal import (
        day_name,
        day_type,
        trunc_day,
        trunc_hour,
    )

    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        trunc_hour(F.col("ts")).alias("time_hour"),
        trunc_day(F.col("ts")).alias("time_day"),
        F.to_date(F.col("ts")).alias("date"),
        F.hour(F.col("ts")).cast("long").alias("hour_of_day"),
        day_name(F.col("ts")).alias("day_name"),
        day_type(F.col("ts")).alias("day_type"),
    )


Q22_SQL = """
SELECT event_id,
       date_trunc('hour', ts) AS time_hour,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS time_day,
       CAST(ts AS DATE) AS date,
       CAST(hour(ts) AS BIGINT) AS hour_of_day,
       dayname(ts) AS day_name,
       CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend' ELSE 'weekday' END AS day_type
FROM events
"""


# --------------------------------------------------------------------------
# q23 — round-to-nearest-hour, half-to-even (F3): pandas dt.round('H')
# parity (notebooks/citibike_ck.ipynb:368). The oracle spells out the
# same integer arithmetic on epoch seconds.
# --------------------------------------------------------------------------

def q23_round_half_even_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.functions.temporal import round_to_hour

    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        round_to_hour(F.col("ts")).alias("rounded_hour"),
        F.hour(round_to_hour(F.col("ts"))).cast("long").alias("rounded_hour_of_day"),
    )


Q23_SQL = """
WITH base AS (
  SELECT event_id,
         date_trunc('hour', ts) AS h,
         -- full microsecond remainder into the hour (DuckDB microsecond()
         -- is the sub-minute component incl. seconds): any nonzero
         -- fraction past :30:00 rounds up, matching pandas dt.round('H')
         minute(ts) * 60000000 + microsecond(ts) AS rem_us,
         hour(ts) % 2 AS odd
  FROM events
)
SELECT event_id,
       h + to_microseconds((CASE
             WHEN rem_us > 1800000000 THEN 1
             WHEN rem_us < 1800000000 THEN 0
             ELSE odd END) * 3600000000) AS rounded_hour,
       CAST(hour(h + to_microseconds((CASE
             WHEN rem_us > 1800000000 THEN 1
             WHEN rem_us < 1800000000 THEN 0
             ELSE odd END) * 3600000000)) AS BIGINT) AS rounded_hour_of_day
FROM base
"""


QUERIES: dict[str, QuerySpec] = {
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, Q01_SQL, "A1 F18 P5 S1"),
    "q02_conditional_flags": QuerySpec(q02_conditional_flags, Q02_SQL, "A1 F13 F18"),
    "q03_filter_project": QuerySpec(q03_filter_project, Q03_SQL, "P1 P3 P5"),
    "q04_in_list": QuerySpec(q04_in_list, Q04_SQL, "P6 A2"),
    "q05_regional_revenue": QuerySpec(q05_regional_revenue, Q05_SQL, "J1 A2"),
    "q06_left_join_patch": QuerySpec(q06_left_join_patch, Q06_SQL, "J2 P4 F16"),
    "q07_union_dedup": QuerySpec(q07_union_dedup, Q07_SQL, "J6 U1 A7"),
    "q08_anti_join": QuerySpec(q08_anti_join, Q08_SQL, "U2 J-ext"),
    "q09_semi_join": QuerySpec(q09_semi_join, Q09_SQL, "J3"),
    "q10_two_stage_agg": QuerySpec(q10_two_stage_agg, Q10_SQL, "A5 F1"),
    "q11_pivot": QuerySpec(q11_pivot, Q11_SQL, "A6 F4"),
    "q12_distinct_profile": QuerySpec(q12_distinct_profile, Q12_SQL, "A7 A8 A9"),
    "q13_summary_stats": QuerySpec(q13_summary_stats, Q13_SQL, "A10"),
    "q14_first_per_group": QuerySpec(q14_first_per_group, Q14_SQL, "A11 W3 O3"),
    "q15_collect_list": QuerySpec(q15_collect_list, Q15_SQL, "A12"),
    "q16_ntile": QuerySpec(q16_ntile, Q16_SQL, "W1"),
    "q17_rank_per_group": QuerySpec(q17_rank_per_group, Q17_SQL, "W2 O3"),
    "q18_lag_running_sum": QuerySpec(q18_lag_running_sum, Q18_SQL, "W-ext"),
    "q19_interval_rollup": QuerySpec(q19_interval_rollup, Q19_SQL, "W4"),
    "q20_interesting_suppliers": QuerySpec(q20_interesting_suppliers, Q20_SQL, "A1 W1 W2 O3 J3 §3.1"),
    "q21_spatial_neighbors": QuerySpec(q21_spatial_neighbors, Q21_SQL, "J5 F17"),
    "q22_temporal_derive": QuerySpec(q22_temporal_derive, Q22_SQL, "F1 F2 F4 F5 F7"),
    "q23_round_half_even_hour": QuerySpec(q23_round_half_even_hour, Q23_SQL, "F3"),
}


# --------------------------------------------------------------------------
# q24 — boolean existence flag per group, joined back (A4/F13/J4): the
# rainy-day pattern (README.md:1700-1781) — did ANY error event happen
# for (user, date); count events on such days per user.
# --------------------------------------------------------------------------

def q24_rainy_day_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    flags = (
        e.groupBy("user_id", F.to_date("ts").alias("date"))
        .agg(
            F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("had_error")
        )
    )
    with_flag = e.withColumn("date", F.to_date("ts")).join(
        flags, ["user_id", "date"], "inner"
    )
    return (
        with_flag.filter(F.col("had_error") == 1)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("events_on_error_days"),
            F.countDistinct("date").alias("error_days"),
        )
    )


Q24_SQL = """
WITH flags AS (
  SELECT user_id, CAST(ts AS DATE) AS date,
         CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS had_error
  FROM events GROUP BY 1, 2
)
SELECT e.user_id,
       count(*) AS events_on_error_days,
       count(DISTINCT f.date) AS error_days
FROM events e
JOIN flags f ON e.user_id = f.user_id AND CAST(e.ts AS DATE) = f.date
WHERE f.had_error = 1
GROUP BY e.user_id
"""


# --------------------------------------------------------------------------
# q25 — wide group-by mean (A3): per-group means of every numeric column
# (notebooks/CitiBike-1.ipynb:210-213).
# --------------------------------------------------------------------------

def q25_wide_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        *[round_avg_exact(c).alias(f"avg_{c}") for c in measures]
    )


Q25_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_round_avg_exact('l_quantity')}      AS avg_l_quantity,
       {sql_round_avg_exact('l_extendedprice')} AS avg_l_extendedprice,
       {sql_round_avg_exact('l_discount')}      AS avg_l_discount,
       {sql_round_avg_exact('l_tax')}           AS avg_l_tax
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q26 — hierarchical rollup (§2.4 extended surface: cube/rollup are free
# in Spark; exposed for engine completeness).
# --------------------------------------------------------------------------

def q26_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


Q26_SQL = """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --------------------------------------------------------------------------
# q27 — multiset difference (U2 extended: exceptAll).
# --------------------------------------------------------------------------

def q27_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderpriority"
    )
    big_keys = o.filter(F.col("o_totalprice") > 150000.0).select(
        "o_custkey", "o_orderpriority"
    )
    return (
        open_keys.exceptAll(big_keys)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"))
    )


Q27_SQL = """
SELECT o_orderpriority, count(*) AS n_rows
FROM (
  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 150000.0
)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q28 — correlated scalar subquery (J7): the reference's per-row lookup
# anti-pattern (README.md:552-553, 42.96s) written as SQL — Catalyst
# decorrelates it into a join automatically; the engine must never
# execute a per-row scan (BASELINE.md regression guard).
# --------------------------------------------------------------------------

def q28_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 1.5 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


Q28_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
    SELECT avg(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


# --------------------------------------------------------------------------
# q29 — string scalar functions (F14/F15/F16 generalized): case, substring,
# padding, replacement — the zip-repair toolbox (README.md:367-390).
# --------------------------------------------------------------------------

def q29_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


Q29_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 8) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
       replace(p_type, ' ', '_') AS type_snake,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
"""


# --------------------------------------------------------------------------
# q41 — backward as-of join (SURVEY.md §2.3 surface completion: "the domain
# needs as-of (nearest weather reading)"). For each error event, the latest
# click at-or-before it by the same user. Spark side is the scalable
# union+window plan (operators/asof.py); the oracle is an independent
# formulation (per-row LATERAL top-1).
# --------------------------------------------------------------------------

def q41_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        errors,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id", "value"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("error_event"),
        "ts",
        F.col("ts_asof").alias("last_click_ts"),
        F.col("event_id_asof").alias("last_click_event"),
        F.col("value_asof").alias("last_click_value"),
    )


Q41_SQL = """
SELECT e.user_id,
       e.event_id AS error_event,
       e.ts,
       c.ts AS last_click_ts,
       c.event_id AS last_click_event,
       c.value AS last_click_value
FROM events e
LEFT JOIN LATERAL (
  SELECT c.ts, c.event_id, c.value
  FROM events c
  WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
  ORDER BY c.ts DESC, c.event_id DESC
  LIMIT 1
) c ON true
WHERE e.event_type = 'error'
"""


def q58_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q41 on the hot-key-safe plan (operators/asof.py
    asof_join_bucketed): result-identical by construction, so it shares
    q41's oracle — the driver value-checks the skew-resistant plan too.
    Bucket width 1h against the events table's multi-day span spreads
    each user across many tasks."""
    from citibike_analysis_spark.operators.asof import asof_join_bucketed

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join_bucketed(
        errors,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id", "value"],
        bucket_seconds=3600,
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("error_event"),
        "ts",
        F.col("ts_asof").alias("last_click_ts"),
        F.col("event_id_asof").alias("last_click_event"),
        F.col("value_asof").alias("last_click_value"),
    )


# --------------------------------------------------------------------------
# q42 — gap-based sessionization (batch dual of streaming session windows;
# the training-data-pipeline shape of the reference's time-interval
# bucketing). 30-minute inactivity gap per user.
# --------------------------------------------------------------------------

def q42_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.operators.windows import sessionize

    e = _t(spark, sf_dir, "events")
    sess = sessionize(
        e, ["user_id"], "ts", gap_seconds=1800, tie_break=["event_id"]
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


Q42_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev IS NULL OR ts > prev + INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q43 — interval/range join (SURVEY.md §2.3 "interval-overlap joins ...
# surfaced in the API"): clicks within 10 minutes after each error by the
# same user. The user_id equi-key keeps this a hash/sort-merge join with a
# residual range predicate — never a cross product.
# --------------------------------------------------------------------------

def q43_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"), F.col("ts").alias("t0"), "event_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("ct"),
        F.col("event_id").alias("click_id"),
    )
    win = F.expr("INTERVAL 600 SECOND")
    joined = errors.join(
        clicks,
        (F.col("u") == F.col("cu"))
        & (F.col("ct") >= F.col("t0"))
        & (F.col("ct") <= F.col("t0") + win),
        "left",
    )
    return joined.groupBy(
        F.col("event_id"), F.col("u").alias("user_id")
    ).agg(F.count("click_id").alias("n_clicks_10min"))


Q43_SQL = """
SELECT e.event_id, e.user_id, count(c.event_id) AS n_clicks_10min
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 600 SECOND
WHERE e.event_type = 'error'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q47/q48 — skew-safe aggregation (SURVEY.md §4): salted two-stage plans
# for the non-combinable aggregates where one hot key would otherwise
# serialize into a single reducer. Results are identical to the plain
# single-stage forms — which is exactly what the oracle checks.
# --------------------------------------------------------------------------

def q47_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.operators.skew import salted_count_distinct

    o = _t(spark, sf_dir, "orders")
    return salted_count_distinct(
        o, ["o_orderpriority"], "o_custkey", buckets=16
    )


Q47_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_distinct
FROM orders
GROUP BY o_orderpriority
"""


def q48_salted_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.operators.skew import salted_collect_list

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    merged = salted_collect_list(li, ["l_suppkey"], "l_orderkey", buckets=16)
    return merged.select(
        "l_suppkey",
        F.array_join(
            F.transform(F.col("l_orderkey"), lambda x: x.cast("string")), ","
        ).alias("order_keys"),
    )


Q48_SQL = """
SELECT l_suppkey,
       string_agg(l_orderkey, ',' ORDER BY l_orderkey) AS order_keys
FROM lineitem
WHERE l_quantity >= 49
GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# q51-q53 — surface completion (SURVEY.md §2.3/§2.7 closing notes: the
# join types and set ops the reference never used but the engine
# exposes): multiset intersection, full outer join, GROUPING SETS.
# --------------------------------------------------------------------------

def q51_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderpriority"
    )
    big_keys = o.filter(F.col("o_totalprice") > 100000.0).select(
        "o_custkey", "o_orderpriority"
    )
    return (
        open_keys.intersectAll(big_keys)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"))
    )


Q51_SQL = """
SELECT o_orderpriority, count(*) AS n_rows
FROM (
  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000.0
)
GROUP BY o_orderpriority
"""


def q52_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    errors = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_errors"))
    )
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spend")
    )
    joined = spend.join(errors, spend["o_custkey"] == errors["user_id"], "full")
    return joined.select(
        F.coalesce("o_custkey", "user_id").alias("entity_id"),
        "total_spend",
        "n_errors",
    )


Q52_SQL = """
WITH errors AS (
  SELECT user_id, count(*) AS n_errors FROM events
  WHERE event_type = 'error' GROUP BY user_id
), spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT coalesce(o_custkey, user_id) AS entity_id, total_spend, n_errors
FROM spend FULL OUTER JOIN errors ON o_custkey = user_id
"""


def q53_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               round(sum(l_extendedprice), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


Q53_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q104_scalable_picks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship reduction query on its 100 TB plan: approx-quantile
    bucketing replaces the three single-task global ntile sorts.
    Approximate at tie boundaries → no oracle; q56 is its driver-checked
    overlap audit, pytest bounds the pick-set overlap, and the plan
    assert pins zero global sorts. This is the form bench.py times."""
    return q20_interesting_suppliers(
        spark, sf_dir, percentile_strategy="approx"
    )


def q56_interesting_suppliers_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-verifiable AUDIT of the scalable flagship variant (r03
    VERDICT #3): one row — the exact plan's pick count plus two booleans
    pinning the approx-quantile bucketing against its own declared
    semantics, deterministically at EVERY scale factor.

    The reference point is NOT exact ``ntile``: ntile splits tie runs
    positionally (and degenerates to rank when suppliers < buckets, as
    at sf0.001), while ``approx_ntile`` documents the ties-high
    cume-dist convention. So the audit compares each supplier's approx
    bucket to ``ceil(cume_dist * 100)`` — the exact ties-high percentile
    — per metric:

    - ``divergence_le_1``: every (supplier, metric) approx bucket is
      within 1 of the exact cume-dist bucket (sketch rank error ≤
      relative_error·N = 1% of a bucket, plus one boundary off-by-one
      between the floor-like cutoff count and the ceil cume-dist form);
    - ``gates_sandwich_ok``: approx-gated suppliers all pass the gates
      relaxed by one bucket, and every supplier clearing the gates
      tightened by one bucket is approx-gated — the gate-level
      containment sandwich implied by the divergence bound.

    The oracle recomputes the exact pick count via the q20 SQL verbatim
    and states the expected invariants (`true`, `true`); a bucketing or
    gate regression on either plan hash-mismatches. The earlier
    pick-set Jaccard form was tie-fragile: at sf0.001 the counter
    metrics are one giant tie run, ntile gates select nobody, and the
    approx plan's (documented, intended) ties-high gating selects
    several — a *correct* divergence the old bound misread as failure.
    Pick-set overlap at realistic cardinality stays pinned by pytest
    (tests/test_plans.py).

    Scale note: the cume-dist legs are single-partition windows over the
    per-supplier variability table — the AUDIT side, dimension-sized;
    the production plan (q104) has no global sort (plan-asserted).
    """
    from citibike_analysis_spark.operators.windows import approx_ntile

    li = _t(spark, sf_dir, "lineitem")
    v = _supplier_variability(li)
    metrics = [("max_qty", 40), ("times_no_discount", 30), ("times_no_tax", 30)]
    p = v.withColumn("_n", F.count("*").over(Window.partitionBy()))
    for m, _ in metrics:
        # ties-high rank = COUNT over a RANGE frame (peers included),
        # bucket = ceil(100·rank/N) computed in INTEGER space:
        # ceil(cume_dist()*100) overshoots by 1 whenever k/N·100 lands a
        # float ulp above an integer (0.7*100 = 70.000000000000006 →
        # ceil 71), which would silently eat the ±1 divergence tolerance
        hi = F.count("*").over(
            Window.orderBy(F.col(m)).rangeBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        p = p.withColumn(
            f"_{m}_cd",
            F.floor((hi * 100 + F.col("_n") - 1) / F.col("_n")).cast("long"),
        )
        p = approx_ntile(p, m, 100, f"_{m}_ap")

    div_ok = F.lit(True)
    approx_gated = F.lit(True)
    loose = F.lit(True)
    tight = F.lit(True)
    for m, g in metrics:
        div_ok = div_ok & (
            F.abs(F.col(f"_{m}_ap") - F.col(f"_{m}_cd")) <= 1
        )
        approx_gated = approx_gated & (F.col(f"_{m}_ap") > g)
        loose = loose & (F.col(f"_{m}_cd") + 1 > g)
        tight = tight & (F.col(f"_{m}_cd") - 1 > g)
    audit = p.agg(
        F.bool_and(div_ok).alias("divergence_le_1"),
        F.bool_and((~approx_gated | loose) & (~tight | approx_gated)).alias(
            "gates_sandwich_ok"
        ),
    )
    n_exact = q20_interesting_suppliers(spark, sf_dir).agg(
        F.count("*").cast("long").alias("n_exact_picks")
    )
    # 1-row × 1-row combine (BroadcastNestedLoopJoin, same shape as
    # approx_ntile's cutoff attach — not a data-sized cartesian)
    return n_exact.join(F.broadcast(audit))


# DuckDB allows a WITH query as a derived table, so the audit oracle
# wraps the flagship oracle verbatim — one source of truth for "exact".
Q56_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_exact_picks,
       true AS divergence_le_1,
       true AS gates_sandwich_ok
FROM ({Q20_SQL}) q20_exact
"""


# --------------------------------------------------------------------------
# q54 — grouped confidence-band aggregates (SURVEY.md §2.11): the in-engine
# equivalent of seaborn's lineplot(ci=90) — per-group mean + exact
# interpolated percentile bands, ready for any plotting layer.
# --------------------------------------------------------------------------

def q54_ci_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.hour("ts").cast("long").alias("hour_of_day"))
        .agg(
            F.count("*").alias("n"),
            round_avg_exact("value").alias("mean_value"),
            F.round(F.percentile("value", 0.05), 4).alias("p05"),
            F.round(F.percentile("value", 0.95), 4).alias("p95"),
        )
    )


Q54_SQL = f"""
SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
       count(*) AS n,
       {sql_round_avg_exact('value')} AS mean_value,
       round(quantile_cont(value, 0.05), 4) AS p05,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q57 — approx_count_distinct (HyperLogLog++): the sketch that replaces
# exact distinct counting at 100 TB (mergeable ⇒ map-side partials; the
# shuffle moves fixed-size sketches, not value sets). Sketch estimates
# are engine-specific, so the REGISTERED query is the ERROR AUDIT the
# driver can hash-verify (r03 VERDICT #3): the exact per-group distinct
# count plus a boolean asserting the HLL estimate sits within 5σ
# (rsd=0.01 → |est − exact| ≤ max(0.05·exact, 2), the bound the pytest
# pins; HLL++ is deterministic per dataset, so the boolean is stable).
# The oracle recomputes the exact counts and states the expected
# invariant — a broken sketch hash-mismatches. Scale note: the
# exact-distinct leg is the AUDIT side (the very shuffle the sketch
# exists to avoid); production uses approx_count_distinct alone.
# --------------------------------------------------------------------------

def q57_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_est"),
        F.count("*").alias("n_lines"),
    )
    bound = F.greatest(F.lit(2.0), F.col("exact_orders") * 0.05)
    return g.select(
        "l_returnflag",
        "exact_orders",
        "n_lines",
        (F.abs(F.col("_est") - F.col("exact_orders")) <= bound).alias(
            "within_5_sigma"
        ),
    )


Q57_SQL = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       count(*) AS n_lines,
       true AS within_5_sigma
FROM lineitem
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q73 — grouped linear-regression aggregates (§2.11-ext): per market
# segment, the OLS slope/intercept of order value over time. Spark's
# regr_* aggregates are single-pass mergeable moments (map-side partial
# agg, JVM codegen) — the trend-per-group computation that pandas users
# run as groupby().apply(np.polyfit), kept fully distributed here.
# --------------------------------------------------------------------------

def q73_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # days since an in-corpus epoch: keeps moment magnitudes small so the
    # regr_* float error stays far inside the 6-decimal rounding
    days = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01"))
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("c_mktsegment", days.cast("double").alias("_x"), F.col("o_totalprice").alias("_y"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.regr_slope("_y", "_x"), 6).alias("slope"),
            F.round(F.regr_intercept("_y", "_x"), 6).alias("intercept"),
        )
    )


Q73_SQL = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       round(regr_slope(o_totalprice,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)), 6) AS slope,
       round(regr_intercept(o_totalprice,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)), 6) AS intercept
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q97 — SCD-type-2 validity intervals: collapse each user's event-type
# stream into state runs with valid_from/valid_to (NULL = current) —
# the dimension-history derivation of a warehouse upsert feed.
# --------------------------------------------------------------------------

def q97_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.operators.windows import scd2_intervals

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")
    out = scd2_intervals(
        e, ["user_id"], "ts", "event_type", tie_break=["event_id"]
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        "valid_from",
        "valid_to",
    )


Q97_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_type, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), starts AS (
  SELECT user_id, ts, event_type, event_id
  FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM starts
"""


# --------------------------------------------------------------------------
# q98 — TIME-RANGE window frame: per user, the trailing-1-hour moving
# average/count of event values, keyed by event TIME not row position —
# the frame type q18's ROWS frames don't cover (irregular sampling makes
# row counts meaningless as a time window). Spark expresses it as
# rangeBetween over epoch seconds; the oracle as RANGE BETWEEN INTERVAL.
# --------------------------------------------------------------------------

def q98_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # epoch MICROSECONDS, not unix_timestamp: seconds truncation would
    # wrongly admit an event 3600.5 s back that the oracle's exact
    # INTERVAL comparison excludes. timestampdiff is NTZ-native (no
    # session-timezone reinterpretation, unlike a cast to TIMESTAMP).
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.count("*").over(w).cast("long").alias("n_trailing_1h"),
        round_avg_exact_over("value", w, 2, 6).alias("avg_trailing_1h"),
    )


Q98_SQL = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       ts,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
       {sql_round_avg_exact('value', 2, 6, over='OVER w')} AS avg_trailing_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
"""


# --------------------------------------------------------------------------
# q100 — cumulative distinct users per day. A windowed COUNT(DISTINCT)
# is unsupported (and would hold per-frame sets); the scalable identity
# is: distinct-so-far = running sum of FIRST OCCURRENCES. One groupBy
# per user (min day), one daily count, one running sum over the tiny
# per-day frame.
# --------------------------------------------------------------------------

def q100_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = first_day.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


Q100_SQL = """
WITH first_day AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
), daily AS (
  SELECT day, count(*) AS new_users FROM first_day GROUP BY 1
)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM daily
"""


# --------------------------------------------------------------------------
# q101 — ordered conversion funnel (view → click → purchase, strictly
# increasing event times). Each stage's earliest qualifying time is a
# conditional MIN over the previous stage's anchor — three grouped
# aggregations chained by per-user equi-joins, never a sequence scan.
# --------------------------------------------------------------------------

def q101_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    t1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.any_value("t_view").alias("t_view"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    users = e.select("user_id").distinct()
    return (
        users.join(t1, "user_id", "left")
        .join(t2.select("user_id", "t_click"), "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("funnel_stage"),
        )
    )


Q101_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t_click, any_value(t1.t_view) AS t_view
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
  GROUP BY 1
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
  GROUP BY 1
), users AS (
  SELECT DISTINCT user_id FROM events
)
SELECT CAST(u.user_id AS BIGINT) AS user_id,
       t1.t_view, t2.t_click, t3.t_purchase,
       CAST(CASE WHEN t3.t_purchase IS NOT NULL THEN 3
                 WHEN t2.t_click IS NOT NULL THEN 2
                 WHEN t1.t_view IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM users u
LEFT JOIN t1 ON u.user_id = t1.user_id
LEFT JOIN t2 ON u.user_id = t2.user_id
LEFT JOIN t3 ON u.user_id = t3.user_id
"""


# --------------------------------------------------------------------------
# q102 — cohort retention matrix: users grouped by first-activity week,
# counted by distinct activity in each later week offset. Two grouped
# aggregations + one equi-join back through the cohort anchor — the
# standard retention triangle, never a per-user timeline scan.
#
# The cohort anchor is an ABSOLUTE week index (weeks since Monday
# 1970-01-05), not weekofyear(): a calendar week number resets every
# January, so data spanning a year boundary would conflate week 52 of one
# year with week 52 of the next and produce negative/wrong offsets
# (e.g. first activity in ISO week 52/2019, activity in week 1/2020 ->
# offset -51). The epoch-week index is monotone across years; both sides
# (Spark and the DuckDB oracle) truncate to the Monday of the week and
# divide the day-diff by 7, which is exact because both are Monday-aligned.
# --------------------------------------------------------------------------

def q102_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch_week = F.floor(
        F.datediff(
            F.date_trunc("week", F.col("ts")).cast("date"),
            F.to_date(F.lit("1970-01-05")),
        )
        / 7
    )
    e = _t(spark, sf_dir, "events").select("user_id", epoch_week.alias("_wk"))
    cohort = e.groupBy("user_id").agg(F.min("_wk").alias("cohort_week"))
    active = e.distinct()  # (user, week) activity
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("_wk") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


Q102_SQL = """
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(floor(date_diff('day', DATE '1970-01-05',
                              CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)) / 7.0)
              AS BIGINT) AS w
  FROM events
), cohort AS (
  SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(wk.w - c.cohort_week AS BIGINT) AS week_offset,
       count(*) AS n_active
FROM wk JOIN cohort c ON wk.user_id = c.user_id
GROUP BY 1, 2
"""


QUERIES.update(
    {
        "q24_rainy_day_flag": QuerySpec(q24_rainy_day_flag, Q24_SQL, "A4 F13 J4"),
        "q25_wide_mean": QuerySpec(q25_wide_mean, Q25_SQL, "A3"),
        "q26_rollup_revenue": QuerySpec(q26_rollup_revenue, Q26_SQL, "A-ext rollup"),
        "q27_except_all": QuerySpec(q27_except_all, Q27_SQL, "U2-ext"),
        "q28_correlated_subquery": QuerySpec(q28_correlated_subquery, Q28_SQL, "J7 §4"),
        "q29_string_funcs": QuerySpec(q29_string_funcs, Q29_SQL, "F14 F15 F16"),
        "q41_asof_join": QuerySpec(q41_asof_join, Q41_SQL, "§2.3-ext as-of"),
        "q42_sessionize": QuerySpec(q42_sessionize, Q42_SQL, "§2.9-ext sessions"),
        "q43_range_join": QuerySpec(q43_range_join, Q43_SQL, "§2.3-ext range"),
        "q47_salted_distinct": QuerySpec(q47_salted_distinct, Q47_SQL, "§4 skew"),
        "q48_salted_collect": QuerySpec(q48_salted_collect, Q48_SQL, "§4 skew"),
        "q51_intersect_all": QuerySpec(q51_intersect_all, Q51_SQL, "U-ext"),
        "q52_full_outer": QuerySpec(q52_full_outer, Q52_SQL, "J-ext"),
        "q53_grouping_sets": QuerySpec(q53_grouping_sets, Q53_SQL, "A-ext"),
        "q54_ci_bands": QuerySpec(q54_ci_bands, Q54_SQL, "§2.11"),
        "q56_interesting_suppliers_scalable": QuerySpec(
            q56_interesting_suppliers_scalable, Q56_SQL, "§7 scalable flagship"
        ),
        "q104_scalable_picks": QuerySpec(
            q104_scalable_picks, None, "§7 scalable flagship (pure approx plan)"
        ),
        "q57_approx_distinct": QuerySpec(
            q57_approx_distinct, Q57_SQL, "A-ext sketch"
        ),
        "q58_asof_join_bucketed": QuerySpec(
            q58_asof_join_bucketed, Q41_SQL, "§2.3-ext as-of §4 skew"
        ),
        "q73_order_trend": QuerySpec(q73_order_trend, Q73_SQL, "§2.11-ext regression"),
        "q97_scd2_intervals": QuerySpec(q97_scd2_intervals, Q97_SQL, "§2.5-ext scd2"),
        "q98_trailing_window": QuerySpec(
            q98_trailing_window, Q98_SQL, "§2.5-ext range-frame"
        ),
        "q100_cumulative_users": QuerySpec(
            q100_cumulative_users, Q100_SQL, "§2.5-ext running-distinct"
        ),
        "q101_funnel": QuerySpec(q101_funnel, Q101_SQL, "§2.4-ext funnel"),
        "q102_cohort_retention": QuerySpec(
            q102_cohort_retention, Q102_SQL, "§2.4-ext cohort"
        ),
    }
)


# --------------------------------------------------------------------------
# q115 — partition-pruned date-range scan (r04 VERDICT #6): the §4
# "partition pruning — free once the layout exists" claim, previously
# pytest-only, exercised by a REGISTERED query. The events fact is
# written date-partitioned (write_parquet_partitioned — the layout a
# 100 TB deployment maintains once), then a 3-day range query reads it
# back: the date predicate is a partition filter, so the scan lists and
# reads exactly 3 day-directories regardless of table size
# (tests/test_plans.py asserts the pushed PartitionFilters and the
# pruned file count in the physical plan). The oracle states the same
# aggregation over the UNPARTITIONED events view with the equivalent
# date predicate — a full layout round-trip check: a partitioning bug
# that drops, duplicates, or mis-buckets rows breaks the hash. The
# layout is rebuilt per call into a deterministic temp dir (overwrite
# mode) so repeated runs don't accumulate files.
# --------------------------------------------------------------------------

_Q115_LO, _Q115_HI = "2024-01-10", "2024-01-12"

# per-PROCESS uniquifier: the layout dir is internal to the query (the
# oracle reads the unpartitioned view), but a world-shared fixed path
# raced when two processes (driver sweep + bench/pytest) rebuilt it with
# mode("overwrite") concurrently — one side's scan could list day
# directories the other side was deleting (review finding). Within a
# process repeated calls still reuse one dir, so runs don't accumulate.
import uuid as _uuid

_Q115_RUN_TAG = _uuid.uuid4().hex[:8]


def q115_layout_path(sf_dir: str) -> str:
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/q115_events_by_day_{tag}_{_Q115_RUN_TAG}"


def q115_partition_pruned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.sources.files import write_parquet_partitioned

    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value",
        F.to_date("ts").alias("event_date"),
    )
    path = q115_layout_path(sf_dir)
    # audit-scale fixture: 1 file/day keeps the listing tiny; at
    # production volume callers size this from per-partition bytes
    # (see write_parquet_partitioned docstring — compaction is opt-in)
    write_parquet_partitioned(e, path, ["event_date"], files_per_partition=1)
    back = spark.read.parquet(path).filter(
        (F.col("event_date") >= F.lit(_Q115_LO))
        & (F.col("event_date") <= F.lit(_Q115_HI))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


Q115_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{_Q115_LO}' AND DATE '{_Q115_HI}'
GROUP BY event_type
"""


QUERIES.update(
    {
        "q115_partition_pruned_events": QuerySpec(
            q115_partition_pruned_events, Q115_SQL, "§4 partition-pruning S-ext"
        ),
    }
)


# --------------------------------------------------------------------------
# q130 — CATALOG-pruned date-range scan (r07 verdict #7): q115's layout
# behind an external catalog table. q115 proves files-READ is constant
# (the path-based InMemoryFileIndex prunes after listing); the growth
# axis the r06 prune rehearsal named is files-LISTED — the path route
# walks the ENTIRE layout's directories up front, every query, and at
# years of history the listing is the cost. Registering the layout as
# an external partitioned table (sources/files.py::
# register_partitioned_table) moves partition→location metadata into
# the catalog: the planner prunes partitions from metadata
# (PruneFileSourcePartitions over a CatalogFileIndex) and only then
# lists the 3 surviving day-directories — listing is O(days queried),
# not O(days stored). Same 3-day aggregation, same oracle as q115; the
# scan's file index holding exactly the selected days is plan-asserted
# in tests/test_plans.py and measured across three layout decades by
# scripts/prune_rehearsal.py's catalog block.
# --------------------------------------------------------------------------


def q130_catalog_pruned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citibike_analysis_spark.sources.files import (
        register_partitioned_table,
        write_parquet_partitioned,
    )

    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value",
        F.to_date("ts").alias("event_date"),
    )
    path = q115_layout_path(sf_dir)
    write_parquet_partitioned(e, path, ["event_date"], files_per_partition=1)
    # table name carries the layout dir's full tag (sf-dir hash + per-
    # process run tag): a later q130 call at a DIFFERENT sf_dir must
    # register its own table, not repoint the name under a DataFrame an
    # earlier call already returned but has not collected yet
    import hashlib

    table = (
        "q130_events_by_day_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}_{_Q115_RUN_TAG}"
    )
    register_partitioned_table(
        spark, table, path, ["event_date"], schema=e.schema
    )
    back = spark.table(table).filter(
        (F.col("event_date") >= F.lit(_Q115_LO))
        & (F.col("event_date") <= F.lit(_Q115_HI))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


QUERIES.update(
    {
        "q130_catalog_pruned_events": QuerySpec(
            q130_catalog_pruned_events, Q115_SQL, "§4 catalog partition-pruning S-ext"
        ),
    }
)


# --------------------------------------------------------------------------
# q119 — driver-signed STREAMING correctness (r05 VERDICT #3): the
# batch/streaming parity claim, hash-verified. The streaming tier's 11
# behaviors were pytest-only; this registration replays a fixed,
# deterministic micro-batch sequence through the PRODUCTION streaming
# pipeline — `streaming.rollup.availability_rollup` (event-time tumbling
# window + watermark) via `write_rollup`'s update-mode foreachBatch
# changelog sink, state recovered with `latest_rollup` — and the DuckDB
# oracle states the equivalent BATCH 15-minute rollup (the q19 shape,
# reference README.md:196-224). Any watermark mis-drop, window
# misalignment, changelog overwrite bug, or state-eviction fault
# hash-mismatches.
#
# Replay determinism: samples derive from `events` by integer-exact
# arithmetic (station = user_id % 50, measures from event_id — both
# engines construct identical values); micro-batches are CONTIGUOUS
# ascending time ranges (ntile over ts), so no row is ever late beyond
# the 30-minute watermark and the final streamed state provably equals
# the all-data batch answer. File order is pinned with explicit mtimes
# (the file source processes oldest-first).
#
# Scale note: this is a REPLAY HARNESS, not a production path — the
# global ntile + driver-side batch write are audit-scale by design
# (bounded by the replay fixture, same class as q40's exact leg). The
# production streaming plan it exercises is the scale path: watermark-
# bounded state, partial-aggregable window min, changelog upsert sink.
# --------------------------------------------------------------------------

_Q119_BATCHES = 5


def _write_replay_batches(
    samples: DataFrame,
    in_dir: str,
    n_batches: int,
    arrow_schema,
    order_cols: list[str],
    sentinels=None,
    batch_col: str | None = None,
) -> None:
    """Replay-harness batch writer shared by the q119-q123 streaming
    parity rows: split ``samples`` into ``n_batches`` CONTIGUOUS
    ascending time ranges (global ntile — audit-scale, bounded by the
    replay fixture), write each as ONE parquet file via pyarrow, and pin
    ascending mtimes so the streaming file source processes them
    oldest-first deterministically. ``sentinels``: optional extra pandas
    frames appended as trailing batches (watermark-advancing fixtures).
    ``batch_col``: a precomputed 1-based batch index column to use
    instead of the ntile — required when TWO streams must share the
    SAME time boundaries (the q123 stream-stream join: independent
    ntiles would misalign the sides' watermark progress and let one
    side evict state the other still needs)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if batch_col is not None:
        pdf = (
            samples.withColumnRenamed(batch_col, "_b")
            .toPandas()
            .sort_values(["_b", order_cols[0]])
        )
    else:
        pdf = (
            samples.withColumn(
                "_b", F.ntile(n_batches).over(Window.orderBy(*order_cols))
            )
            .toPandas()
            .sort_values(["_b", order_cols[0]])
        )
    os.makedirs(in_dir, exist_ok=True)
    parts = [
        pdf[pdf["_b"] == i + 1].drop(columns=["_b"]) for i in range(n_batches)
    ]
    parts.extend(sentinels or [])
    for i, part in enumerate(parts):
        path = os.path.join(in_dir, f"b{i:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False).cast(arrow_schema),
            path,
        )
        # pin file-source order: oldest-modified processes first
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def q119_streaming_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pyarrow as pa

    from citibike_analysis_spark.streaming.rollup import (
        availability_rollup,
        latest_rollup,
        write_rollup,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # the watermark clock requires TIMESTAMP (LTZ); the session zone is
    # pinned UTC (session.py), so NTZ→LTZ here and LTZ→NTZ on the output
    # are exact inverses and the oracle's naive epoch math matches
    samples = e.select(
        F.col("ts").cast("timestamp").alias("last_communication_time"),
        (F.col("user_id") % 50).cast("long").alias("station_id"),
        (F.col("event_id") % 40).cast("long").alias("available_bikes"),
        ((F.col("event_id") * 7) % 45).cast("long").alias("available_docks"),
    )
    arrow_schema = pa.schema(
        [
            # tz-stamped so Spark's file source reads LTZ (matching the
            # declared schema); the naive→UTC arrow cast reinterprets
            # the same int64, which IS the wall clock under UTC session
            pa.field("last_communication_time", pa.timestamp("us", tz="UTC")),
            pa.field("station_id", pa.int64()),
            pa.field("available_bikes", pa.int64()),
            pa.field("available_docks", pa.int64()),
        ]
    )
    workdir = tempfile.mkdtemp(prefix="q119_replay_")
    try:
        in_dir = os.path.join(workdir, "in")
        _write_replay_batches(
            samples,
            in_dir,
            _Q119_BATCHES,
            arrow_schema,
            ["last_communication_time", "station_id", "available_bikes"],
        )
        stream = (
            spark.readStream.schema(samples.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out_dir = os.path.join(workdir, "out")
        q = write_rollup(
            availability_rollup(stream),
            checkpoint_dir=os.path.join(workdir, "ckpt"),
            output_dir=out_dir,
            query_name="q119_streaming_rollup_replay",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # pin the result before the workdir (its source files) is removed;
        # the driver/test collects AFTER this function returns. Tracked so
        # release_all()/cache_scope teardown can free the blocks (the
        # cache_scope contract: the terminal action runs inside the scope)
        from citibike_analysis_spark.cache import track

        final = track(latest_rollup(spark, out_dir).localCheckpoint(eager=True))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return final.select(
        F.col("time_interval").cast("timestamp_ntz").alias("time_interval"),
        F.col("station_id").cast("long").alias("station_id"),
        F.col("available_bikes").cast("long").alias("available_bikes"),
        F.col("available_docks").cast("long").alias("available_docks"),
        F.col("n_samples").cast("long").alias("n_samples"),
    )


Q119_SQL = """
WITH samples AS (
  SELECT make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900) * 1000000) AS time_interval,
         user_id % 50 AS station_id,
         event_id % 40 AS available_bikes,
         (event_id * 7) % 45 AS available_docks
  FROM events
  WHERE ts IS NOT NULL
)
SELECT time_interval,
       CAST(station_id AS BIGINT) AS station_id,
       CAST(min(available_bikes) AS BIGINT) AS available_bikes,
       CAST(min(available_docks) AS BIGINT) AS available_docks,
       count(*) AS n_samples
FROM samples
GROUP BY 1, 2
"""


QUERIES.update(
    {
        "q119_streaming_rollup_replay": QuerySpec(
            q119_streaming_rollup_replay, Q119_SQL, "§2.9 W4 streaming-batch-parity"
        ),
    }
)


# --------------------------------------------------------------------------
# q120 — driver-signed STATEFUL-streaming correctness: track_sessions
# (`streaming/enrich.py` — applyInPandasWithState, event-time timeout,
# the engine's custom stateful operator) replayed over the q119 replay
# harness and hash-verified against the BATCH gap-sessionize oracle
# (the q42 SQL shape). This closes the last §2.9 behavior class with no
# oracle row: q119 covers the windowed-aggregation state path; q120
# covers arbitrary per-key state + timeouts.
#
# Why the streamed result provably equals the batch answer here:
# micro-batches are contiguous ascending time ranges (no late data, so
# the single-open-session state never needs to reopen history — the
# documented parity condition watermark ≤ gap holds at 30 min = 30 min),
# and TWO trailing sentinel batches for a station id outside the real
# key space (99 ≥ the user_id % 50 range) advance the watermark one day
# past the data: sentinel batch 1 moves the watermark, sentinel batch 2
# triggers the event-time-timeout pass under it, so every real open
# session closes and emits. The sentinel's own session never closes and
# is the only thing withheld — exactly the rows the oracle (which never
# sees the sentinel) doesn't state.
# --------------------------------------------------------------------------

_Q120_SENTINEL_STATION = 99


def q120_streaming_sessions_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    from datetime import timedelta

    import pandas as pd
    import pyarrow as pa

    from citibike_analysis_spark.streaming.enrich import track_sessions

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    samples = e.select(
        F.col("ts").cast("timestamp").alias("last_communication_time"),
        (F.col("user_id") % 50).cast("int").alias("station_id"),
    )
    hi = samples.agg(F.max("last_communication_time").alias("m")).collect()[0]["m"]

    def sentinel(offset_minutes: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "last_communication_time": [
                    pd.Timestamp(hi + timedelta(days=1, minutes=offset_minutes))
                ],
                "station_id": [_Q120_SENTINEL_STATION],
            }
        )

    arrow_schema = pa.schema(
        [
            pa.field("last_communication_time", pa.timestamp("us", tz="UTC")),
            pa.field("station_id", pa.int32()),
        ]
    )
    workdir = tempfile.mkdtemp(prefix="q120_replay_")
    try:
        in_dir = os.path.join(workdir, "in")
        _write_replay_batches(
            samples,
            in_dir,
            _Q119_BATCHES,
            arrow_schema,
            ["last_communication_time", "station_id"],
            sentinels=[sentinel(0), sentinel(10)],
        )
        stream = (
            spark.readStream.schema(samples.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out_dir = os.path.join(workdir, "out")

        def sink(batch: DataFrame, epoch_id: int) -> None:
            if not batch.isEmpty():
                batch.write.mode("append").parquet(out_dir)

        q = (
            track_sessions(stream)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        from citibike_analysis_spark.cache import track

        final = track(spark.read.parquet(out_dir).localCheckpoint(eager=True))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return final.select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        F.col("n_samples").cast("long").alias("n_samples"),
    )


Q120_SQL = """
WITH samples AS (
  SELECT user_id % 50 AS station_id, ts
  FROM events WHERE ts IS NOT NULL
), ordered AS (
  SELECT station_id, ts,
         lag(ts) OVER (PARTITION BY station_id ORDER BY ts) AS prev
  FROM samples
), flagged AS (
  SELECT station_id, ts,
         CASE WHEN prev IS NULL OR ts > prev + INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sess AS (
  SELECT station_id, ts,
         sum(is_new) OVER (PARTITION BY station_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT CAST(station_id AS BIGINT) AS station_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_samples
FROM sess
GROUP BY station_id, session_idx
"""


QUERIES.update(
    {
        "q120_streaming_sessions_replay": QuerySpec(
            q120_streaming_sessions_replay, Q120_SQL, "§2.9 stateful streaming-batch-parity"
        ),
    }
)


# --------------------------------------------------------------------------
# q123 — driver-signed STREAM-STREAM join correctness:
# `streaming/enrich.py::join_weather_streams` (watermarked state on BOTH
# sides, event-time range condition, LEFT OUTER — the r05 outage fix
# whose inner-join predecessor silently dropped whole hours of samples)
# replayed over the micro-batch harness and hash-verified against the
# batch LEFT JOIN oracle. Fixture: samples derive from events (zip =
# user_id % 10); the weather stream is the deterministic hourly grid
# (distinct event hours × 10 zips) with every 5th hour REMOVED — a
# built-in outage window, so the null-padded left-outer path is
# exercised by construction, not by accident.
#
# Replay determinism needs one property the single-stream replays don't:
# BOTH streams must advance through the SAME time boundaries, so both
# sides are batched by one shared calendar split (6 windows over the
# events span; `batch_col`) rather than independent ntiles — with
# aligned ranges, a sample's matching weather row is always in the same
# or an earlier batch than the sample, and neither side's state evicts
# before the other side's rows arrive (the windows span days while the
# watermarks are 1 h / 3 h). Sentinel batches on BOTH streams advance
# the watermarks a day past the data and a second sentinel batch
# triggers the eviction pass, flushing every unmatched sample as its
# null-padded row; the sentinels' own zip ("99") is outside the real
# keyspace and filtered from the result.
# --------------------------------------------------------------------------


def q123_streaming_weather_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    import os
    import shutil
    import tempfile
    from datetime import timedelta, timezone

    import pandas as pd
    import pyarrow as pa

    from citibike_analysis_spark.cache import track
    from citibike_analysis_spark.streaming.enrich import join_weather_streams

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    lo, hi = e.agg(F.min("ts"), F.max("ts")).collect()[0]
    lo_us = int(lo.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    span_s = max(1.0, (hi - lo).total_seconds())
    # split width, the clamp below, and the writers' n_batches all
    # derive from _Q119_BATCHES so they cannot drift apart (r07 ADVICE:
    # a literal edited in one place would silently drop rows past the
    # writer's parts list)
    width_us = (math.ceil(span_s / _Q119_BATCHES) + 1) * 1_000_000

    def batch_of(ts_col: F.Column) -> F.Column:
        raw = F.floor((F.unix_micros(ts_col) - F.lit(lo_us)) / F.lit(width_us)) + 1
        return F.greatest(
            F.lit(1), F.least(F.lit(_Q119_BATCHES), raw)
        ).cast("long")

    samples = e.select(
        F.col("ts").cast("timestamp").alias("last_communication_time"),
        (F.col("user_id") % 10).cast("string").alias("zip"),
        F.col("event_id").cast("long").alias("event_id"),
    ).withColumn("_b", batch_of(F.col("last_communication_time")))
    hours = e.select(
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("time_hour")
    ).distinct()
    zips = spark.range(10).select(F.col("id").alias("_z"))
    weather = (
        hours.crossJoin(F.broadcast(zips))
        .withColumn(
            "_hidx", F.floor(F.unix_micros("time_hour") / F.lit(3_600_000_000))
        )
        .filter(F.col("_hidx") % 5 != 0)  # every 5th hour: weather outage
        .select(
            "time_hour",
            F.col("_z").cast("string").alias("zip"),
            ((F.col("_hidx") + F.col("_z")) % 50).cast("long").alias("temp"),
        )
        .withColumn("_b", batch_of(F.col("time_hour")))
    )

    def sent_samples(mins: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "last_communication_time": [
                    pd.Timestamp(hi + timedelta(days=1, minutes=mins))
                ],
                "zip": ["99"],
                "event_id": [-1],
            }
        )

    def sent_weather(mins: int) -> pd.DataFrame:
        h = (hi + timedelta(days=1, minutes=mins)).replace(
            minute=0, second=0, microsecond=0
        )
        return pd.DataFrame(
            {"time_hour": [pd.Timestamp(h)], "zip": ["99"], "temp": [0]}
        )

    s_schema = pa.schema(
        [
            pa.field("last_communication_time", pa.timestamp("us", tz="UTC")),
            pa.field("zip", pa.string()),
            pa.field("event_id", pa.int64()),
        ]
    )
    w_schema = pa.schema(
        [
            pa.field("time_hour", pa.timestamp("us", tz="UTC")),
            pa.field("zip", pa.string()),
            pa.field("temp", pa.int64()),
        ]
    )
    workdir = tempfile.mkdtemp(prefix="q123_replay_")
    try:
        s_dir = os.path.join(workdir, "samples_in")
        w_dir = os.path.join(workdir, "weather_in")
        _write_replay_batches(
            samples, s_dir, _Q119_BATCHES, s_schema,
            ["last_communication_time", "event_id"],
            sentinels=[sent_samples(0), sent_samples(70)],
            batch_col="_b",
        )
        _write_replay_batches(
            weather, w_dir, _Q119_BATCHES, w_schema,
            ["time_hour", "zip"],
            sentinels=[sent_weather(0), sent_weather(70)],
            batch_col="_b",
        )
        s_stream = (
            spark.readStream.schema(
                "last_communication_time timestamp, zip string, event_id long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(s_dir)
        )
        w_stream = (
            spark.readStream.schema("time_hour timestamp, zip string, temp long")
            .option("maxFilesPerTrigger", 1)
            .parquet(w_dir)
        )
        joined = join_weather_streams(s_stream, w_stream)
        out_dir = os.path.join(workdir, "out")

        def sink(batch: DataFrame, epoch_id: int) -> None:
            if not batch.isEmpty():
                batch.write.mode("append").parquet(out_dir)

        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = track(
            spark.read.parquet(out_dir)
            .filter(F.col("zip") != "99")
            .select(
                F.col("event_id").cast("long").alias("event_id"),
                "zip",
                F.col("last_communication_time")
                .cast("timestamp_ntz")
                .alias("ts"),
                F.col("time_hour").cast("timestamp_ntz").alias("time_hour"),
                F.col("temp").cast("long").alias("temp"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return final


Q123_SQL = """
WITH samples AS (
  SELECT event_id, CAST(user_id % 10 AS VARCHAR) AS zip, ts
  FROM events WHERE ts IS NOT NULL
), hours AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h
  FROM events WHERE ts IS NOT NULL
), weather AS (
  SELECT h AS time_hour, CAST(z AS VARCHAR) AS zip,
         (CAST(floor(epoch(h)) AS BIGINT) // 3600 + z) % 50 AS temp
  FROM hours, (SELECT unnest(generate_series(0, 9)) AS z) zs
  WHERE (CAST(floor(epoch(h)) AS BIGINT) // 3600) % 5 <> 0
)
SELECT s.event_id, s.zip, s.ts, w.time_hour, w.temp
FROM samples s
LEFT JOIN weather w
  ON s.zip = w.zip
 AND s.ts >= w.time_hour
 AND s.ts < w.time_hour + INTERVAL 1 HOUR
"""


QUERIES.update(
    {
        "q123_streaming_weather_join_replay": QuerySpec(
            q123_streaming_weather_join_replay,
            Q123_SQL,
            "§2.9 stream-stream-join streaming-batch-parity",
        ),
    }
)


# --------------------------------------------------------------------------
# q124 — driver-signed correctness for the DIMENSION UPSERT path (S6):
# `streaming/rollup.py::upsert_station_dimension` — the foreachBatch
# MERGE-style last-writer-wins upsert with the crash-recoverable
# staging/rename-swap snapshot — replayed over the micro-batch harness
# and hash-verified against the batch argmax oracle (latest row per
# station). Exercises the full production machinery inside a registered
# query: per-batch latest-per-key reduction, the snapshot anti-join
# merge, the staging write + dst→old→staging rename swap, and
# _recover_snapshot's pass on every batch.
#
# Determinism: the fixture pre-reduces to ONE update per (station, ts)
# (max event_id), so the last-writer winner per station is the unique
# max-ts row and the operator's content-hash tiebreak (which no SQL
# oracle can restate) never fires; tie behavior stays pinned by the
# upsert pytest.
# --------------------------------------------------------------------------


def q124_streaming_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pyarrow as pa

    from citibike_analysis_spark.cache import track
    from citibike_analysis_spark.streaming.rollup import upsert_station_dimension

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    updates = (
        e.groupBy(
            (F.col("user_id") % 50).cast("long").alias("station_id"),
            F.col("ts").cast("timestamp").alias("last_communication_time"),
        )
        .agg(F.max("event_id").alias("_eid"))
        .select(
            "station_id",
            "last_communication_time",
            (F.col("_eid") % 40).cast("long").alias("available_bikes"),
        )
    )
    arrow_schema = pa.schema(
        [
            pa.field("station_id", pa.int64()),
            pa.field("last_communication_time", pa.timestamp("us", tz="UTC")),
            pa.field("available_bikes", pa.int64()),
        ]
    )
    workdir = tempfile.mkdtemp(prefix="q124_replay_")
    try:
        in_dir = os.path.join(workdir, "in")
        _write_replay_batches(
            updates, in_dir, 5, arrow_schema,
            ["last_communication_time", "station_id"],
        )
        stream = (
            spark.readStream.schema(
                "station_id long, last_communication_time timestamp, "
                "available_bikes long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        snapshot = os.path.join(workdir, "stations_dim")
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda b, e_: upsert_station_dimension(b, snapshot))
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = track(
            spark.read.parquet(snapshot)
            .select(
                "station_id",
                F.col("last_communication_time")
                .cast("timestamp_ntz")
                .alias("last_communication_time"),
                "available_bikes",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return final


Q124_SQL = """
WITH updates AS (
  SELECT user_id % 50 AS station_id, ts, max(event_id) AS eid
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), ranked AS (
  SELECT station_id, ts, eid,
         row_number() OVER (PARTITION BY station_id ORDER BY ts DESC) AS rn
  FROM updates
)
SELECT CAST(station_id AS BIGINT) AS station_id,
       ts AS last_communication_time,
       CAST(eid % 40 AS BIGINT) AS available_bikes
FROM ranked
WHERE rn = 1
"""


QUERIES.update(
    {
        "q124_streaming_upsert_replay": QuerySpec(
            q124_streaming_upsert_replay,
            Q124_SQL,
            "§2.9 S6 upsert streaming-batch-parity",
        ),
    }
)


# --------------------------------------------------------------------------
# q125 — driver-signed CHECKPOINT-RESUME correctness: the q119 rollup
# replay split across a QUERY RESTART. The first three micro-batch
# files land, the query runs and is STOPPED; the remaining two files
# land and a new query starts from the SAME checkpoint — resuming from
# offsets + state store, the semantics that replace the reference's
# iloc[-24] CSV resume (README.md:714-727). The resumed stream must
# neither reprocess the consumed files (double-counted n_samples would
# break the hash) nor lose the in-flight window state (dropped minima
# would break it), so the final changelog state hash-matching the batch
# oracle (the q119 shape) IS the recovery proof. Fixture determinism is
# q119's: contiguous ascending time ranges, pinned file order.
# --------------------------------------------------------------------------


def q125_streaming_resume_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pyarrow as pa

    from citibike_analysis_spark.cache import track
    from citibike_analysis_spark.streaming.rollup import (
        availability_rollup,
        latest_rollup,
        write_rollup,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    samples = e.select(
        F.col("ts").cast("timestamp").alias("last_communication_time"),
        (F.col("user_id") % 50).cast("long").alias("station_id"),
        (F.col("event_id") % 40).cast("long").alias("available_bikes"),
        ((F.col("event_id") * 7) % 45).cast("long").alias("available_docks"),
    )
    arrow_schema = pa.schema(
        [
            pa.field("last_communication_time", pa.timestamp("us", tz="UTC")),
            pa.field("station_id", pa.int64()),
            pa.field("available_bikes", pa.int64()),
            pa.field("available_docks", pa.int64()),
        ]
    )
    workdir = tempfile.mkdtemp(prefix="q125_replay_")
    try:
        stage_dir = os.path.join(workdir, "stage")
        in_dir = os.path.join(workdir, "in")
        os.makedirs(in_dir)
        _write_replay_batches(
            samples, stage_dir, _Q119_BATCHES, arrow_schema,
            ["last_communication_time", "station_id", "available_bikes"],
        )
        files = sorted(os.listdir(stage_dir))
        ckpt = os.path.join(workdir, "ckpt")
        out_dir = os.path.join(workdir, "out")

        def run(n_land: int) -> None:
            for f in files[:n_land]:
                if not os.path.exists(os.path.join(in_dir, f)):
                    shutil.copy2(os.path.join(stage_dir, f), os.path.join(in_dir, f))
            stream = (
                spark.readStream.schema(samples.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            )
            q = write_rollup(
                availability_rollup(stream),
                checkpoint_dir=ckpt,
                output_dir=out_dir,
                query_name="q125_streaming_resume_replay",
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()  # phase 1 ends in a clean STOP; phase 2 resumes

        run(3)   # first three micro-batches, then the query goes down
        run(len(files))  # remaining files land; resume from checkpoint
        final = track(latest_rollup(spark, out_dir).localCheckpoint(eager=True))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return final.select(
        F.col("time_interval").cast("timestamp_ntz").alias("time_interval"),
        F.col("station_id").cast("long").alias("station_id"),
        F.col("available_bikes").cast("long").alias("available_bikes"),
        F.col("available_docks").cast("long").alias("available_docks"),
        F.col("n_samples").cast("long").alias("n_samples"),
    )


QUERIES.update(
    {
        "q125_streaming_resume_replay": QuerySpec(
            q125_streaming_resume_replay,
            Q119_SQL,  # same batch shape: resume must land on the same answer
            "§2.9 checkpoint-resume streaming-batch-parity",
        ),
    }
)


# --------------------------------------------------------------------------
# q126 — driver-signed correctness for the FEED-INGEST path (S4): the
# reference's raw camelCase feed JSON → `streaming/ingest.flatten_feed`
# (declared 18-field schema, 12-hour-clock `lastCommunicationTime`
# parse — reference README.md:94,99-123) → availability_rollup →
# changelog sink, replayed end-to-end from JSON-LINES files and
# hash-verified against the batch rollup oracle. This is the exact
# production composition (`read_feed_stream` → rollup) and the only
# §2.9 entry point the other replays bypass (they feed parquet straight
# to the operators). A schema drift, rename-map break, or AM/PM parse
# regression lands here as a hash mismatch.
#
# The feed strings carry 1-second precision (the reference format), so
# samples are second-truncated relative to events.ts — which changes NO
# output column: the 900-second bucket floors epoch seconds anyway and
# min/count are truncation-invariant, so the oracle is Q119_SQL
# verbatim. Feed strings are formatted JVM-side (`date_format` with the
# same pattern family `to_timestamp` parses) for exact round-trip.
# --------------------------------------------------------------------------


def q126_streaming_feed_ingest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from citibike_analysis_spark.cache import track
    from citibike_analysis_spark.streaming.ingest import read_feed_stream
    from citibike_analysis_spark.streaming.rollup import (
        availability_rollup,
        latest_rollup,
        write_rollup,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    rows = e.select(
        F.col("ts").cast("timestamp").alias("_ts"),
        F.date_format(
            F.col("ts").cast("timestamp"), "yyyy-MM-dd hh:mm:ss a"
        ).alias("lct"),
        (F.col("user_id") % 50).cast("int").alias("sid"),
        (F.col("event_id") % 40).cast("int").alias("bikes"),
        ((F.col("event_id") * 7) % 45).cast("int").alias("docks"),
    )
    pdf = (
        rows.withColumn(
            "_b",
            F.ntile(_Q119_BATCHES).over(Window.orderBy("_ts", "sid", "bikes")),
        )
        .toPandas()
        .sort_values(["_b", "_ts"])
    )
    workdir = tempfile.mkdtemp(prefix="q126_replay_")
    try:
        in_dir = os.path.join(workdir, "in")
        os.makedirs(in_dir)
        for i in range(_Q119_BATCHES):
            part = pdf[pdf["_b"] == i + 1]
            path = os.path.join(in_dir, f"b{i:03d}.json")
            with open(path, "w") as fh:
                for r in part.itertuples(index=False):
                    fh.write(
                        _json.dumps(
                            {
                                "id": int(r.sid),
                                "stationName": f"S{int(r.sid)}",
                                "availableBikes": int(r.bikes),
                                "availableDocks": int(r.docks),
                                "statusValue": "In Service",
                                "lastCommunicationTime": r.lct,
                            }
                        )
                        + "\n"
                    )
            os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        out_dir = os.path.join(workdir, "out")
        q = write_rollup(
            availability_rollup(read_feed_stream(spark, in_dir)),
            checkpoint_dir=os.path.join(workdir, "ckpt"),
            output_dir=out_dir,
            query_name="q126_streaming_feed_ingest_replay",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = track(latest_rollup(spark, out_dir).localCheckpoint(eager=True))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return final.select(
        F.col("time_interval").cast("timestamp_ntz").alias("time_interval"),
        F.col("station_id").cast("long").alias("station_id"),
        F.col("available_bikes").cast("long").alias("available_bikes"),
        F.col("available_docks").cast("long").alias("available_docks"),
        F.col("n_samples").cast("long").alias("n_samples"),
    )


QUERIES.update(
    {
        "q126_streaming_feed_ingest_replay": QuerySpec(
            q126_streaming_feed_ingest_replay,
            Q119_SQL,  # second truncation changes no output column
            "§2.9 S4 feed-ingest streaming-batch-parity",
        ),
    }
)
