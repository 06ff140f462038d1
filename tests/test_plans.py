"""Physical-plan regression tests (SURVEY.md §4): the scale properties
that make these queries survive 100 TB must be visible in the plan, not
assumed — pushdown reaching the scan, dimension joins broadcast, per-group
top-k limited below the shuffle, and no accidental cross products.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citibike_analysis_spark.plans import all_queries
from tests.conftest import SF001


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SPECS = all_queries()


def test_filter_and_projection_reach_the_scan(spark):
    # q03 filters orders and projects a column subset: the parquet scan
    # must carry pushed filters and a pruned read schema, not the full table
    plan = _plan(SPECS["q03_filter_project"].fn(spark, SF001))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [")[1].split("\n")[0]
    assert "o_orderstatus" in pushed
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "o_comment" not in read_schema  # untouched wide column pruned

def test_dimension_joins_broadcast_never_shuffle_the_fact(spark):
    # q05 joins orders→customer→nation→region: every dimension must enter
    # as a broadcast, and no sort-merge join may appear
    plan = _plan(SPECS["q05_regional_revenue"].fn(spark, SF001))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_flagship_semi_join_is_broadcast(spark):
    # BASELINE.md regression guard: the reduction query's final fact
    # filter is a broadcast semi-join — never a correlated per-row scan
    plan = _plan(SPECS["q20_interesting_suppliers"].fn(spark, SF001))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_top_k_per_group_limits_below_the_shuffle(spark):
    from citibike_analysis_spark.operators.windows import top_k_per_group
    from citibike_analysis_spark.sources.tables import load_table

    li = load_table(spark, SF001, "lineitem")
    out = top_k_per_group(
        li, ["l_suppkey"], [F.desc("l_extendedprice"), F.asc("l_orderkey")], k=3,
        rank_fn=F.row_number(),
    )
    # WindowGroupLimit keeps ≤k rows per group on the map side, so the
    # shuffle moves survivors, not the full fact table
    assert "WindowGroupLimit" in _plan(out)


def test_spatial_band_join_is_an_equi_join(spark):
    # the grid-bucketed band join must plan as a hash/sort-merge equi-join
    # on the cell key — never a cartesian/broadcast nested loop product
    plan = _plan(SPECS["q21_spatial_neighbors"].fn(spark, SF001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_shuffles_each_side_once(spark):
    # union+window as-of: one hash exchange on the join key feeding one
    # sort+window — no per-key join blow-up, no extra exchanges
    plan = _plan(SPECS["q41_asof_join"].fn(spark, SF001))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_ngram_index_shuffle_carries_hashes_not_text(spark):
    # the inverted-index self-join must move (id, 64-bit hash) rows; if
    # shingle *strings* appear in any exchange the shuffle width regressed
    plan = _plan(SPECS["q34_ngram_jaccard"].fn(spark, SF001))
    for frag in plan.splitlines():
        if frag.strip().startswith("Exchange") and "_s#" in frag:
            pytest.fail(f"shingle text in a shuffle: {frag.strip()[:120]}")
