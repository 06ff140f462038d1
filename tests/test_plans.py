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


def _global_sorts(plan: str) -> int:
    """Count whole-dataset single-partition sorts: a Sort node whose
    child (next tree line) is an Exchange SinglePartition. The benign
    1-row sketch-merge exchanges of global aggregates don't match."""
    lines = plan.splitlines()
    return sum(
        1
        for a, b in zip(lines, lines[1:])
        if "Sort [" in a and "Exchange SinglePartition" in b
    )


def test_scalable_flagship_has_no_global_sort(spark):
    # the exact flagship funnels the whole variability table through 3
    # single-partition ntile sorts; the approx-quantile variant must have
    # none — that is the entire point of the 100 TB plan (its remaining
    # SinglePartition exchanges move one sketch row each)
    exact = _plan(SPECS["q20_interesting_suppliers"].fn(spark, SF001))
    scalable = _plan(SPECS["q104_scalable_picks"].fn(spark, SF001))
    assert _global_sorts(exact) >= 1  # documents the exact plan's limit
    assert _global_sorts(scalable) == 0
    assert "ntile(100)" not in scalable  # (plain "ntile" ⊂ "percentile_approx")


def test_scalable_flagship_picks_overlap_exact(spark):
    exact = {
        r["l_suppkey"]
        for r in SPECS["q20_interesting_suppliers"].fn(spark, SF001).collect()
    }
    approx = {
        r["l_suppkey"]
        for r in SPECS["q104_scalable_picks"].fn(spark, SF001).collect()
    }
    assert approx, "scalable variant selected nothing"
    # At 100 suppliers the counter metrics are massively tied, and exact
    # ntile splits tie runs positionally while the approx plan buckets
    # them together (documented convention in operators/windows.py) — so
    # gate survivorship genuinely differs at this scale. The bound pins
    # substantial agreement and catches regressions to empty/garbage;
    # at production cardinality tie runs are a vanishing fraction and
    # the sets converge.
    overlap = len(exact & approx) / max(len(exact | approx), 1)
    assert overlap >= 0.4, f"overlap {overlap}: exact={exact} approx={approx}"
    assert len(approx) <= 2 * max(len(exact), 1)
    # ... and the registered q56 audit pins the bucketing against its
    # exact ties-high cume-dist reference (SF-robust; see q56 docstring)
    [audit] = SPECS["q56_interesting_suppliers_scalable"].fn(spark, SF001).collect()
    assert audit["n_exact_picks"] == len(exact)
    assert audit["divergence_le_1"] is True
    assert audit["gates_sandwich_ok"] is True


def test_approx_distinct_error_bounded(spark):
    from citibike_analysis_spark.sources.tables import load_table
    from pyspark.sql import functions as FF

    li = load_table(spark, SF001, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(FF.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    # the registered q57 is the in-engine audit of the same 5σ bound
    rows = SPECS["q57_approx_distinct"].fn(spark, SF001).collect()
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_orders"] == exact[r["l_returnflag"]]
        assert r["within_5_sigma"] is True, r


def test_ngram_index_shuffle_carries_hashes_not_text(spark):
    # the inverted-index self-join must move (id, 64-bit hash) rows; if
    # shingle *strings* appear in any exchange the shuffle width regressed
    plan = _plan(SPECS["q34_ngram_jaccard"].fn(spark, SF001))
    for frag in plan.splitlines():
        if frag.strip().startswith("Exchange") and "_s#" in frag:
            pytest.fail(f"shingle text in a shuffle: {frag.strip()[:120]}")


def test_q39_production_near_dup_finds_reingested_copies_exactly(spark):
    # r03 VERDICT #5: the REGISTERED q39 is the production θ=0.9
    # auto-bits form over the corpus ∪ its re-ingested copy. Identical
    # vectors share every sign bucket with probability 1, so the output
    # must be EXACTLY one (i, i+OFFSET, 1.0) pair per original vector —
    # plus the no-all-pairs plan shape.
    from citibike_analysis_spark.plans.llm import _REINGEST_OFFSET
    from citibike_analysis_spark.sources.tables import load_table

    out = SPECS["q39_embedding_near_dup"].fn(spark, SF001)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # planes attach ×2 sides
    ids = [
        r["vec_id"]
        for r in load_table(spark, SF001, "embeddings").select("vec_id").collect()
    ]
    got = {(r["id_a"], r["id_b"], r["cosine_sim"]) for r in out.collect()}
    assert got == {(i, i + _REINGEST_OFFSET, 1.0) for i in ids}


def test_q105_calibration_near_dup_no_all_pairs_and_exact_parity(spark):
    # VERDICT r1 #2 (pre-r04 q39): the loose-θ calibration must still be
    # the bucketed sign-LSH plan. The corpus self-join must be an
    # equi-join on (table, bucket) — the only nested-loop joins allowed
    # are the 1-row planes broadcasts.
    out = SPECS["q105_neardup_calibration"].fn(spark, SF001)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # planes attach ×2 sides

    # Parity: at cos≥0.45 the tuned banding (bits=2, tables=24,
    # deterministic seed) recovers the exact all-pairs result — the same
    # relationship the driver's DuckDB oracle checks at sf0.01.
    from citibike_analysis_spark.operators.similarity import as_double, cosine
    from citibike_analysis_spark.sources.tables import load_table

    e = load_table(spark, SF001, "embeddings").select(
        F.col("vec_id").alias("_id"), as_double(F.col("embedding")).alias("_v")
    )
    a, b = e.alias("a"), e.alias("b")
    exact = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in (
            a.join(b, F.col("a._id") < F.col("b._id"))
            .withColumn("cosine_sim", cosine(F.col("a._v"), F.col("b._v")))
            .filter(F.col("cosine_sim") >= 0.45)
            .select(
                F.col("a._id").cast("long").alias("id_a"),
                F.col("b._id").cast("long").alias("id_b"),
                F.round("cosine_sim", 6).alias("cosine_sim"),
            )
            .collect()
        )
    }
    bucketed = {(r["id_a"], r["id_b"], r["cosine_sim"]) for r in out.collect()}
    assert exact, "fixture corpus lost its >=0.45 pairs"
    assert bucketed == exact


def test_sampling_and_budget_queries_have_scale_shapes(spark):
    # q65/q66: pure narrow filters — the md5 threshold must reach the
    # scan as a data filter (no shuffle anywhere in the plan)
    for q in ("q65_stratified_sample", "q66_weighted_mixture"):
        plan = _plan(SPECS[q].fn(spark, SF001))
        assert "Exchange" not in plan, f"{q} shuffles"
        assert "md5" in plan and "FileScan" in plan
    # q67: exactly one hash exchange (the per-source window), no global sort
    plan = _plan(SPECS["q67_token_budget"].fn(spark, SF001))
    assert plan.count("Exchange hashpartitioning(source") == 1
    assert _global_sorts(plan) == 0
    # q63: decontamination joins are equi-joins, never a product
    plan = _plan(SPECS["q63_decontaminate"].fn(spark, SF001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q115_partition_filter_prunes_the_scan(spark):
    # r04 VERDICT #6: the date predicate must reach the FileSourceScan
    # as a PartitionFilter (directory-listing-level pruning), and the
    # scan must touch only the 3 matching day-directories — not the
    # whole 30-day layout
    from citibike_analysis_spark.plans.relational import (
        _Q115_HI,
        _Q115_LO,
        q115_layout_path,
        q115_partition_pruned_events,
    )

    df = q115_partition_pruned_events(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "event_date" in pf

    from pyspark.sql import functions as F

    back = spark.read.parquet(q115_layout_path("/root/testdata/sf0.001")).filter(
        (F.col("event_date") >= F.lit(_Q115_LO))
        & (F.col("event_date") <= F.lit(_Q115_HI))
    )
    # inputFiles() reflects the PRE-pruning file index; input_file_name()
    # reflects what the pruned scan actually reads
    read_files = [
        r[0] for r in back.select(F.input_file_name()).distinct().collect()
    ]
    days = {f.split("event_date=")[1].split("/")[0] for f in read_files}
    assert days == {"2024-01-10", "2024-01-11", "2024-01-12"}


def test_q130_catalog_prunes_the_listing_not_just_the_read(spark):
    # r07 verdict #7: q115 proves files-READ constant; the catalog form
    # must prune files-LISTED too. Path route: InMemoryFileIndex lists
    # the WHOLE layout up front (its file index holds every day).
    # Catalog route: PruneFileSourcePartitions rewrites the
    # CatalogFileIndex to an index over ONLY the selected partitions —
    # the scan's post-planning file index holds exactly the 3 day-files.
    from pyspark.sql import functions as F

    from citibike_analysis_spark.plans.relational import (
        _Q115_HI,
        _Q115_LO,
        _Q115_RUN_TAG,
        q115_layout_path,
        q130_catalog_pruned_events,
    )

    df = q130_catalog_pruned_events(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PartitionFilters: [" in plan

    def indexed_files(frame) -> list[str]:
        # files in the scan's FILE INDEX after planning = what the
        # planner LISTED for this query (not what it read)
        scan = frame._jdf.queryExecution().executedPlan().collectLeaves().head()
        return list(scan.relation().location().inputFiles())

    import hashlib

    table = (
        "q130_events_by_day_"
        f"{hashlib.md5(b'/root/testdata/sf0.001').hexdigest()[:10]}"
        f"_{_Q115_RUN_TAG}"
    )
    pred = (F.col("event_date") >= F.lit(_Q115_LO)) & (
        F.col("event_date") <= F.lit(_Q115_HI)
    )
    via_catalog = indexed_files(spark.table(table).filter(pred))
    days = {f.split("event_date=")[1].split("/")[0] for f in via_catalog}
    assert days == {"2024-01-10", "2024-01-11", "2024-01-12"}

    # the path route's index over the SAME layout holds all 30 days —
    # the contrast that makes the catalog claim a claim
    via_path = indexed_files(
        spark.read.parquet(q115_layout_path("/root/testdata/sf0.001")).filter(
            pred
        )
    )
    assert len(via_path) > len(via_catalog)

    # result parity: both routes aggregate to identical rows
    got = sorted(map(tuple, df.collect()))
    from citibike_analysis_spark.plans.relational import (
        q115_partition_pruned_events,
    )

    want = sorted(
        map(tuple, q115_partition_pruned_events(spark, "/root/testdata/sf0.001").collect())
    )
    assert got == want


def test_catalog_layout_add_partition_is_incremental(spark, tmp_path):
    # the documented incremental-loader flow (register_partitioned_table
    # docstring): a NEW day lands as one directory + one ADD PARTITION —
    # no re-walk of the existing layout — and is immediately queryable
    # through the catalog with the listing still pruned to the queried
    # days only
    from pyspark.sql import functions as F

    from citibike_analysis_spark.sources.files import (
        register_partitioned_table,
        write_parquet_partitioned,
    )

    base = str(tmp_path / "events_by_day")
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 3:02d}", float(i)) for i in range(30)],
        "event_id long, event_date string, value double",
    ).withColumn("event_date", F.to_date("event_date"))
    write_parquet_partitioned(df, base, ["event_date"], files_per_partition=1)
    table = "t_addpart_test"
    try:
        register_partitioned_table(spark, table, base, ["event_date"])
        assert spark.table(table).count() == 30
        # a new day arrives: its directory is written OUTSIDE the
        # catalog's knowledge, then registered with one ADD PARTITION
        newday = spark.createDataFrame(
            [(100, float(100))], "event_id long, value double"
        )
        loc = f"{base}/event_date=2024-01-09"
        newday.write.mode("overwrite").parquet(loc)
        spark.sql(
            f"ALTER TABLE {table} ADD PARTITION (event_date='2024-01-09') "
            f"LOCATION '{loc}'"
        )
        got = spark.table(table).filter(F.col("event_date") == "2024-01-09")
        assert [r["event_id"] for r in got.collect()] == [100]
        # the single-day query's post-planning file index holds only the
        # new day (catalog pruning covers ADDed partitions too)
        scan = got._jdf.queryExecution().executedPlan().collectLeaves().head()
        files = list(scan.relation().location().inputFiles())
        assert files and all("event_date=2024-01-09" in f for f in files)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
