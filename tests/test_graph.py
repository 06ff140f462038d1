"""Connected-components / dedup-cluster tests (operators/graph.py).

Pins: multi-hop chains close transitively, separate components stay
separate, singletons are their own canonical, cluster sizes count every
member, and convergence happens within max_iter on a path graph (the
worst diameter case for label propagation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from citibike_analysis_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_chain_closes_transitively(spark):
    # 1-2, 2-3, 3-4 : one component labeled by its min id
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_components_stay_separate(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_long_path_converges(spark):
    # path graph 0-1-...-12: diameter 12, needs several propagation
    # rounds; exercises the localCheckpoint/lineage path for real
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(13)}


def test_dedup_clusters_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = dedup_clusters(docs, "doc_id", pairs)
    got = {r["doc_id"]: (r["canonical_id"], r["cluster_size"]) for r in out.collect()}
    assert got == {
        0: (0, 3), 3: (0, 3), 5: (0, 3),  # closed cluster
        1: (1, 1), 2: (2, 1), 4: (4, 1),  # singletons
    }
    # the "keep one copy" filter retains exactly one doc per cluster
    kept = out.filter(F.col("doc_id") == F.col("canonical_id")).count()
    assert kept == 4
