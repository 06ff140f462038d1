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


def test_nonconvergence_raises_instead_of_silent_wrong_labels(spark):
    # ADVICE r1: a chain with diameter > max_iter used to return
    # partially-propagated labels silently; it must raise now
    import pytest

    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="could not confirm convergence"):
        connected_components(df, max_iter=3)


def _cc_star(spark, edges, **kw):
    from citibike_analysis_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components_star(df, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_star_matches_label_propagation_on_random_graphs(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 45))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        assert _cc_star(spark, edges) == _cc(spark, edges)


def test_star_converges_in_olog_rounds_on_a_chain(spark):
    # path graph 0-..-64: diameter 64. Label propagation needs ~64 rounds
    # (raises at 12); large-star/small-star finishes within ~log2(n)+slack.
    import pytest

    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=12)
    got = _cc_star(spark, edges, max_iter=12)
    assert got == {i: 0 for i in range(65)}


def test_star_components_and_singletons(spark):
    got = _cc_star(spark, [(1, 2), (10, 11), (11, 12), (5, 5)])
    # self-loop 5-5 still registers vertex 5 as its own component
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 5: 5}


def test_depth_equals_max_iter_converges(spark):
    # review finding: labels stabilizing exactly at round max_iter could
    # only be CONFIRMED one round later, so the budget boundary raised
    # "diameter > max_iter" on a fully-correct result; the confirmation
    # round is now internal bookkeeping
    from citibike_analysis_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(5)]  # propagation depth 5
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=5).collect()
    }
    assert set(out.values()) == {0}


def test_dedup_clusters_null_id_rides_through_as_singleton(spark):
    # review finding: the inner size-join on canonical_id silently
    # DROPPED NULL-id documents (NULL never equals NULL)
    from citibike_analysis_spark.operators.graph import dedup_clusters

    docs = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id: long"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, "doc_id", pairs).collect()}
    assert set(rows) == {1, 2, None}
    assert rows[1]["canonical_id"] == 1 and rows[1]["cluster_size"] == 2
    assert rows[None]["canonical_id"] is None
    assert rows[None]["cluster_size"] == 1
