"""Regression tests for the r04 operator-hardening review findings:
edge inputs that previously produced silently wrong output or crashes.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def test_asof_join_ignores_null_right_timestamps(spark):
    # a NULL-ts right row sorts FIRST ascending and used to become the
    # carry-in payload for left rows with no earlier real match — the
    # LATERAL form (ts_r <= ts_l is NULL-never-true) returns NULL values
    from citibike_analysis_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    right = spark.createDataFrame(
        [(1, None, 99.0), (1, datetime(2024, 1, 1, 12), 7.0)],
        "k int, ts timestamp, v double",
    )
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10)), (1, datetime(2024, 1, 1, 13))],
        "k int, ts timestamp",
    )
    def bucketed(*args):
        return asof_join_bucketed(*args, bucket_seconds=3600)

    for fn in (asof_join, bucketed):
        out = {
            r["ts"]: (r["v_asof"], r["ts_asof"])
            for r in fn(left, right, ["k"], "ts", "ts", ["v"]).collect()
        }
        assert out[datetime(2024, 1, 1, 10)] == (None, None), fn.__name__
        assert out[datetime(2024, 1, 1, 13)] == (
            7.0,
            datetime(2024, 1, 1, 12),
        ), fn.__name__


def test_zero_vector_never_wins_topk(spark):
    # cosine(q, 0-vector) used to be 0/0 = NaN, which sorts ABOVE every
    # real similarity in the descending rank window → the zero vector
    # was rank-1 for every query
    from citibike_analysis_spark.operators.similarity import brute_force_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=1).collect()
    assert len(out) == 1
    assert out[0]["neighbor_id"] == 1
    assert out[0]["cosine_sim"] > 0.9


def test_dedup_clusters_accepts_id_named_id(spark):
    # a caller whose id column is literally "id" used to hit
    # AMBIGUOUS_REFERENCE on the post-join select
    from citibike_analysis_spark.operators.graph import dedup_clusters

    docs = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = {
        r["id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_clusters(docs, "id", pairs).collect()
    }
    assert got == {1: (1, 2), 2: (1, 2), 3: (3, 1)}


def test_connected_components_survives_hash_scale_ids(spark):
    # sum(component) as the convergence detector overflowed long under
    # ANSI mode for xxhash64-derived vertex ids (~9e18); the xor
    # signature must handle them
    from citibike_analysis_spark.operators.graph import connected_components

    big = 9_200_000_000_000_000_000
    pairs = spark.createDataFrame(
        [(big, big - 1), (big - 1, big - 2), (5, 6)],
        "src long, dst long",
    )
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got[big] == got[big - 1] == got[big - 2] == big - 2
    assert got[5] == got[6] == 5


def test_lsh_rejects_dim_mismatch(spark):
    # a 128-dim corpus against default 64-dim planes used to zero every
    # sign bit (single bucket, silent all-pairs); now it fails loudly
    import pytest

    from citibike_analysis_spark.operators.similarity import (
        near_duplicate_embeddings,
    )

    emb = spark.createDataFrame(
        [(0, [1.0] * 128), (1, [1.0] * 128)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="plane dimension"):
        near_duplicate_embeddings(
            emb, "vec_id", "embedding", threshold=0.9, bits=4, tables=2
        ).count()


def test_write_sharded_empty_partitioned_returns_empty_manifest(spark, tmp_path):
    # a PARTITIONED write of zero rows commits only _SUCCESS; the
    # manifest step used to crash on UNABLE_TO_INFER_SCHEMA after the
    # successful write
    from citibike_analysis_spark.sources.files import write_sharded

    df = spark.createDataFrame([], "doc_id long, day string, text string")
    m = write_sharded(
        df, str(tmp_path / "out"), 1000, partition_cols=["day"]
    )
    assert m.count() == 0
    assert m.columns == ["shard", "n_rows"]


# --------------------------------------------------------------------------
# r04 ADVICE regressions (fixed r05)
# --------------------------------------------------------------------------


def test_grid_cell_null_coordinates_do_not_crash(spark):
    # assert_true(abs(NULL) <= bound) is NULL → the whole job used to
    # fail with a misleading 'latitude outside ±60°'; NULL coordinates
    # must keep NULL cells and simply never pair (the asof/geodesic
    # NULL-propagation convention), while out-of-range still raises
    import pytest

    from citibike_analysis_spark.operators.spatial import within_distance_pairs

    df = spark.createDataFrame(
        [
            (1, 40.7, -74.0),
            (2, 40.7001, -74.0001),
            (3, None, -74.0),
            (4, 40.7, None),
        ],
        "sid int, lat double, lon double",
    )
    pairs = {
        (r["a_sid"], r["b_sid"])
        for r in within_distance_pairs(df, "sid", "lat", "lon", 0.5, 41.0).collect()
    }
    assert pairs == {(1, 2), (2, 1)}  # NULL rows silently excluded

    polar = spark.createDataFrame(
        [(1, 80.0, 10.0), (2, 80.0, 10.1)], "sid int, lat double, lon double"
    )
    with pytest.raises(Exception, match="latitude outside"):
        within_distance_pairs(polar, "sid", "lat", "lon", 0.5, 41.0).count()


def test_lsh_null_embedding_gets_null_bucket(spark):
    # a NULL embedding in the Arrow matmul batch used to raise an opaque
    # numpy inhomogeneous-shape error; it must behave like the old
    # zip_with form — no bucket, never a candidate, everyone else joins
    from citibike_analysis_spark.operators.similarity import (
        near_duplicate_embeddings,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    out = near_duplicate_embeddings(
        emb, "vec_id", "embedding", threshold=0.9, bits=2, tables=2, dim=4
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 1)]


def test_lsh_ragged_widths_raise_width_error(spark):
    # mixed vector widths used to surface as numpy shape garbage (or an
    # IndexError); the documented width error must fire instead
    import pytest

    from citibike_analysis_spark.operators.similarity import (
        near_duplicate_embeddings,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="plane dimension"):
        near_duplicate_embeddings(
            emb, "vec_id", "embedding", threshold=0.9, bits=2, tables=2, dim=4
        ).count()


def test_lsh_index_probe_rejects_stamp_mismatch(spark):
    # the sign-bit convention changed in r04 (fold-order sum → BLAS
    # matmul): an index built under other parameters/conventions probed
    # blindly silently loses candidates — the stamp must catch it
    import pytest

    from citibike_analysis_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5, 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    q = emb.limit(2)
    build_lsh_index(emb, "lsh_stamp_test", bits=4, tables=2, dim=4, seed=1)
    try:
        # matching parameters probe fine
        lsh_index_topk(
            spark, "lsh_stamp_test", q, k=2, bits=4, tables=2, dim=4, seed=1
        ).collect()
        with pytest.raises(ValueError, match="rebuild"):
            lsh_index_topk(
                spark, "lsh_stamp_test", q, k=2, bits=4, tables=2, dim=4, seed=2
            )
        # an unstamped index (no table property, no legacy column — e.g.
        # written by something other than build_lsh_index) is rejected
        # loudly; a plain DataFrame rewrite drops table properties
        spark.table("lsh_stamp_test").write.mode("overwrite").saveAsTable(
            "lsh_prestamp_test"
        )
        with pytest.raises(ValueError, match="no signature stamp"):
            lsh_index_topk(
                spark, "lsh_prestamp_test", q, k=2, bits=4, tables=2, dim=4, seed=1
            )
        # r04-era index: vectors AND the stamp rode as per-row columns
        # in the one buckets table; that shape still probes (legacy
        # path), and mismatched parameters are still caught
        from citibike_analysis_spark.operators.similarity import _index_stamp

        spark.table("lsh_stamp_test").join(
            spark.table("lsh_stamp_test__vecs"), "neighbor_id"
        ).withColumn(
            "_stamp", F.lit(_index_stamp(4, 2, 4, 1))
        ).write.mode("overwrite").saveAsTable("lsh_legacy_test")
        lsh_index_topk(
            spark, "lsh_legacy_test", q, k=2, bits=4, tables=2, dim=4, seed=1
        ).collect()
        with pytest.raises(ValueError, match="rebuild"):
            lsh_index_topk(
                spark, "lsh_legacy_test", q, k=2, bits=4, tables=2, dim=4, seed=2
            )
        # an EMPTY index cannot vouch for its convention: the r04 row-level
        # check vacuously passed it (review finding); both forms now raise
        spark.table("lsh_legacy_test").limit(0).write.mode(
            "overwrite"
        ).saveAsTable("lsh_empty_legacy_test")
        with pytest.raises(ValueError, match="no signature stamp"):
            lsh_index_topk(
                spark, "lsh_empty_legacy_test", q, k=2, bits=4, tables=2, dim=4, seed=1
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS lsh_stamp_test")
        spark.sql("DROP TABLE IF EXISTS lsh_stamp_test__vecs")
        spark.sql("DROP TABLE IF EXISTS lsh_prestamp_test")
        spark.sql("DROP TABLE IF EXISTS lsh_legacy_test")
        spark.sql("DROP TABLE IF EXISTS lsh_empty_legacy_test")


def test_temperature_mixture_near_whole_stratum_keeps_whole(spark):
    # review finding: round(quota/n * 65536) == 65536 formatted as the
    # 5-char '10000', lexicographically keeping only '0'-prefixed hashes
    # (~6%) of a stratum meant to be kept whole
    from citibike_analysis_spark.operators.sampling import temperature_mixture

    n = 131073  # quota/n rounds to exactly 0x10000 when quota = n - 1
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    kept = temperature_mixture(
        df, "doc_id", "source", alpha=0.5, total_fraction=0.999992
    ).count()
    # quota = ceil(0.999992 * n) = 131072 < n; scaled rounds to 65536 →
    # keep-all sentinel. Pre-fix this kept ~8k rows.
    assert kept == n


def test_temperature_mixture_null_stratum_is_sampled(spark):
    # review finding: the plain equi-join dropped NULL-stratum rows
    # while their count still deflated every other stratum's quota
    from citibike_analysis_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else None) for i in range(100)],
        "doc_id: long, source: string",
    )
    kept = temperature_mixture(
        df, "doc_id", "source", alpha=0.5, total_fraction=1.0
    )
    by = {r["source"]: r["n"] for r in
          kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # total_fraction=1.0 → every stratum kept whole, including NULL
    assert by.get("a") == 50 and by.get(None) == 50


def test_pca_skips_null_vectors_and_rejects_ragged_and_empty(spark):
    import numpy as np
    import pytest

    from citibike_analysis_spark.operators.decomposition import pca_components

    ok = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.0, 1.0]), (3, [2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    mean, comps = pca_components(ok, n_components=1)
    # NULL row skipped: mean over the three non-null vectors
    assert np.allclose(mean, [1.0, 1 / 3])

    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="width mismatch"):
        pca_components(ragged, n_components=1)

    empty = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no non-NULL"):
        pca_components(empty, n_components=1)


def test_minhash_lsh_rejects_bad_band_counts(spark):
    import pytest

    from citibike_analysis_spark.operators.dedup import minhash_lsh_candidates

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    # bands > num_hashes: every band would hash '' and ALL docs collide
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_candidates(df, "doc_id", "text", num_hashes=32, bands=64)
    # non-divisor silently ignored trailing hashes pre-fix
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_candidates(df, "doc_id", "text", num_hashes=32, bands=12)


def test_frequent_tokens_exact_threshold_boundary_included(spark):
    # review finding: `n >= 0.07 * total` evaluated 7 >= 7.000000000000001
    # and excluded a token sitting exactly at the advertised threshold
    from citibike_analysis_spark.operators.sketches import frequent_tokens

    fillers = " ".join(f"w{i}" for i in range(93))
    df = spark.createDataFrame(
        [(0, ("x " * 7) + fillers)], "doc_id long, text string"
    )  # 100 token occurrences; 'x' has frequency exactly 0.07
    toks = {r["token"] for r in
            frequent_tokens(df, "text", min_fraction=0.07).collect()}
    assert "x" in toks


def test_asof_bucketed_rejects_mixed_timestamp_families(spark):
    # r05 ADVICE: an NTZ left vs LTZ right bucketed in DIFFERENT bases
    # (wall-clock seconds vs unix_micros) silently misaligning the
    # carry-forward chain — must raise instead
    import pytest

    from citibike_analysis_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10))], "k int, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9), 1.0)], "k int, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="mixed timestamp families"):
        asof_join_bucketed(
            left, right, ["k"], "ts", "ts", ["v"], bucket_seconds=3600
        )
    # same family still works (smoke)
    out = asof_join_bucketed(
        left,
        right.withColumn("ts", F.col("ts").cast("timestamp_ntz")),
        ["k"],
        "ts",
        "ts",
        ["v"],
        bucket_seconds=3600,
    )
    assert out.collect()[0]["v_asof"] == 1.0


def test_temperature_mixture_extreme_skew_keeps_nonzero_tail(spark):
    # r05 ADVICE: a stratum with n > ~131072*quota rounded its 16-bit
    # threshold to '0000' and kept ZERO rows despite quota >= 1 —
    # inverting the tail-boost guarantee. The clamp keeps ~n/65536 rows.
    from citibike_analysis_spark.operators.sampling import temperature_mixture

    df = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"), F.lit("big").alias("src")
    )
    # single stratum: quota = ceil(total_sel * n^0.5 / n^0.5) = 1;
    # n/quota = 1e6 >> 131072, so pre-fix the threshold rounded to 0
    kept = temperature_mixture(
        df, "doc_id", "src", alpha=0.5, total_fraction=1e-6
    ).count()
    # expected ~ n/65536 ~ 15; the guarantee under test is NONZERO with
    # a sane ceiling (binomial p=1/65536: P(0 kept) ~ e^-15, and 60+
    # kept would mean the clamp overshot by 4x the expectation)
    assert 0 < kept < 60


def test_parity_guard_env_gate_lets_registered_plan_run_past_regime(
    spark, monkeypatch
):
    """r08 ADVICE: q71/q116's exact-regime fail-fast was unconditional,
    so the registered production path could not execute past fixture
    scale without editing code. Default stays fail-fast (oracle runs);
    SPARK_GRAFT_PARITY_GUARDS=0 demotes it to a warning and the SAME
    registered plan executes."""
    import warnings

    import citibike_analysis_spark.plans.llm as llm
    from tests.conftest import SF0001

    # shrink the accuracy so the sf0.001 corpus (~200 docs) is PAST the
    # exact regime — the production-scale condition, reproduced small
    monkeypatch.setattr(llm, "_Q118_ACC", 10)
    monkeypatch.delenv("SPARK_GRAFT_PARITY_GUARDS", raising=False)
    try:
        llm.q71_quality_percentile_gate(spark, SF0001)
        raise AssertionError("guard did not fire with fail-fast default")
    except AssertionError as e:
        assert "oracle-parity precondition" in str(e)
    monkeypatch.setenv("SPARK_GRAFT_PARITY_GUARDS", "0")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = llm.q71_quality_percentile_gate(spark, SF0001)
        n = out.count()
    assert n > 0  # the registered plan ran end to end past the regime
    assert any("demoted to a warning" in str(x.message) for x in w)


def test_ship_package_failure_warns_not_silent():
    """r08 ADVICE: a swallowed archive-shipment failure resurfaces on a
    multi-process master as an executor-side ModuleNotFoundError with no
    hint shipment was attempted — the fallthrough must warn, not pass."""
    import warnings

    from citibike_analysis_spark.session import ship_package

    class Boom:
        @property
        def sparkContext(self):
            raise RuntimeError("no context")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ship_package(Boom())  # non-fatal: must not raise
    assert any("shipment failed" in str(x.message) for x in w)
