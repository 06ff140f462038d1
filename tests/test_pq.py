"""Product-quantization operator tests (r12 — ANN capability 3,
`operators/pq.py`): codec shape/determinism, numpy reconstruction
parity, ADC score exactness against a numpy reference, fidelity
monotonicity, and the shortlist+re-rank recall the registered q140
parameterization pins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    from citibike_analysis_spark.sources.tables import load_table

    df = load_table(spark, SF, "embeddings")
    df.persist().count()
    return df


@pytest.fixture(scope="module")
def books(emb):
    from citibike_analysis_spark.operators.pq import train_pq_codebooks

    return train_pq_codebooks(emb, m=8, ksub=16, dim=64, train_iters=2)


class TestPqCodec:
    def test_codebook_shape_and_determinism(self, emb, books):
        from citibike_analysis_spark.operators.pq import train_pq_codebooks

        assert len(books) == 8
        assert all(len(b) == 16 for b in books)
        assert all(len(v) == 8 for b in books for _, v in b)
        again = train_pq_codebooks(emb, m=8, ksub=16, dim=64, train_iters=2)
        assert again == books  # rounded means + deterministic init/ties

    def test_dim_not_divisible_raises(self, emb):
        from citibike_analysis_spark.operators.pq import train_pq_codebooks

        with pytest.raises(ValueError, match="divisible"):
            train_pq_codebooks(emb, m=7, ksub=16, dim=64, train_iters=1)

    def test_encode_codes_and_recon_norm(self, spark, emb, books):
        """Codes are m ints in [0, ksub); recon_norm equals the numpy
        norm of the assembled reconstruction (pure function of codes)."""
        from citibike_analysis_spark.operators.pq import pq_encode

        codes = pq_encode(emb, books)
        chk = codes.agg(
            F.count("*").alias("n"),
            F.bool_and(
                (F.size("codes") == 8)
                & F.forall("codes", lambda c: (c >= 0) & (c < 16))
            ).alias("ok"),
        ).collect()[0]
        assert chk["n"] == emb.count() and chk["ok"]
        C = {
            (j, cid): np.asarray(v)
            for j, book in enumerate(books)
            for cid, v in book
        }
        for r in codes.orderBy("vec_id").limit(5).collect():
            recon = np.concatenate(
                [C[(j, r["codes"][j])] for j in range(8)]
            )
            assert abs(r["recon_norm"] - np.linalg.norm(recon)) < 1e-6

    def test_assignment_is_argmin(self, emb, books):
        """Each subspace's code is the true squared-L2 argmin over its
        codebook — numpy recompute on a handful of vectors (an
        independent path from the struct-min trick)."""
        from citibike_analysis_spark.operators.pq import pq_encode

        rows = (
            pq_encode(emb, books)
            .join(
                emb.select(
                    "vec_id",
                    F.transform(
                        F.col("embedding"), lambda x: x.cast("double")
                    ).alias("_v"),
                ),
                "vec_id",
            )
            .orderBy("vec_id")
            .limit(10)
            .collect()
        )
        for r in rows:
            v = np.asarray(r["_v"])
            for j, book in enumerate(books):
                sub = v[j * 8 : (j + 1) * 8]
                dists = [
                    (round(float(((sub - np.asarray(c)) ** 2).sum()), 9), cid)
                    for cid, c in book
                ]
                assert r["codes"][j] == min(dists)[1]

    def test_mse_monotone_and_beats_variance(self, emb, books):
        from citibike_analysis_spark.operators.pq import (
            pq_reconstruction_mse,
            train_pq_codebooks,
        )

        fine = (
            pq_reconstruction_mse(emb, books).agg(F.avg("mse")).collect()[0][0]
        )
        coarse_books = train_pq_codebooks(
            emb, m=8, ksub=2, dim=64, train_iters=2
        )
        coarse = (
            pq_reconstruction_mse(emb, coarse_books)
            .agg(F.avg("mse"))
            .collect()[0][0]
        )
        var = (
            emb.select(
                F.posexplode(
                    F.transform(F.col("embedding"), lambda x: x.cast("double"))
                ).alias("p", "v")
            )
            .agg(F.var_pop("v"))
            .collect()[0][0]
        )
        assert fine < coarse < var


class TestPqAdc:
    def test_adc_scores_match_numpy_reference(self, spark, emb, books):
        """The full ADC pipeline (Arrow LUT matmul + JVM zip_with
        lookup fold + rounded cosine) reproduces a from-scratch numpy
        computation exactly at the 6-decimal output precision."""
        from citibike_analysis_spark.operators.pq import pq_encode, pq_topk

        codes = pq_encode(emb, books)
        q = emb.filter(F.col("vec_id") < 3)
        got = {
            (r["query_id"], r["neighbor_id"]): r["adc_sim"]
            for r in pq_topk(codes, q, books, k=5).collect()
        }
        assert got
        C = {
            (j, cid): np.asarray(v)
            for j, book in enumerate(books)
            for cid, v in book
        }
        code_rows = {
            r["vec_id"]: (list(r["codes"]), r["recon_norm"])
            for r in codes.collect()
        }
        qvs = {
            r["vec_id"]: np.asarray([float(x) for x in r["embedding"]])
            for r in q.collect()
        }
        for (qid, nid), sim in got.items():
            qv = qvs[qid]
            cs, rn = code_rows[nid]
            dot = sum(
                float(qv[j * 8 : (j + 1) * 8] @ C[(j, cs[j])])
                for j in range(8)
            )
            ref = round(dot / max(np.linalg.norm(qv) * rn, 1e-300), 6)
            assert abs(sim - ref) < 2e-6, (qid, nid, sim, ref)

    def test_ivfpq_persisted_pipeline_lifecycle(self, spark, emb):
        """The persisted IVF-PQ composition (r12): attach encodes every
        list row; the probe routes + ADC-scores + exact re-ranks with
        recall@5 ≥ 0.6/query (measured 0.94/0.80 at all SFs); the
        strict screens catch every divergence the lifecycle can
        produce — an append without refresh (missing codes), a lists
        rebuild under the stale codes stamp — and refresh is
        batch-cost + idempotent; tombstoned ids never surface."""
        from citibike_analysis_spark.operators.pq import (
            attach_pq_codes,
            ivfpq_topk,
            refresh_pq_codes,
        )
        from citibike_analysis_spark.operators.similarity import (
            append_to_ivf_index,
            brute_force_topk,
            build_ivf_index,
            remove_from_ivf_index,
        )

        t = "ivfpq_lc_idx"
        even = emb.filter(F.col("vec_id") % 2 == 0)
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        q = emb.filter(F.col("vec_id") < 10)
        try:
            build_ivf_index(emb, t, nlist=16, train_iters=4)
            attach_pq_codes(spark, t, m=16, ksub=64, train_iters=4)
            exact: dict = {}
            for r in brute_force_topk(emb, q, k=5).collect():
                exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            got: dict = {}
            probe = ivfpq_topk(spark, t, q, k=5, nprobe=6, shortlist=50)
            for r in probe.collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            per_q = [
                len(got.get(k, set()) & s) / len(s) for k, s in exact.items()
            ]
            assert min(per_q) >= 0.6, per_q
            # codes side joins its cid buckets exchange-free; only the
            # probe side may repartition
            plan = (
                ivfpq_topk(spark, t, q, k=5, nprobe=6, shortlist=50)
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert plan.count("Exchange hashpartitioning(cid") <= 1
            # deletion mask: removed ids never surface
            removed = emb.filter(F.col("vec_id") % 10 == 3)
            remove_from_ivf_index(spark, t, removed)
            surfaced = {
                r["neighbor_id"]
                for r in ivfpq_topk(
                    spark, t, q, k=5, nprobe=6, shortlist=50
                ).collect()
            }
            assert all(n % 10 != 3 for n in surfaced)
        finally:
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")
        # fresh pair for the divergence screens + the id-level audit
        t2 = "ivfpq_lc2_idx"
        try:
            build_ivf_index(even, t2, nlist=8, train_iters=2)
            attach_pq_codes(spark, t2, m=8, ksub=16, train_iters=2)
            from citibike_analysis_spark.operators.pq import (
                verify_ivfpq_consistency,
            )

            assert verify_ivfpq_consistency(spark, t2) == 0
            append_to_ivf_index(odd, t2)
            with pytest.raises(ValueError, match="diverged"):
                ivfpq_topk(spark, t2, q, k=3, nprobe=4)
            # the deep audit counts the pending (benign) direction
            assert verify_ivfpq_consistency(spark, t2) == odd.count()
            assert refresh_pq_codes(spark, t2) == odd.count()
            assert refresh_pq_codes(spark, t2) == 0  # idempotent
            assert verify_ivfpq_consistency(spark, t2) == 0
            assert ivfpq_topk(spark, t2, q, k=3, nprobe=4).count() > 0
            # GHOST codes (purge without re-attach): totals can hide
            # this — the id-level audit must raise. Simulate by
            # appending a code row with an id no lists row has.
            spark.createDataFrame(
                [(99_999_999, 0, [0] * 8, 1.0)],
                "neighbor_id: bigint, cid: int, codes: array<int>, "
                "recon_norm: double",
            ).write.mode("append").format("parquet").bucketBy(
                16, "cid"
            ).sortBy("cid").saveAsTable(f"{t2}__codes")
            with pytest.raises(ValueError, match="GHOST"):
                verify_ivfpq_consistency(spark, t2)
            # rebuilding the lists re-stamps them: the codes sibling's
            # binding stamp is now stale and the probe must refuse
            build_ivf_index(odd, t2, nlist=8, train_iters=2)
            with pytest.raises(ValueError, match="re-run|stamped"):
                ivfpq_topk(spark, t2, q, k=3, nprobe=4)
        finally:
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {t2}{s}")

    def test_rerank_recall_at_production_params(self, spark, emb):
        """The q140 parameterization (m=16, ksub=64, shortlist 50 +
        exact re-rank) holds per-query recall@5 ≥ 0.6 — measured
        1.0/1.0/0.8 min at sf0.001/0.01/0.1; plain ADC@5 is NOT held
        to this bar (0.74/0.46 mean measured — the re-rank stage is
        load-bearing, which this test would catch if it regressed to
        un-re-ranked output)."""
        from citibike_analysis_spark.operators.pq import (
            pq_encode,
            pq_topk_rerank,
            train_pq_codebooks,
        )
        from citibike_analysis_spark.operators.similarity import (
            brute_force_topk,
        )

        books = train_pq_codebooks(emb, m=16, ksub=64, dim=64, train_iters=4)
        codes = pq_encode(emb, books)
        q = emb.filter(F.col("vec_id") < 10)
        exact: dict = {}
        for r in brute_force_topk(emb, q, k=5).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        got: dict = {}
        reranked = pq_topk_rerank(codes, emb, q, books, k=5, shortlist=50)
        for r in reranked.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        per_q = [len(got.get(k, set()) & s) / len(s) for k, s in exact.items()]
        assert min(per_q) >= 0.6, per_q
        # and the re-ranked scores are EXACT cosines: they must agree
        # with brute force on the intersecting pairs
        bf = {
            (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        rr = {
            (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
            for r in reranked.collect()
        }
        common = set(bf) & set(rr)
        assert common
        assert all(abs(bf[p] - rr[p]) < 2e-6 for p in common)


class TestR13IvfPqMaintenance:
    """r13: a purging compaction maintains the codes sibling (r12
    VERDICT #3), the probe screen runs on cached count properties with
    zero count jobs (r12 VERDICT #4 / ADVICE), and the re-rank joins
    are preflighted with shuffle fallbacks (r12 ADVICE)."""

    def test_purging_compaction_maintains_codes_sibling(self, spark, emb):
        """build → attach → append → refresh → remove → compact → probe
        green WITHOUT attach_pq_codes: the compaction anti-joins the
        same tombstone set out of __codes (batch-cost, not a corpus
        re-encode), the stamp pair stays valid by construction, the
        id-level audit returns 0, and removed ids never surface."""
        from citibike_analysis_spark.operators.pq import (
            _IVFPQ_NCODES_PROP,
            attach_pq_codes,
            ivfpq_topk,
            refresh_pq_codes,
            verify_ivfpq_consistency,
        )
        from citibike_analysis_spark.operators.similarity import (
            _IVF_NROWS_PROP,
            append_to_ivf_index,
            build_ivf_index,
            compact_ivf_index,
            remove_from_ivf_index,
        )

        t = "ivfpq_purge_idx"
        even = emb.filter(F.col("vec_id") % 2 == 0)
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        q = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 60))
        try:
            build_ivf_index(even, t, nlist=8, train_iters=2)
            attach_pq_codes(spark, t, m=8, ksub=16, train_iters=2)
            append_to_ivf_index(odd, t)
            assert refresh_pq_codes(spark, t) == odd.count()
            remove_from_ivf_index(
                spark, t, emb.filter(F.col("vec_id") < 50).select("vec_id")
            )
            out = compact_ivf_index(spark, t)
            assert f"{t}__codes" in out, "codes sibling must be compacted too"
            # probe WITHOUT re-attach: purge kept the siblings aligned
            rows = ivfpq_topk(
                spark, t, q, k=5, nprobe=4, shortlist=30, n_queries=10
            ).collect()
            assert rows
            assert all(r["neighbor_id"] >= 50 for r in rows)
            assert verify_ivfpq_consistency(spark, t) == 0
            # count caches recomputed post-purge on BOTH tables
            lp = {
                r["key"]: r["value"]
                for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
            }
            cp = {
                r["key"]: r["value"]
                for r in spark.sql(f"SHOW TBLPROPERTIES {t}__codes").collect()
            }
            assert int(lp[_IVF_NROWS_PROP]) == spark.table(t).count()
            assert (
                int(cp[_IVFPQ_NCODES_PROP])
                == spark.table(f"{t}__codes").count()
            )
        finally:
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")

    def test_screen_runs_on_count_props_with_zero_count_jobs(
        self, spark, emb, monkeypatch
    ):
        """With the lifecycle-maintained count properties present, the
        per-probe screen must not launch a single count() job (proved
        by making DataFrame.count raise); with a property UNSET (a
        pre-r13 index) it falls back to real counts and still screens
        — and still CATCHES a divergence through the props (append
        without refresh updates n_rows but not n_codes)."""
        import pyspark.sql

        from citibike_analysis_spark.operators.pq import (
            _IVFPQ_NCODES_PROP,
            _verify_ivfpq_stamp,
            attach_pq_codes,
        )
        from citibike_analysis_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
        )

        t = "ivfpq_props_idx"
        even = emb.filter(F.col("vec_id") % 2 == 0)
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        try:
            build_ivf_index(even, t, nlist=8, train_iters=2)
            attach_pq_codes(spark, t, m=8, ksub=16, train_iters=2)

            def boom(self):
                raise AssertionError("count() job in the probe screen")

            monkeypatch.setattr(pyspark.sql.DataFrame, "count", boom)
            _verify_ivfpq_stamp(spark, t, check_counts=True)  # no raise
            monkeypatch.undo()
            # divergence caught through the props alone
            append_to_ivf_index(odd, t)
            with pytest.raises(ValueError, match="diverged"):
                _verify_ivfpq_stamp(spark, t, check_counts=True)
            # prop absent → count fallback still screens (same verdict)
            spark.sql(
                f"ALTER TABLE {t}__codes UNSET TBLPROPERTIES "
                f"('{_IVFPQ_NCODES_PROP}')"
            )
            with pytest.raises(ValueError, match="diverged"):
                _verify_ivfpq_stamp(spark, t, check_counts=True)
        finally:
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")

    def test_rerank_preflight_shuffle_fallback(self, spark, emb, monkeypatch):
        """r12 ADVICE: the re-rank stage broadcast the |q| × shortlist
        frame and the d-dim query frame unconditionally — above the cap
        those rebuilt the driver-heap state the probe preflight exists
        to prevent. Under a tiny cap both re-rank joins must fall back
        to shuffles with EXACTLY the broadcast path's output, for both
        the persisted (ivfpq_topk) and one-shot (pq_topk_rerank)
        forms."""
        from citibike_analysis_spark.operators.pq import (
            attach_pq_codes,
            ivfpq_topk,
            pq_encode,
            pq_topk_rerank,
            train_pq_codebooks,
        )
        from citibike_analysis_spark.operators.similarity import (
            build_ivf_index,
        )

        key = lambda rows: sorted(
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in rows
        )
        q = emb.filter(F.col("vec_id") < 5)
        books = train_pq_codebooks(emb, m=8, ksub=16, dim=64, train_iters=2)
        codes = pq_encode(emb, books)
        ref_oneshot = key(
            pq_topk_rerank(codes, emb, q, books, k=3, shortlist=20).collect()
        )
        assert ref_oneshot
        t = "ivfpq_preflight_idx"
        auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            build_ivf_index(emb, t, nlist=8, train_iters=2)
            attach_pq_codes(spark, t, m=8, ksub=16, train_iters=2)
            ref_idx = key(
                ivfpq_topk(
                    spark, t, q, k=3, nprobe=4, shortlist=20
                ).collect()
            )
            assert ref_idx
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            monkeypatch.setenv("SPARK_GRAFT_CAND_BROADCAST_MAX", "1")
            plan = (
                ivfpq_topk(spark, t, q, k=3, nprobe=4, shortlist=20)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            # centroids still broadcast (driver-held contract); probe
            # frame, shortlist and query re-rank frames all shuffle
            assert plan.count("BroadcastExchange") == 1
            assert (
                key(
                    ivfpq_topk(
                        spark, t, q, k=3, nprobe=4, shortlist=20
                    ).collect()
                )
                == ref_idx
            )
            assert (
                key(
                    pq_topk_rerank(
                        codes, emb, q, books, k=3, shortlist=20
                    ).collect()
                )
                == ref_oneshot
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")


class TestR14CountPropCrashOrdering:
    """r13 ADVICE: the count-property caches must be UNSET before the
    data append and re-SET after, so a crash between the two writes
    leaves the property ABSENT (readers fall back to real counts — the
    safe direction) instead of present-but-stale (silently passing the
    props-vs-props screen while siblings genuinely diverge, or a
    permanently stale-low value refresh can never heal)."""

    def _torn_append_bucketed(self, monkeypatch):
        """Make append_bucketed commit its data and then raise —
        simulating a crash AFTER the data write but BEFORE the
        count-property re-SET."""
        import citibike_analysis_spark.sources.bucketed as bucketed

        real = bucketed.append_bucketed

        def torn(*a, **kw):
            real(*a, **kw)
            raise RuntimeError("simulated crash after data append")

        monkeypatch.setattr(bucketed, "append_bucketed", torn)

    def test_torn_ivf_append_leaves_prop_absent_and_screen_loud(
        self, spark, emb, monkeypatch
    ):
        """Crash between the lists append and the n_rows re-SET: the
        property must be ABSENT (not stale-low), the IVF-PQ screen must
        fall back to a REAL lists count and raise 'diverged' LOUDLY
        (the pre-fix ordering left n_rows stale and the props-vs-props
        compare silently passed while appended ids had no codes), and
        refresh_pq_codes must fully heal the codes side."""
        from citibike_analysis_spark.operators.pq import (
            _verify_ivfpq_stamp,
            attach_pq_codes,
            refresh_pq_codes,
        )
        from citibike_analysis_spark.operators.similarity import (
            _IVF_NROWS_PROP,
            append_to_ivf_index,
            build_ivf_index,
        )

        t = "ivf_torn_append_idx"
        even = emb.filter(F.col("vec_id") % 2 == 0)
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        try:
            build_ivf_index(even, t, nlist=8, train_iters=2)
            attach_pq_codes(spark, t, m=8, ksub=16, train_iters=2)
            self._torn_append_bucketed(monkeypatch)
            with pytest.raises(RuntimeError, match="simulated crash"):
                append_to_ivf_index(odd, t)
            monkeypatch.undo()
            lp = {
                r["key"]: r["value"]
                for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
            }
            assert _IVF_NROWS_PROP not in lp, (
                "a torn append must leave the count cache ABSENT, "
                "never present-but-stale"
            )
            # the data DID commit — the screen must see the divergence
            # through the real-count fallback, loudly
            with pytest.raises(ValueError, match="diverged"):
                _verify_ivfpq_stamp(spark, t, check_counts=True)
            # and the advertised heal works: refresh encodes the
            # appended ids, after which the screen is green again
            assert refresh_pq_codes(spark, t) == odd.count()
            _verify_ivfpq_stamp(spark, t, check_counts=True)  # no raise
        finally:
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")

    def test_torn_refresh_self_heals_via_count_fallback(
        self, spark, emb, monkeypatch
    ):
        """Crash between the codes append and the n_codes re-SET: the
        property is ABSENT, the real-count fallback sees the committed
        codes, the screen passes, and a re-run of refresh correctly
        finds 0 missing (the pre-fix ordering left n_codes stale-low:
        every probe raised 'diverged' and refresh could never heal it
        because no ids were actually missing). Compaction restores the
        cached property."""
        from citibike_analysis_spark.operators.pq import (
            _IVFPQ_NCODES_PROP,
            _verify_ivfpq_stamp,
            attach_pq_codes,
            refresh_pq_codes,
        )
        from citibike_analysis_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            compact_ivf_index,
        )

        t = "ivf_torn_refresh_idx"
        even = emb.filter(F.col("vec_id") % 2 == 0)
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        try:
            build_ivf_index(even, t, nlist=8, train_iters=2)
            attach_pq_codes(spark, t, m=8, ksub=16, train_iters=2)
            append_to_ivf_index(odd, t)
            self._torn_append_bucketed(monkeypatch)
            with pytest.raises(RuntimeError, match="simulated crash"):
                refresh_pq_codes(spark, t)
            monkeypatch.undo()
            cp = {
                r["key"]: r["value"]
                for r in spark.sql(f"SHOW TBLPROPERTIES {t}__codes").collect()
            }
            assert _IVFPQ_NCODES_PROP not in cp
            # the codes DID commit: real-count fallback sees a
            # consistent pair — the torn state self-heals
            _verify_ivfpq_stamp(spark, t, check_counts=True)  # no raise
            assert refresh_pq_codes(spark, t) == 0
            # maintenance restores the cached count
            compact_ivf_index(spark, t)
            cp = {
                r["key"]: r["value"]
                for r in spark.sql(f"SHOW TBLPROPERTIES {t}__codes").collect()
            }
            assert int(cp[_IVFPQ_NCODES_PROP]) == spark.table(
                f"{t}__codes"
            ).count()
        finally:
            for s in ("", "__cents", "__tombs", "__codes", "__books"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")


class TestR14PqTopkPreflight:
    def test_pq_topk_lut_broadcast_preflight(self, spark, emb, monkeypatch):
        """r13 ADVICE: pq_topk broadcast the query+LUT frame
        unconditionally (m·ksub ≈ 1024 doubles/row at production
        m=16/ksub=64 — ~16× heavier than a bare query vector), so the
        one-shot rerank recipe could still OOM the driver at the batch
        sizes its docstring claimed handled. Under a tiny cap the cross
        join must run with NO BroadcastExchange (shuffled cartesian)
        and produce EXACTLY the broadcast path's output."""
        from citibike_analysis_spark.operators.pq import (
            pq_encode,
            pq_topk,
            train_pq_codebooks,
        )

        books = train_pq_codebooks(emb, m=8, ksub=16, dim=64, train_iters=2)
        codes = pq_encode(emb, books).persist()
        q = emb.filter(F.col("vec_id") < 5)
        key = lambda rows: sorted(
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in rows
        )
        try:
            ref = key(pq_topk(codes, q, books, k=3).collect())
            assert ref
            auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            try:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                monkeypatch.setenv("SPARK_GRAFT_CAND_BROADCAST_MAX", "1")
                over = pq_topk(codes, q, books, k=3, n_queries=5)
                plan = (
                    over._jdf.queryExecution().executedPlan().toString()
                )
                # the m × ksub codebook broadcasts inside the encode
                # lineage are tiny and driver-held by contract; the
                # guarded frame is the query+LUT one — its cross join
                # must run as a shuffled cartesian, not a broadcast
                # nested loop
                assert "BroadcastNestedLoopJoin" not in plan
                assert "CartesianProduct" in plan
                assert key(over.collect()) == ref
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
        finally:
            codes.unpersist()


class TestR14ArrowEncodeParity:
    """r14 (r13 verdict #5): the Arrow encode must be byte-identical to
    the fold path — same codes, same recon_norm bits — across
    parameterizations and on a non-normalized randomized fixture, while
    replacing the fold's explode+shuffle plan with a shuffle-free
    projection."""

    def _both(self, df, books, **kw):
        from citibike_analysis_spark.operators.pq import pq_encode

        fold = {
            r["vec_id"]: (list(r["codes"]), r["recon_norm"])
            for r in pq_encode(df, books, method="fold", **kw).collect()
        }
        arrow = {
            r["vec_id"]: (list(r["codes"]), r["recon_norm"])
            for r in pq_encode(df, books, method="arrow", **kw).collect()
        }
        return fold, arrow

    def test_parity_on_corpus_both_params(self, spark, emb, books):
        from citibike_analysis_spark.operators.pq import train_pq_codebooks

        fold, arrow = self._both(emb, books)
        assert fold and fold == arrow
        wide = train_pq_codebooks(emb, m=16, ksub=64, dim=64, train_iters=2)
        fold, arrow = self._both(emb, wide)
        assert fold and fold == arrow

    def test_parity_on_nonnormalized_fixture_with_carry(self, spark):
        """Rehearsal-corpus shape (clustered, radius ~5σ, NOT unit
        norm) — distances far from the unit ball, plus a carry column
        riding both paths."""
        import numpy as np

        from citibike_analysis_spark.operators.pq import train_pq_codebooks

        rng = np.random.default_rng(11)
        centers = rng.normal(size=(4, 32)) * 5.0
        V = centers[rng.integers(0, 4, 300)] + rng.normal(size=(300, 32))
        df = spark.createDataFrame(
            [
                (int(i), int(i) % 7, [float(x) for x in v])
                for i, v in enumerate(V)
            ],
            "vec_id: long, tag: int, embedding: array<double>",
        )
        books = train_pq_codebooks(df, m=4, ksub=8, dim=32, train_iters=3)
        from citibike_analysis_spark.operators.pq import pq_encode

        fold = {
            r["vec_id"]: (list(r["codes"]), r["recon_norm"], r["tag"])
            for r in pq_encode(
                df, books, carry_cols=["tag"], method="fold"
            ).collect()
        }
        arrow = {
            r["vec_id"]: (list(r["codes"]), r["recon_norm"], r["tag"])
            for r in pq_encode(
                df, books, carry_cols=["tag"], method="arrow"
            ).collect()
        }
        assert fold and fold == arrow

    def test_arrow_plan_is_shuffle_free(self, spark, emb, books):
        from citibike_analysis_spark.operators.pq import pq_encode

        plan = (
            pq_encode(emb, books, method="arrow")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        fold_plan = (
            pq_encode(emb, books, method="fold")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in fold_plan  # the cost the arrow path removes

    def test_round_half_up_matches_decimal(self):
        """The vectorized HALF_UP reproduction agrees with the exact
        Decimal(repr) path everywhere, including manufactured
        knife-edge values."""
        import numpy as np
        from decimal import ROUND_HALF_UP, Decimal

        from citibike_analysis_spark.operators.pq import _round_half_up

        rng = np.random.default_rng(3)
        vals = np.concatenate(
            [
                rng.random(2000) * 10,
                # exact half boundaries and near-misses at the 9th place
                np.array([0.1234567885, 0.0000000005, 1.9999999995]),
                np.round(rng.random(500), 9) + 5e-10,
            ]
        )
        got = _round_half_up(vals.copy(), 9)
        q = Decimal(1).scaleb(-9)
        for x, g in zip(vals, got):
            want = float(
                Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP)
            )
            assert g == want, (x, g, want)
