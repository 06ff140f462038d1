"""Three-point scale rehearsal for the near-dup family (VERDICT r02 #5;
third decade r04 VERDICT #3).

The sf0.1 operating point is one data point; this script generates 1x,
10x, and 100x synthetic corpora FROM THE SAME GENERATOR (Zipfian vocab,
lognormal doc lengths, fixed 5% near-duplicate injection; clustered
embeddings with 2% near-duplicate vectors) and runs the near-dup
queries on all of them, recording wall time and the candidate-pair
counts that drive the economics — empirical confirmation that banding
and the df-cap hold off the single measured operating point. Two
decades pin the growth EXPONENT: a single doubling-decade cannot
distinguish ×6-per-decade flattening from compounding.

The uncapped inverted-index join's candidate count is Σ C(df,2) over
shingle document frequencies; it is computed analytically at both
scales (cheap — one groupBy over the index) and the uncapped q34 is
only EXECUTED where that count says it is sane. That asymmetry is the
point of the experiment: uncapped grows ~quadratically with corpus
size on the Zipf head while the df-cap pins it ~linear.

Usage: python scripts/scale_rehearsal.py [workdir]
Writes documents.parquet/embeddings.parquet under <workdir>/{x1,x10}
(default /tmp/scale_rehearsal) and prints one JSON line per (scale,
query) plus a markdown summary table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 20_000
ZIPF_A = 1.1
MEAN_WORDS, SIGMA_WORDS = 200, 0.5
NEAR_DUP_FRAC = 0.05  # fraction of docs that are an edited copy of an earlier doc
EDIT_FRAC = 0.08  # words replaced in a near-dup copy
EMB_DIM = 64
EMB_FAMILY = 40  # vectors per near-dup family: FIXED as the corpus grows
VEC_DUP_FRAC = 0.02


def gen_documents(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    words = np.array([f"w{i}" for i in range(VOCAB)])
    # Zipf ranks clipped into the vocab: heavy head + long tail, like text
    texts: list[str] = []
    sources = rng.integers(0, 8, n)
    for i in range(n):
        if i > 0 and rng.random() < NEAR_DUP_FRAC:
            j = rng.integers(0, i)
            toks = texts[j].split()
            k = max(1, int(len(toks) * EDIT_FRAC))
            pos = rng.choice(len(toks), size=min(k, len(toks)), replace=False)
            ranks = rng.zipf(ZIPF_A, size=len(pos)) % VOCAB
            for p, r in zip(pos, ranks):
                toks[p] = words[r]
            texts.append(" ".join(toks))
            continue
        ln = max(8, int(rng.lognormal(np.log(MEAN_WORDS), SIGMA_WORDS)))
        ranks = rng.zipf(ZIPF_A, size=ln) % VOCAB
        texts.append(" ".join(words[ranks]))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"src{s}" for s in sources]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, seed: int, dim: int = EMB_DIM) -> pa.Table:
    # cluster COUNT scales with n, cluster SIZE stays ~EMB_FAMILY: a real
    # corpus grows by adding near-dup families (boilerplate variants),
    # not by inflating each family — this keeps q39's true-pair count
    # ~linear in n, so superlinear wall-time growth indicts the PLAN.
    # ``dim`` (r13): the PQ win-regime A/B needs a WIDE-embedding corpus
    # (dim 512) — same generator, same clustering geometry, wider rows.
    rng = np.random.default_rng(seed + 1)
    n_clusters = max(10, n // EMB_FAMILY)
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    labels = rng.integers(0, n_clusters, n)
    vecs = centers[labels] + rng.normal(size=(n, dim))
    dup = rng.random(n) < VEC_DUP_FRAC
    for i in np.flatnonzero(dup):
        if i == 0:
            continue
        j = rng.integers(0, i)
        vecs[i] = vecs[j] + rng.normal(size=dim) * 0.01
        labels[i] = labels[j]
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs]),
            "label": pa.array(labels, pa.int32()),
        }
    )


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_rehearsal"
    scales = {
        "x1": (5_000, 2_000),
        "x10": (50_000, 20_000),
        "x100": (500_000, 200_000),
    }
    for name, (nd, ne) in scales.items():
        d = os.path.join(work, name)
        os.makedirs(d, exist_ok=True)
        # regenerate unless BOTH tables exist (a run killed between the
        # two writes would otherwise skip forever on the half-written
        # fixture — r04 review); writes go via a temp name + rename so a
        # mid-write kill never leaves a truncated .parquet behind
        if not all(
            os.path.exists(os.path.join(d, f"{t}.parquet"))
            for t in ("documents", "embeddings")
        ):
            for t, gen in (("documents", gen_documents(nd, seed=7)),
                           ("embeddings", gen_embeddings(ne, seed=7))):
                tmp = os.path.join(d, f".{t}.parquet.tmp")
                pq.write_table(gen, tmp)
                os.replace(tmp, os.path.join(d, f"{t}.parquet"))

    from pyspark.sql import functions as F

    from citibike_analysis_spark.plans import all_queries
    from citibike_analysis_spark.session import get_spark
    from citibike_analysis_spark.functions.text import shingles_of, tokens
    from citibike_analysis_spark.sources.tables import load_table

    spark = get_spark(app_name="scale_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    results: dict[str, dict] = {}
    for name in scales:
        d = os.path.join(work, name)
        docs = load_table(spark, d, "documents")
        # analytic candidate-pair counts for the inverted-index join,
        # uncapped vs df-capped at the REGISTERED q61/q46/q62 cap
        # (plans.llm._Q61_MAX_DF — imported, not restated, so the
        # economics always describe the plans actually executed below;
        # the r03 table's "(=100)" label modeled a 4x looser cap than
        # any registered query ran — r04 review)
        # explode over a NAMED token projection — inlining tokens() into
        # shingles_of makes interpreted eval re-run the regex split per
        # array element (O(words^2) per doc; observed as a 20-minute
        # single-task straggler on the 10x corpus's longest docs). Same
        # expression-shape rule the engine's own index builders follow
        # (operators/dedup.py).
        tk = docs.select("doc_id", tokens(F.col("text")).alias("_tk"))
        inv = (
            tk.select("doc_id", F.explode(shingles_of(F.col("_tk"), 3)).alias("s"))
            .groupBy(F.xxhash64("s").alias("h")).count()
        )
        from citibike_analysis_spark.plans.llm import _Q61_MAX_DF

        pairs = inv.select(
            F.sum(F.expr("count * (count - 1) / 2")).alias("uncapped"),
            F.sum(F.expr(f"CASE WHEN count <= {_Q61_MAX_DF} THEN count * (count - 1) / 2 ELSE 0 END")).alias("capped"),
        ).collect()[0]
        row: dict = {
            "n_docs": scales[name][0],
            "uncapped_pairs": int(pairs["uncapped"]),
            "df_capped_pairs": int(pairs["capped"]),
        }
        qnames = ["q61_capped_jaccard", "q36_minhash_dedup", "q46_dedup_clusters",
                  "q62_dedup_clusters_star", "q39_embedding_near_dup"]
        # executing the uncapped join past ~3e7 analytic candidates is
        # pointless pain: the hot shingle's partition becomes one
        # multi-minute straggler task (observed live at 10x) — which is
        # the finding; the counts carry it without the wall-clock
        if name == "x1" or pairs["uncapped"] < 3e7:
            qnames.insert(0, "q34_ngram_jaccard")
        else:
            row["q34_ngram_jaccard"] = {"skipped": "uncapped candidate count prohibitive (by design)"}
        # q105/q113 are the loose-banding RECALL CALIBRATIONS (bits=2 →
        # candidates ~n²/4 per table / a corpus-linear scan per ingest —
        # the r03-measured ×44 and r04-measured ×30: textbook LSH
        # recall/cost extremes, registered as audit-scale queries; the
        # production plans are q39/q103 auto-bits). They execute at 1x
        # only, for the record. The REGISTERED q103 (r05: fixed
        # 150-vector batch, θ=0.9, auto bits — the production contract)
        # runs at every scale like any other production query.
        qnames.append("q103_incremental_embedding_dedup")
        if name == "x1":
            qnames.append("q105_neardup_calibration")
            qnames.append("q113_incremental_dedup_calibration")
        else:
            row["q105_neardup_calibration"] = {"skipped": "calibration-scale by design (bits=2 → candidates ~n²/4; production form is q39 auto-bits)"}
            row["q113_incremental_dedup_calibration"] = {"skipped": "calibration-scale by design (corpus-linear scan per ingest + SF-proportional batch; production form is q103 auto-bits)"}
        from citibike_analysis_spark.cache import release_all

        for q in qnames:
            runs, rows_out = [], None
            try:
                for _ in range(2):
                    # per-rep isolation (r04 review): without it, rep 2
                    # plan-matches rep 1's persisted intermediates (reports
                    # a cache-hit, not steady-state compute) and earlier
                    # queries' persisted/checkpoint blocks bleed GC pressure
                    # into later growth ratios — the very numbers this
                    # script exists to measure
                    spark.catalog.clearCache()
                    release_all()
                    t0 = time.perf_counter()
                    out = specs[q].fn(spark, d)
                    rows_out = out.count()
                    runs.append(round(time.perf_counter() - t0, 2))
                row[q] = {"sec": min(runs), "rows": rows_out}
            except Exception as exc:  # noqa: BLE001 - record, keep measuring
                # one query blowing the heap must not discard the decade's
                # remaining measurements (r05: q62 OOMed the x100 run);
                # cleanup itself may fail on a dead gateway — ignore, the
                # next query's attempt will surface a truly dead JVM
                row[q] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                try:
                    spark.catalog.clearCache()
                    release_all()
                except Exception:
                    pass
            print(json.dumps({"scale": name, "query": q, **row[q]}), flush=True)

        # incremental admission under its actual contract: a FIXED
        # 500-vector ingest batch against the full (growing) corpus —
        # loose calibration banding (per-ingest work ~corpus-linear:
        # occupancy n/4 × 24 tables) and production tight-θ auto-bits
        # (flat occupancy → per-ingest work ~flat in corpus size,
        # modulo the corpus-side signature pass).
        from citibike_analysis_spark.operators.similarity import (
            incremental_embedding_dedup,
        )

        emb = load_table(spark, d, "embeddings")
        fixed_batch = emb.filter(F.col("vec_id") < 500)
        rest = emb.filter(F.col("vec_id") >= 500)
        for label, kw in [
            ("q103_fixed_batch_loose", dict(threshold=0.45, bits=2, tables=24)),
            ("q103_fixed_batch_auto", dict(threshold=0.9, bits="auto", tables=16)),
        ]:
            if label.endswith("loose") and name == "x100":
                # 4 buckets/table → per-ingest candidates ≈ 500 ·
                # (corpus/4) · 24 ≈ 6e8 at 200k vecs: the corpus-linear
                # calibration economics are already pinned by the
                # x1→x10 pair; executing the known-quadratic-ish pass
                # at x100 is pointless pain (same reasoning as q34)
                row[label] = {"skipped": "loose banding is corpus-linear per ingest (calibration-only); economics pinned at x1/x10"}
                continue
            runs, rows_out = [], None
            try:
                for _ in range(2):
                    spark.catalog.clearCache()
                    release_all()
                    t0 = time.perf_counter()
                    rows_out = incremental_embedding_dedup(
                        fixed_batch, rest, "vec_id", "embedding", **kw
                    ).count()
                    runs.append(round(time.perf_counter() - t0, 2))
                row[label] = {"sec": min(runs), "rows": rows_out}
            except Exception as exc:  # noqa: BLE001 - record, keep measuring
                row[label] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                try:
                    spark.catalog.clearCache()
                    release_all()
                except Exception:
                    pass
            print(json.dumps({"scale": name, "query": label, **row[label]}), flush=True)
        results[name] = row
        print(json.dumps({"scale": name, "pair_economics": {
            "uncapped": row["uncapped_pairs"], "capped": row["df_capped_pairs"]}}), flush=True)

    # markdown summary for SCALE.md: one column per decade plus the
    # per-decade wall growth (x10/x1, x100/x10) — flat-or-falling
    # growth per decade is the pass condition
    print("\n| metric | 1x (5k docs / 2k vecs) | 10x (50k / 20k) | 100x (500k / 200k) | growth/decade |")
    print("|---|---|---|---|---|")
    x1, x10, x100 = results["x1"], results["x10"], results["x100"]
    def g(a, b):
        return f"x{b / a:.1f}" if a and b is not None else "-"
    def pairs_row(label, key):
        print(f"| {label} | {x1[key]:,} | {x10[key]:,} | {x100[key]:,} | "
              f"{g(x1[key], x10[key])}, {g(x10[key], x100[key])} |")
    pairs_row("uncapped index candidate pairs", "uncapped_pairs")
    from citibike_analysis_spark.plans.llm import _Q61_MAX_DF
    pairs_row(f"df-capped (={_Q61_MAX_DF}, the registered cap) candidate pairs", "df_capped_pairs")
    def cell(d):
        if "skipped" in d:
            return f"SKIPPED ({d['skipped']})"
        if "error" in d:
            return f"ERROR ({d['error']})"
        if not d:
            return "-"
        return f"{d.get('sec')}s / {d.get('rows')} rows"
    for q in ["q34_ngram_jaccard", "q61_capped_jaccard", "q36_minhash_dedup",
              "q46_dedup_clusters", "q62_dedup_clusters_star",
              "q39_embedding_near_dup", "q103_incremental_embedding_dedup",
              "q103_fixed_batch_loose", "q103_fixed_batch_auto",
              "q105_neardup_calibration", "q113_incremental_dedup_calibration"]:
        a, b, c = x1.get(q, {}), x10.get(q, {}), x100.get(q, {})
        g1 = g(a.get("sec", 0), b.get("sec")) if "sec" in a and "sec" in b else "-"
        g2 = g(b.get("sec", 0), c.get("sec")) if "sec" in b and "sec" in c else "-"
        print(f"| {q} | {cell(a)} | {cell(b)} | {cell(c)} | {g1}, {g2} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
