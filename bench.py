"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"queries_cold": {...}, "value_cold": ..., "sf": ...}``

Headline set spans the engine's main cost shapes: grouped aggregation
(q01), the flagship CTE+window reduction (q20) and its skew-safe
approx-quantile variant (q104 — q56 is that plan's driver-checked
overlap audit), broadcast-join chain (q05), windowed
rollup (q19), spatial band join (q21), shingle near-dup (q34), minhash
LSH (q36), brute-force ANN (q38), as-of join (q41) and its bucketed
hot-key-safe variant (q58), LSH-bucketed ANN (q44), dedup
clustering / connected components (q46), benchmark decontamination
(q63), corpus-statistics join-back (q68), sketch + exact-recount heavy
hitters (q72), chunk-level span dedup (q74), bigram-LM scoring
(q79), within-cluster semantic dedup (q77), the composed five-stage
corpus pipeline (q86 — the closest shape to the real 100 TB job),
vocab encode (q90 — the Python/Arrow boundary cost), the sort-free
global index (q95), and per-stratum weighted sampling (q99).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "q01_pricing_summary",
    "q05_regional_revenue",
    "q19_interval_rollup",
    "q20_interesting_suppliers",
    "q21_spatial_neighbors",
    "q34_ngram_jaccard",
    "q36_minhash_dedup",
    "q38_ann_topk",
    "q41_asof_join",
    "q44_ann_lsh",
    "q46_dedup_clusters",
    "q104_scalable_picks",
    "q58_asof_join_bucketed",
    "q63_decontaminate",
    "q68_unigram_logprob",
    "q72_frequent_tokens",
    "q74_chunk_dedup",
    "q77_semantic_dedup",
    "q79_bigram_logprob",
    "q86_corpus_pipeline",
    "q90_encode_documents",
    "q95_global_positions",
    "q99_weighted_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from citibike_analysis_spark.plans import all_queries
    from citibike_analysis_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # warm the JVM + parquet footers once (untimed)
    specs["q01_pricing_summary"].fn(spark, sf_dir).count()

    # Per query: 2 consecutive runs. The first ("cold") pays one-time JVM
    # JIT/codegen compilation (measured 1-3 s on the wide-aggregate
    # queries) that amortizes to nothing over a production run's
    # thousands of tasks; the minimum ("steady") reports the engine's
    # steady-state cost, which is the quantity that scales. BOTH are
    # emitted (VERDICT r1 #4) so a cold-path regression cannot hide
    # behind the steady headline, and vice versa.
    steady: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        # drop cached blocks leaked by earlier queries' compute-once
        # persists: each query is timed self-contained, and accumulated
        # storage memory otherwise bleeds GC pressure into later queries
        # (q58 measured 18 s in-session vs 4.5 s standalone before this)
        spark.catalog.clearCache()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 3)
        steady[name] = round(min(runs), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(steady.values()), 3),
                "unit": "sec",
                "queries": steady,
                "value_cold": round(sum(cold.values()), 3),
                "queries_cold": cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
