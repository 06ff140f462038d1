"""A/B the dedup reuse strategy (VERDICT r02 item #2).

BENCH_r01 -> BENCH_r02 regressed q36 x1.59 right after commit eeec4cc
introduced ``localCheckpoint(eager=False)`` on the multiply-referenced
dedup intermediates. This script measures the three candidate
strategies (checkpoint / persist / none) on the affected query family
at sf0.1 with N repetitions each, fresh SparkSession per strategy, and
prints a per-(strategy, query) min/median table so the default in
``operators/dedup._reuse`` is a measurement, not a guess.

Protocol caveat (r04 review): SparkSession.stop() + getOrCreate() in
one process REUSES the py4j gateway JVM, so JIT warmth carries across
strategies — checkpoint (first) pays the codegen warmup the later
strategies skip, biasing the comparison AGAINST checkpoint; min-of-reps
discards most but not all of it. Treat small (<~15%) deltas as noise;
the persist-vs-none gap this script decides on is far larger.

Usage: python scripts/ab_reuse.py [sf_dir] [reps]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q36_minhash_dedup",
    "q34_ngram_jaccard",
    "q50_winnow_pairs",
    "q92_containment_pairs",
]


def bench_strategy(mode: str, sf_dir: str, reps: int) -> dict:
    os.environ["SPARK_GRAFT_DEDUP_REUSE"] = mode
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs = E.queries()
    out = {}
    for name in QUERIES:
        fn = qs.get(name)
        if fn is None:
            # registry keys may differ; match on the qNN prefix
            prefix = name.split("_")[0]
            matches = [k for k in qs if k.startswith(prefix + "_")]
            if not matches:
                continue
            name, fn = matches[0], qs[matches[0]]
        from citibike_analysis_spark.cache import release_all

        times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            # clearCache cannot free localCheckpoint blocks — without
            # this the checkpoint strategy leaks blocks across reps and
            # the A/B is biased against it (r04 review)
            release_all()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        out[name] = {
            "min": round(min(times), 3),
            "median": round(statistics.median(times), 3),
            "all": [round(t, 3) for t in times],
        }
        print(f"  {mode:10s} {name:30s} min={out[name]['min']:6.2f} "
              f"median={out[name]['median']:6.2f} {out[name]['all']}", flush=True)
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    results = {}
    # interleave-by-strategy (fresh SparkSession each; the JVM is shared
    # — see the module docstring's warmth caveat) rather than
    # interleave-by-rep: per-strategy warmup is roughly constant and
    # min-of-reps discards most of it.
    for mode in ("checkpoint", "persist", "none"):
        print(f"== strategy: {mode}", flush=True)
        results[mode] = bench_strategy(mode, sf_dir, reps)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
