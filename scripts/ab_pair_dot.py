"""q39 verify-stage dot A/B: Arrow-batched einsum vs interpreted fold
(r07 verdict #3 — the one residual boundary cost with a named cause).

After the r07 norm hoist, q39's verify still evaluated ONE interpreted
``F.aggregate`` fold per candidate pair (CodegenFallback) — the named
cause of its 2.38×/1.68× cluster-vs-local residual while every sibling
sat ≤1.2. The candidate fix batches pairs through the same declared
Arrow/BLAS seam as ``similarity._bucketize`` (measured 5× there):
``pair_dot``. This script measures both implementations under BOTH
masters on the 10× rehearsal corpus, interleaving all four (master ×
mode) cells within each pass so host drift lands inside every record —
the cluster_rehearsal child + ab_trees interleaving, composed.

Usage: python scripts/ab_pair_dot.py [workdir]
Env: PD_REPS (default 2), PD_PASSES (default 2), PD_CPUS (default 32),
PD_SCALE (default x10), PD_MODES (default "fold,arrow" — set "arrow"
to measure one mode's cells only, e.g. the x100 amortization point
where the fold side is already on record), PD_MASTERS (default
"local,cluster2" — restrict to one master's cells, e.g. a single
crossover-bracketing cell).
Prints one JSON line per cell and a final summary with the two
cluster/local ratios — the number the r07 verdict asked for (target
arrow ≤ ~1.2 at 10×, no local regression).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.cluster_rehearsal import (  # noqa: E402
    _CHILD,
    _reap_orphaned_executors,
    ensure_corpus,
)

QUERY = "q39_embedding_near_dup"


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_rehearsal"
    corpus = ensure_corpus(work, os.environ.get("PD_SCALE", "x10"))
    reps = int(os.environ.get("PD_REPS", "2"))
    passes = int(os.environ.get("PD_PASSES", "2"))
    cpus = int(os.environ.get("PD_CPUS", "32"))
    masters = {
        "local": f"local[{cpus}]",
        "cluster2": f"local-cluster[2,{cpus // 2},24576]",
    }
    keep = {
        m for m in os.environ.get("PD_MASTERS", "local,cluster2").split(",") if m
    }
    masters = {k: v for k, v in masters.items() if k in keep}
    child_src = _CHILD.format(
        repo=REPO, corpus_queries=[QUERY], sf_queries=[], stream_queries=[]
    )

    modes = tuple(
        m for m in os.environ.get("PD_MODES", "fold,arrow").split(",") if m
    )
    cells: dict[str, dict] = {}
    for p in range(passes):
        for mode in modes:
            for mlabel, master in masters.items():
                stale = _reap_orphaned_executors()
                if stale:
                    print(json.dumps({"reaped": stale}), flush=True)
                env = dict(os.environ)
                if mode == "fold":
                    env["SPARK_GRAFT_PAIR_DOT"] = "fold"
                else:
                    env.pop("SPARK_GRAFT_PAIR_DOT", None)
                t0 = time.perf_counter()
                out = subprocess.run(
                    [sys.executable, "-c", child_src,
                     master, corpus, "/root/testdata/sf0.1", str(reps)],
                    capture_output=True, text=True, timeout=3600,
                    cwd=REPO, env=env,
                )
                if out.returncode != 0:
                    raise RuntimeError(
                        f"{mode}/{mlabel}: {out.stderr[-1500:]}"
                    )
                line = [
                    ln for ln in out.stdout.splitlines()
                    if ln.startswith("CHILD_RESULT ")
                ][-1]
                res = json.loads(line[len("CHILD_RESULT "):])[QUERY]
                key = f"{mode}/{mlabel}"
                prev = cells.get(key)
                if prev is None or res.get("sec", 1e9) < prev.get("sec", 1e9):
                    cells[key] = res
                print(
                    json.dumps(
                        {
                            "pass": p, "mode": mode, "master": mlabel,
                            "jvm_wall": round(time.perf_counter() - t0, 1),
                            **res,
                        }
                    ),
                    flush=True,
                )

    def ratio(mode: str) -> float | None:
        lo = cells.get(f"{mode}/local", {}).get("sec")
        cl = cells.get(f"{mode}/cluster2", {}).get("sec")
        return round(cl / lo, 3) if lo and cl else None

    summary = {
        "min": cells,
        "cluster_over_local": {m: ratio(m) for m in ("fold", "arrow")},
        "arrow_over_fold_local": (
            round(
                cells["arrow/local"]["sec"] / cells["fold/local"]["sec"], 3
            )
            if cells.get("arrow/local") and cells.get("fold/local")
            else None
        ),
        "rows_identical": len(
            {c.get("rows") for c in cells.values() if "rows" in c}
        ) == 1,
    }
    print("SUMMARY " + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
