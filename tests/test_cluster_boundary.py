"""Executor process-boundary checks (r07: first real multi-process run).

Every other test runs ``local[N]``, where Python workers FORK from the
driver and inherit its ``sys.path`` — so a missing package-deployment
step is invisible: module-level (pandas_)udfs unpickle by re-importing
``citibike_analysis_spark``, and the fork makes that import succeed by
accident. ``local-cluster[...]`` spawns separate executor JVMs whose
Python workers import from a clean path, which is exactly how the r07
rehearsal caught q45's mapInPandas failing with ``ModuleNotFoundError``
while every pure-JVM plan sailed through. The fix is the standard
deployment step done by the session factory itself:
``session.ship_package`` zips the package (content-hashed) and
``addPyFile``s it, so the same code runs unchanged on a real cluster.

The cluster test runs in a SUBPROCESS: the pytest process already owns
the session-scoped local JVM, and one JVM cannot host a second master.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CLUSTER_PROBE = """
import sys
sys.path.insert(0, {repo!r})
from citibike_analysis_spark.session import get_spark
from citibike_analysis_spark.plans import all_queries

spark = get_spark(app_name="boundary_probe",
                  master="local-cluster[1,2,2048]",
                  shuffle_partitions=4,
                  extra_conf={{"spark.executor.memory": "2g"}})
spark.sparkContext.setLogLevel("ERROR")
# q45 is the path that failed before ship_package: a module-level
# mapInPandas function, cloudpickled BY REFERENCE, so the executor-side
# worker must import the package to unpickle it
n = all_queries()["q45_multimodal_features"].fn(
    spark, "/root/testdata/sf0.001"
).count()
assert n > 0, n
spark.stop()
print("BOUNDARY_OK", n)
"""


def test_module_level_udf_runs_on_separate_executor_process():
    out = subprocess.run(
        [sys.executable, "-c", _CLUSTER_PROBE.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "BOUNDARY_OK" in out.stdout, out.stdout[-2000:]


_CONTRACT_PROBE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# the literal driver contract: a VANILLA session (not the engine
# factory) pointed at a multi-process master; tune() inside queries()'s
# wrapper must ship the package for module-level UDFs to unpickle
spark = (SparkSession.builder.master("local-cluster[1,2,2048]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.executor.memory", "2g")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as E
n = E.queries()["q45_multimodal_features"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
spark.stop()
print("CONTRACT_OK", n)
"""


def test_driver_contract_vanilla_session_is_cluster_safe():
    out = subprocess.run(
        [sys.executable, "-c", _CONTRACT_PROBE.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CONTRACT_OK" in out.stdout, out.stdout[-2000:]


_EXEC_LOSS_PROBE = """
import os, signal, subprocess, sys, threading, time, traceback
sys.path.insert(0, {repo!r})
from citibike_analysis_spark.session import get_spark
from citibike_analysis_spark.plans import all_queries

spark = get_spark(app_name="exec_loss", master="local-cluster[2,8,8192]",
                  shuffle_partitions=16,
                  extra_conf={{"spark.executor.memory": "8g"}})
spark.sparkContext.setLogLevel("ERROR")
app_id = spark.sparkContext.applicationId
fn = all_queries()["q36_minhash_dedup"].fn
d = "/root/testdata/sf0.1"
expected = fn(spark, d).count()
result = {{}}
def run():
    try:
        result["n"] = fn(spark, d).count()
    except Exception:
        result["err"] = traceback.format_exc()[-1500:]
t = threading.Thread(target=run); t.start()
time.sleep(2.0)  # mid-flight: signature agg / banding stages running
# victim: an executor OF THIS APP (cmdline carries --app-id; a stale
# executor leaked by an earlier session must never be the target)
out = subprocess.run(["pgrep", "-af", "CoarseGrainedExecutorBackend"],
                     capture_output=True, text=True).stdout
victims = [ln.split()[0] for ln in out.splitlines() if app_id in ln]
assert victims, f"no executor of {{app_id}} found:\\n{{out}}"
os.kill(int(victims[-1]), signal.SIGKILL)
t.join(timeout=360)
assert not t.is_alive(), "query hung after executor loss"
assert "err" not in result, result.get("err")
assert result["n"] == expected, (result["n"], expected)
spark.stop()
print("EXEC_LOSS_OK", expected)
"""


def test_executor_loss_mid_query_returns_identical_result():
    """Kill one of the two executor PROCESSES mid-query (SIGKILL — no
    shutdown hook) and assert the query completes with the IDENTICAL
    result: Spark's standalone master relaunches the executor, lost
    tasks and lost persisted signature blocks are recomputed, and the
    engine's operators are deterministic under task retry — the claim
    the write path documents (sources/files.py row-hash buckets) and
    every md5/xxhash-keyed plan relies on, exercised for real here.
    local[N] cannot test this failure mode at all (one process)."""
    out = subprocess.run(
        [sys.executable, "-c", _EXEC_LOSS_PROBE.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, (out.stdout[-800:], out.stderr[-1500:])
    assert "EXEC_LOSS_OK" in out.stdout, out.stdout[-2000:]


def test_package_archive_is_content_hashed_and_idempotent(tmp_path):
    from citibike_analysis_spark.session import _package_archive

    p1 = _package_archive()
    p2 = _package_archive()
    assert p1 == p2 and os.path.exists(p1)  # stable while sources unchanged
    with zipfile.ZipFile(p1) as z:
        names = z.namelist()
    # arcnames are package-rooted so the zip is importable as shipped
    assert any(n == "citibike_analysis_spark/session.py" for n in names)
    assert all(n.startswith("citibike_analysis_spark/") for n in names)
    assert not any("__pycache__" in n for n in names)
