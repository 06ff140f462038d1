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
