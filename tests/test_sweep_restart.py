"""The sweep's dead-JVM restart path must hand back a LIVE session.

r09 ADVICE (medium): the r08 restart path cleared only
``SparkSession._instantiatedSession/_activeSession`` before
``getOrCreate`` — but ``SparkContext._active_spark_context`` still held
the stopped context, and ``SparkContext.getOrCreate`` returns it
unchanged, so the "fresh" session wrapped the same corpse and the retry
failed identically. The reproduction is exactly the q57 GCLocker death
mode: the JVM-side SparkContext stops itself while the Python wrapper
stays registered. Runs in a SUBPROCESS so killing/rebuilding contexts
cannot disturb the shared session fixture.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {scripts!r})
from pyspark.sql import SparkSession
from pyspark import SparkContext
from sweep import rebuild_session

b = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
)
spark = b.getOrCreate()
assert spark.range(3).count() == 3

# simulate the GCLocker death: the JVM-side context stops ITSELF, the
# Python registration survives (sc.stop() is never called)
spark.sparkContext._jsc.sc().stop()
assert SparkContext._active_spark_context is not None

# the r08 path: clearing only the SparkSession slots wraps (or trips
# over) the SAME stopped context — on PySpark 4.1.2 the SparkSession
# constructor's assertNotStopped raises right inside getOrCreate; on
# variants that do hand a session back, running a job fails instead.
# Either way the retry "fails identically" — the ADVICE's broken path.
SparkSession._instantiatedSession = None
SparkSession._activeSession = None
try:
    stale = b.getOrCreate()
    stale.range(3).count()
    print("STALE_UNEXPECTEDLY_ALIVE")
    sys.exit(2)
except Exception:
    pass  # expected: the stopped context poisons the r08-style retry

fresh = rebuild_session(b)
assert fresh.range(3).count() == 3
fresh.stop()
print("RESTART_OK")
"""


def test_rebuild_session_survives_jvm_side_context_death():
    child = _CHILD.format(
        repo=REPO, scripts=os.path.join(REPO, "scripts")
    )
    proc = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert "RESTART_OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )
