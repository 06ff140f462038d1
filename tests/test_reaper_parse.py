"""The rehearsal reaper must never kill what it cannot parse.

r09 ADVICE: the r08 reaper SIGKILLed any CoarseGrainedExecutorBackend
whose cmdline did NOT match its driver-url regex, and the host pattern
missed bracketed IPv6 literals — so a live executor of an unrelated
application on an IPv6 RPC address would be killed. The fix is two
halves, both pinned here: the parse covers IPv6 brackets, and the
policy is skip-on-unparseable (exercised via the parse helper — the
reap loop `continue`s on None).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from cluster_rehearsal import _parse_driver_endpoint  # noqa: E402


@pytest.mark.parametrize(
    ("cmd", "expect"),
    [
        (
            "java ... --driver-url spark://CoarseGrainedScheduler@10.0.0.5:7337 --executor-id 1",
            ("10.0.0.5", 7337),
        ),
        (
            "java ... --driver-url spark://CoarseGrainedScheduler@worker-3.cluster.local:41211 x",
            ("worker-3.cluster.local", 41211),
        ),
        # bracketed IPv6 — the r08 miss
        (
            "java ... --driver-url spark://CoarseGrainedScheduler@[::1]:35421 --executor-id 0",
            ("::1", 35421),
        ),
        (
            "java ... --driver-url spark://CoarseGrainedScheduler@[fe80::2ff:fe00:1]:7000 y",
            ("fe80::2ff:fe00:1", 7000),
        ),
        # unparseable shapes -> None (the reap loop skips; never kills)
        ("java CoarseGrainedExecutorBackend --executor-id 1", None),
        ("java ... --driver-url spark://Sched@:notaport x", None),
        ("", None),
    ],
)
def test_parse_driver_endpoint(cmd, expect):
    assert _parse_driver_endpoint(cmd) == expect
