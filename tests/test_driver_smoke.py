"""Subprocess run of tools/driver_smoke.py: the public surface must
work under a BARE SparkSession (the verify driver's environment), not
just under get_spark()'s configured one.

A subprocess is mandatory — getOrCreate() in this test process would
reuse the configured session fixture and defeat the point.  The r3
regression (events.ts arriving TIMESTAMP_NTZ under the driver's
session, breaking unix_micros) is exactly what this catches.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_window_runs_under_bare_session():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "driver_smoke.py"),
            os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
            "50",
        ],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"driver smoke failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
    assert ", 0 failed" in proc.stdout
