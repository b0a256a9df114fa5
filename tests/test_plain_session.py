"""Harness-parity regression: every ``queries()`` entry must work in a
PLAIN SparkSession — one with none of ``session.get_spark``'s setup
(no Python DataSource registration, no filterPushdown flag, no Arrow
or AQE config).

Round 8's only driver-window failure was exactly this class: the
connector roundtrip queries passed under ``get_spark`` sessions
(bench, gate) but died with ``ClassNotFoundException:
qdrant.DefaultSource`` in the driver's bare session. This is the
third local-pass/driver-fail mechanism (r5: dtype, r6: data
distribution, r8: session config); like the first two it gets a
permanent gate.

The sweep MUST run in a subprocess: this pytest process has long since
gone through ``get_spark`` (conftest fixtures), and ``getOrCreate``
would hand back the registered session, silently defeating the test.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_every_query_works_in_a_plain_spark_session():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "plain_session_parity.py")],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"plain-session parity failed (rc {proc.returncode}):\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-1500:]}"
    )
    assert "PLAIN-SESSION PARITY PASS" in proc.stdout
