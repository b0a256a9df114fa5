"""Harness-parity gate: every ``queries()`` entry must work in a
PLAIN SparkSession.

Round 8's only driver failure was a query that worked under
``session.get_spark`` (which registers the package's Python
DataSources and flips ``spark.sql.python.filterPushdown.enabled``)
but died in the driver's harness, which builds a bare
``SparkSession.builder...getOrCreate()`` with none of that setup.
This was the third local-pass/driver-fail mechanism (after round 5's
dtype class and round 6's data-distribution class); this tool closes
it the same way — a gate that reproduces the driver's exact session
shape.

The script deliberately does NOT import ``session.get_spark``. It
builds the same minimal session the driver uses and, for each named
query (default: all), calls the query function and forces analysis of
the returned DataFrame (``df.schema``). Eager work inside query
functions (dim probes, connector writes) runs for real, so a query
that depends on any package-level session setup fails here exactly as
it would in the driver.

Modes::

    python tools/plain_session_parity.py              # all, analyze-only
    python tools/plain_session_parity.py NAME [NAME]  # subset
    python tools/plain_session_parity.py --exec NAME  # also collect()

Run this from a FRESH process — a JVM that already went through
``get_spark`` keeps its registrations. ``tests/test_plain_session.py``
wraps it in a subprocess for exactly that reason, and ``tools/gate.py``
runs it as stage 0.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def build_plain_session():
    """The driver-harness session shape: no package setup at all."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("plain-session-parity")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run(names: list[str], *, execute: bool = False) -> dict[str, str]:
    """Return {query_name: error_string} for failures (empty = pass)."""
    spark = build_plain_session()
    spark.sparkContext.setLogLevel("ERROR")
    # Workers need the repo root importable for pickled UDFs — that is
    # launch plumbing (the driver exports it too), not session setup.
    root = str(Path(__file__).resolve().parent.parent)
    pp = os.environ.get("PYTHONPATH", "")
    if root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{root}{os.pathsep}{pp}" if pp else root

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    failures: dict[str, str] = {}
    t0 = time.time()
    for i, name in enumerate(names, 1):
        try:
            df = qmap[name](spark, SF_DIR)
            _ = df.schema
            if execute:
                df.collect()
        except Exception as exc:  # noqa: BLE001 - gate reports, not raises
            failures[name] = f"{type(exc).__name__}: {exc}"[:400]
            print(f"[{i}/{len(names)}] FAIL {name}: {failures[name]}")
        else:
            if i % 25 == 0 or i == len(names):
                print(
                    f"[{i}/{len(names)}] ok through {name}"
                    f" ({time.time() - t0:.0f}s)"
                )
    return failures


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    execute = "--exec" in sys.argv[1:]
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    names = args or sorted(qmap)
    unknown = [n for n in names if n not in qmap]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    failures = run(names, execute=execute)
    if failures:
        print(f"\nPLAIN-SESSION PARITY FAILED ({len(failures)}):")
        for k, v in failures.items():
            print(f"  {k}: {v}")
        return 1
    print(f"\nPLAIN-SESSION PARITY PASS: {len(names)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
