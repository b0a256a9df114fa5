"""Dump ``explain("formatted")`` for named queries WITHOUT executing
the returned plan (query construction still runs any driver-side fit
actions a builder performs). Used to commit the judge-checkable
before/after plan evidence under plans/r12/.

Usage: python tools/capture_plans.py --out=DIR --suffix=before|after name...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    out = Path("plans/r12")
    suffix = "after"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out = Path(a.split("=", 1)[1])
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            names.append(a)

    from vectordb_migrator_spark.session import get_spark
    from vectordb_migrator_spark.suite import QUERIES

    spark = get_spark("capture_plans", cpus=32, shuffle_partitions=32)
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}_{suffix}.txt").write_text(txt)
        print(f"captured {name}_{suffix}", flush=True)


if __name__ == "__main__":
    main()
