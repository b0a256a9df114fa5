"""CLI — the reference's ``vectordb-migrate`` entry point, Spark-first.

Reference contract (``cli/migrate.py:151-233``, ``pyproject.toml:58``):
``vectordb-migrate --config c.json [--transform t.py] [--verbose]``;
``--version`` fast path; exit code 0 on success, 1 on any failure;
a missing/broken transform module degrades to a warning, not an abort
(``cli/migrate.py:85-93``).

Same flags here, plus Spark-side knobs (``--cpus``). Entry point B
(``python -m vectordb_migrator_spark``) delegates to this main.
"""

from __future__ import annotations

import argparse
import logging
import sys

from vectordb_migrator_spark import __version__

log = logging.getLogger("vectordb_migrator_spark.cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vectordb-migrate-spark",
        description="Config-driven vector migration on Spark",
    )
    p.add_argument("--config", help="JSON migration config path")
    p.add_argument("--transform", help="Python module path exposing transform(data)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--version", action="store_true")
    p.add_argument("--cpus", type=int, default=None, help="local[<n>] cores")
    p.add_argument(
        "--stream",
        action="store_true",
        help="run the config as a STREAMING migration (readStream -> "
        "writeStream; requires a stream.checkpoint section)",
    )
    p.add_argument(
        "--timeout",
        type=int,
        default=None,
        help="with --stream and an interval trigger: stop after N seconds",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.version:
        print(__version__)
        return 0
    if not args.config:
        print("error: --config is required", file=sys.stderr)
        return 1
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)

    try:
        from vectordb_migrator_spark.operators.transform import (
            load_transform_function,
        )
        from vectordb_migrator_spark.plans.pipeline import Migrator
        from vectordb_migrator_spark.session import get_spark

        transform = None
        if args.transform:
            # degrade to None with a warning, like the reference
            # (cli/migrate.py:85-93)
            try:
                transform = load_transform_function(args.transform)
            except Exception as exc:  # noqa: BLE001
                log.warning("transform module unusable (%s); continuing", exc)

        spark = get_spark("vectordb-migrate", cpus=args.cpus)
        if args.stream:
            from vectordb_migrator_spark.plans.pipeline import (
                run_stream_migration,
            )

            ok = run_stream_migration(
                spark, args.config, transform, timeout_sec=args.timeout
            )
        else:
            ok = Migrator(spark, args.config).migrate(transform)
        return 0 if ok else 1
    except Exception as exc:  # noqa: BLE001
        log.error("migration failed: %s", exc)
        return 1


if __name__ == "__main__":
    sys.exit(main())
