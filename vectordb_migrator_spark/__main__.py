"""Entry point B — ``python -m vectordb_migrator_spark`` (reference
``__main__.py:8-11``): delegate to the CLI main."""

import sys

from vectordb_migrator_spark.cli import main

sys.exit(main())
