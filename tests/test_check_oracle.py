"""The local gate (tools/check_oracle.py) must catch the r5 driver-fail
class: a DuckDB oracle whose windowed/aggregated BIGINT sum widens to
HUGEINT and materializes as pandas float64 while Spark emits int64 —
the driver's exact value hash then fails (291.0 vs 291) even though an
int-coercing tuple compare says MATCH."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import compare, unsafe_oracle_dtypes  # noqa: E402


@pytest.fixture(scope="module")
def spark_long_df(spark):
    return spark.createDataFrame([(1, 10), (2, 20)], "id: long, cum: long")


def test_uncast_window_sum_flagged(spark_long_df):
    """An oracle emitting HUGEINT (-> pandas float64) where Spark emits
    long must FAIL the local gate, not silently MATCH."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT id::BIGINT AS id,"
        " sum(v) OVER (ORDER BY id) AS cum"  # HUGEINT: deliberately un-cast
        " FROM (VALUES (1, 10), (2, 10)) t(id, v)"
    )
    duck_df = rel.df()
    assert duck_df["cum"].dtype.kind == "f", "DuckDB no longer widens?"
    bad = unsafe_oracle_dtypes(spark_long_df, duck_df)
    assert any(b.startswith("cum:") for b in bad)
    ok, msg = compare("t", spark_long_df, rel, duck_df)
    assert not ok
    assert "driver-hash-unsafe" in msg


def test_cast_window_sum_passes(spark_long_df):
    con = duckdb.connect()
    sql = (
        "SELECT id::BIGINT AS id,"
        " sum(v) OVER (ORDER BY id)::BIGINT AS cum"
        " FROM (VALUES (1, 10), (2, 10)) t(id, v)"
    )
    duck_df = con.sql(sql).df()
    assert unsafe_oracle_dtypes(spark_long_df, duck_df) == []
    ok, msg = compare("t", spark_long_df, con.sql(sql), duck_df)
    assert ok, msg


def test_nullable_int_with_nulls_exempt(spark):
    """A nullable BIGINT that carries NULLs degrades to float64 on
    BOTH sides of the driver's pandas conversion, so the hash still
    matches — the gate must not false-positive on it (asof LEFT-join
    gap_s regression)."""
    con = duckdb.connect()
    sdf = spark.createDataFrame([(1, 10), (2, None)], "id: long, gap: long")
    duck_df = con.sql(
        "SELECT id::BIGINT AS id, gap::BIGINT AS gap FROM"
        " (VALUES (1, 10), (2, NULL)) t(id, gap)"
    ).df()
    assert duck_df["gap"].dtype.kind == "f"  # pandas degraded it
    assert unsafe_oracle_dtypes(sdf, duck_df) == []


def test_bench_smoke_isolates_failures(spark):
    """The sf0.1 smoke gate must record a crashing query as THAT
    query's failure and keep going — the r6 bench artifact was erased
    because one data-dependent raise at 138/164 had no isolation."""
    from bench_smoke import run

    def good(s, sf):
        return s.range(3)

    def bad(s, sf):
        raise RuntimeError("deliberately zero-valued fixture")

    failures = run(
        ["g1", "boom", "g2"],
        sf_dir="unused",
        spark=spark,
        queries={"g1": good, "boom": bad, "g2": good},
    )
    assert failures == ["boom"]
