"""FD-audit / key-discovery profiling tests."""

from __future__ import annotations

def test_fd_audit_detects_violations_and_holds(spark):
    from vectordb_migrator_spark.operators.validation import fd_audit

    rows = [
        (1, "a", 10), (1, "a", 11),   # x=1 -> y='a' only: holds
        (2, "b", 12), (2, "c", 13),   # x=2 -> {'b','c'}: violation
        (3, None, 14),                # NULL y is a value
        (3, "d", 15),                 # x=3 -> {NULL,'d'}: violation
        (None, "e", 16),              # NULL x excluded
    ]
    df = spark.createDataFrame(rows, "x int, y string, z int")
    got = {
        r["dependency"]: r
        for r in fd_audit(df, [("x", "y"), ("x", "z")]).collect()
    }
    r = got["x->y"]
    assert (r["n_keys"], r["violations"]) == (3, 2)
    assert r["violation_rate"] == round(2 / 3, 6)
    assert r["example_keys"] == "2,3"
    # z is unique per row: every multi-row x violates x->z
    r2 = got["x->z"]
    assert (r2["n_keys"], r2["violations"]) == (3, 3)
    assert r2["example_keys"] == "1,2,3"
    import pytest

    with pytest.raises(ValueError):
        fd_audit(df, [])


def test_key_discovery_single_and_composite(spark):
    from vectordb_migrator_spark.operators.validation import key_discovery

    rows = [
        (1, "a", 10, "x"),
        (2, "a", 11, None),
        (3, "b", 10, "y"),
    ]
    df = spark.createDataFrame(rows, "id long, g string, v int, s string")
    got = {
        r["candidate"]: r
        for r in key_discovery(
            df, ["id", "g", "v", "s"], composites=[("g", "v")]
        ).collect()
    }
    assert got["id"]["is_key"] and got["id"]["ndv"] == 3
    assert not got["g"]["is_key"] and got["g"]["ndv"] == 2
    # NULL disqualifies even a fully-distinct column
    assert got["s"]["ndv"] == 2 and got["s"]["n_null"] == 1
    assert not got["s"]["is_key"]
    # (g, v) pairs: (a,10),(a,11),(b,10) all distinct -> composite key
    assert got["g+v"]["is_key"] and got["g+v"]["ndv"] == 3
    import pytest

    with pytest.raises(ValueError):
        key_discovery(df, [])


def test_id_gap_audit_finds_planted_holes(spark):
    from vectordb_migrator_spark.operators.validation import id_gap_audit

    # keys 0..999 with two holes: [100, 149] (50 ids) and a
    # cross-bucket hole [60..64] (5 ids) when bucket=32
    keys = [k for k in range(1000) if not (100 <= k <= 149) and not (60 <= k <= 64)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = id_gap_audit(df, "k", bucket=32, top_gaps=3).collect()
    assert out[0]["gap_rank"] == 1
    assert out[0]["missing_ids"] == 50
    assert out[0]["hole_start"] == 100 and out[0]["hole_end"] == 149
    assert out[1]["missing_ids"] == 5
    assert out[1]["hole_start"] == 60 and out[1]["hole_end"] == 64
    assert out[0]["total_missing"] == 55
    assert out[0]["n_keys"] == 945
    assert abs(out[0]["fill_ratio"] - 945 / 1000) < 1e-6


def test_id_gap_audit_dense_sequence_reports_nothing(spark):
    from vectordb_migrator_spark.operators.validation import id_gap_audit

    df = spark.createDataFrame([(k,) for k in range(500)], "k long")
    assert id_gap_audit(df, "k", bucket=64).count() == 0


def test_benford_report_planted_distributions(spark):
    """A Benford-sampled column passes (chi2 small); a constant-digit
    column is flagged with the break localized to its digit; digits
    never seen still appear with n=0; non-positive rows are excluded."""
    import math
    import random

    from vectordb_migrator_spark.operators.validation import (
        benford_report,
    )

    random.seed(11)
    # draw leading digits from the Benford pmf, random magnitudes
    probs = [math.log10(1 + 1 / d) for d in range(1, 10)]
    rows = []
    for i in range(4000):
        d = random.choices(range(1, 10), weights=probs)[0]
        mag = 10 ** random.randint(0, 3)
        rows.append((i, float(d * mag + random.random() * mag * 0.9)))
    rows.append((99990, -5.0))  # excluded
    rows.append((99991, None))  # excluded
    # r11 ADVICE: a positive value quantizing to 0 cents has leading
    # digit '0' — it must be EXCLUDED from n_total, not silently
    # dropped from the digit rows while still inflating the total
    rows.append((99992, 0.004))
    good = spark.createDataFrame(rows, "id long, v double")
    rep = benford_report(good, "v").collect()
    assert [r["digit"] for r in rep] == list(range(1, 10))
    assert rep[0]["n_total"] == 4000
    assert not rep[0]["suspicious"], rep[0]["chi2"]

    bad = spark.createDataFrame(
        [(i, 700.0 + i % 50) for i in range(2000)], "id long, v double"
    )
    rep2 = {r["digit"]: r for r in benford_report(bad, "v").collect()}
    assert rep2[1]["suspicious"]
    assert rep2[7]["n"] == 2000 and rep2[1]["n"] == 0
    assert rep2[7]["chi2_contrib"] > rep2[5]["chi2_contrib"]
