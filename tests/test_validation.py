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
