"""Entity-resolution operators: multi-pass blocking + fuzzy join."""

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.linkage import (
    best_match,
    blocked_candidates,
    fuzzy_join,
)


def _frames(spark):
    clean = spark.createDataFrame(
        [(1, "alpha-01"), (2, "alpha-02"), (3, "beta-17")],
        "c_id long, c_name string",
    )
    # one-char substitutions: d1 corrupts the tail (prefix intact),
    # d2 corrupts the head (suffix intact), d3 is an exact twin of
    # clean #2 (a dist-0 collision), d4 matches nothing within 1.
    dirty = spark.createDataFrame(
        [
            (11, "alpha-09"),
            (12, "aXpha-02"),
            (13, "alpha-02"),
            (14, "gamma-99"),
        ],
        "d_id long, d_name string",
    )
    return dirty, clean


def _blocks():
    return [
        (F.expr("substr(d_name, 1, 4)"), F.expr("substr(c_name, 1, 4)")),
        (F.expr("substr(d_name, 5, 4)"), F.expr("substr(c_name, 5, 4)")),
    ]


def test_blocked_candidates_multi_pass_recall(spark):
    dirty, clean = _frames(spark)
    cand = {
        (r["d_id"], r["c_id"])
        for r in blocked_candidates(
            dirty, clean, _blocks(), left_id="d_id", right_id="c_id"
        ).collect()
    }
    # every single-edit corruption keeps one blocking window intact
    assert (11, 1) in cand and (12, 2) in cand and (13, 2) in cand
    # the no-match record shares no window with anyone
    assert not any(d == 14 for d, _ in cand)


def test_fuzzy_join_distance_filter(spark):
    dirty, clean = _frames(spark)
    pairs = {
        (r["d_id"], r["c_id"]): r["dist"]
        for r in fuzzy_join(
            dirty,
            clean,
            on=("d_name", "c_name"),
            block_keys=_blocks(),
            left_id="d_id",
            right_id="c_id",
            max_dist=1,
        ).collect()
    }
    assert pairs[(11, 1)] == 1 and pairs[(12, 2)] == 1
    assert pairs[(13, 2)] == 0
    # alpha-09 vs alpha-02 is also dist 1 — blocked and kept
    assert pairs[(11, 2)] == 1


def test_best_match_deterministic_tie_break(spark):
    dirty, clean = _frames(spark)
    pairs = fuzzy_join(
        dirty,
        clean,
        on=("d_name", "c_name"),
        block_keys=_blocks(),
        left_id="d_id",
        right_id="c_id",
        max_dist=1,
    )
    best = {
        r["d_id"]: (r["c_id"], r["dist"])
        for r in best_match(
            pairs, left_id="d_id", right_id="c_id"
        ).collect()
    }
    # d11 ties at dist 1 between c1 and c2 -> smallest right id wins
    assert best[11] == (1, 1)
    # d13's dist-0 collision beats any dist-1 candidate
    assert best[13] == (2, 0)
    assert 14 not in best


def test_fuzzy_join_no_cartesian_plan(spark):
    dirty, clean = _frames(spark)
    plan = (
        fuzzy_join(
            dirty,
            clean,
            on=("d_name", "c_name"),
            block_keys=_blocks(),
            left_id="d_id",
            right_id="c_id",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocked_candidates_empty_block_keys_rejected(spark):
    """ADVICE r6: an empty pass list must fail with a clear message,
    not a bare IndexError deep in the union loop."""
    import pytest

    from vectordb_migrator_spark.operators.linkage import blocked_candidates

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError, match="block_keys"):
        blocked_candidates(df, df, [], left_id="id", right_id="id")
