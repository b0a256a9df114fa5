"""asof_join / sessionize edge-case tests (hand-built frames)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.relational import (
    asof_join,
    session_stats,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # after both rights
            (2, "u1", _ts("2024-01-01 08:00:00")),  # exactly at right ts
            (3, "u1", _ts("2024-01-01 07:00:00")),  # before any right
            (4, "u2", _ts("2024-01-01 10:00:00")),  # key with no rights
        ],
        ["id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 08:00:00"), "a"),
            ("u1", _ts("2024-01-01 09:30:00"), "b"),
        ],
        ["user", "ts", "tag"],
    )
    out = {
        r["id"]: (r["ts_r"], r["tag_r"])
        for r in asof_join(left, right, "user").collect()
    }
    assert out[1] == (_ts("2024-01-01 09:30:00"), "b")  # most recent
    assert out[2] == (_ts("2024-01-01 08:00:00"), "a")  # inclusive tie
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (None, None)  # key absent from right


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))], ["id", "user", "ts"]
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 08:00:00"), "old")], ["user", "ts", "tag"]
    )
    within = asof_join(
        left, right, "user", tolerance_micros=3 * 3600 * 1_000_000
    ).collect()[0]
    beyond = asof_join(
        left, right, "user", tolerance_micros=1 * 3600 * 1_000_000
    ).collect()[0]
    assert within["tag_r"] == "old"
    assert beyond["tag_r"] is None


def test_sessionize_gap_boundaries(spark):
    # gaps: 10s (same session), exactly 60s (same — strict >), 61s (new)
    rows = [
        ("u1", _ts("2024-01-01 10:00:00")),
        ("u1", _ts("2024-01-01 10:00:10")),
        ("u1", _ts("2024-01-01 10:01:10")),  # +60s → same session
        ("u1", _ts("2024-01-01 10:02:11")),  # +61s → new session
        ("u2", _ts("2024-01-01 10:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user", "ts"])
    s = sessionize(df, "user", "ts", gap_micros=60 * 1_000_000)
    got = {
        (r["user"], r["ts"].isoformat()): r["session_id"] for r in s.collect()
    }
    assert got[("u1", "2024-01-01T10:00:00")] == 1
    assert got[("u1", "2024-01-01T10:01:10")] == 1
    assert got[("u1", "2024-01-01T10:02:11")] == 2
    assert got[("u2", "2024-01-01T10:00:00")] == 1

    stats = session_stats(df, "user", "ts", gap_micros=60 * 1_000_000)
    by_key = {(r["user"], r["session_id"]): r for r in stats.collect()}
    assert by_key[("u1", 1)]["n_events"] == 3
    assert by_key[("u1", 1)]["duration_s"] == 70
    assert by_key[("u1", 2)]["n_events"] == 1
    assert by_key[("u1", 2)]["duration_s"] == 0


def test_asof_single_shuffle_plan(spark):
    """The as-of join must be ONE exchange on the key — no join node,
    no cross product in the physical plan."""
    left = spark.createDataFrame([(1, "u", _ts("2024-01-01 00:00:00"))], ["id", "user", "ts"])
    right = spark.createDataFrame([("u", _ts("2024-01-01 00:00:00"), 1.0)], ["user", "ts", "v"])
    plan = asof_join(left, right, "user")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # key exchange (+ AQE reuse artifacts)


def test_stratified_sample_exact_per_stratum(spark):
    from vectordb_migrator_spark.operators.slicing import stratified_sample

    rows = [(lbl, i) for lbl, size in [("a", 10), ("b", 25), ("c", 1)]
            for i in range(size)]
    df = spark.createDataFrame(rows, ["label", "id"])
    out = stratified_sample(
        df, strata_col="label", frac=0.2, order_col="id"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["label"], []).append(r["id"])
    # exact ceil(frac*n) per stratum; 1-row stratum survives
    assert sorted(by["a"]) == [0, 1]
    assert len(by["b"]) == 5
    assert by["c"] == [0]
    # hash_order variant: same per-stratum counts, stable across runs
    h1 = stratified_sample(
        df, strata_col="label", frac=0.2, order_col="id", hash_order=True
    ).collect()
    h2 = stratified_sample(
        df, strata_col="label", frac=0.2, order_col="id", hash_order=True
    ).collect()
    assert sorted(map(tuple, h1)) == sorted(map(tuple, h2))
    assert len([r for r in h1 if r["label"] == "b"]) == 5


def test_stratified_sample_single_exchange(spark):
    """Both windows must share one exchange on the stratum key."""
    from vectordb_migrator_spark.operators.slicing import stratified_sample

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["label", "id"])
    plan = (
        stratified_sample(df, strata_col="label", frac=0.5, order_col="id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning(label") == 1


def test_merge_upsert_latest_wins(spark):
    from vectordb_migrator_spark.operators.relational import merge_upsert

    cur = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 5)], ["k", "val", "version"]
    )
    upd = spark.createDataFrame(
        [(2, "b2", 2), (3, "stale", 4), (4, "new", 1), (1, "tie", 1)],
        ["k", "val", "version"],
    )
    out = {r["k"]: (r["val"], r["version"]) for r in merge_upsert(
        cur, upd, key_cols=["k"], version_col="version"
    ).collect()}
    assert out == {
        1: ("tie", 1),    # equal version → update wins (MERGE semantics)
        2: ("b2", 2),     # newer update wins
        3: ("c", 5),      # stale update loses
        4: ("new", 1),    # insert
    }


def test_funnel_stages_ordering_and_window(spark):
    import datetime as dt

    from vectordb_migrator_spark.operators.relational import funnel_stages

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        # u1 completes in order
        (1, ts(9), "view"), (1, ts(10), "click"), (1, ts(11), "purchase"),
        # u2 has all three but out of order → stops at stage 1
        (2, ts(9), "purchase"), (2, ts(10), "view"), (2, ts(11), "click"),
        # wait: u2 view@10 then click@11 → stage 2 (no purchase after)
        # u3 never views → stage 0
        (3, ts(9), "click"), (3, ts(10), "purchase"),
        # u4 same-timestamp click does NOT count (strictly later)
        (4, ts(9), "view"), (4, ts(9), "click"),
        # u5 completes but outside the window
        (5, ts(1), "view"), (5, ts(2), "click"), (5, ts(23), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r["user_id"]: r["stage"] for r in funnel_stages(
        df, ["view", "click", "purchase"]
    ).collect()}
    assert out == {1: 3, 2: 2, 3: 0, 4: 1, 5: 3}

    windowed = {r["user_id"]: r["stage"] for r in funnel_stages(
        df, ["view", "click", "purchase"], within="12 hours"
    ).collect()}
    assert windowed[1] == 3
    assert windowed[5] == 2  # purchase at +22h falls outside 12h window


def test_cohort_retention(spark):
    import datetime as dt

    from vectordb_migrator_spark.operators.relational import cohort_retention

    def ts(day, h=12):
        return dt.datetime(2024, 1, day, h)

    # week of Jan 1 2024 starts Mon Jan 1; next week Mon Jan 8
    rows = [
        (1, ts(2)), (1, ts(9)), (1, ts(16)),   # cohort w0, active w0/w1/w2
        (2, ts(3)), (2, ts(17)),               # cohort w0, active w0/w2
        (3, ts(10)),                           # cohort w1, active w1 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort"], r["week_n"]): (r["n_active"], r["retention"])
           for r in cohort_retention(df).collect()}
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-01", 2)] == (2, 1.0)
    assert out[("2024-01-08", 0)] == (1, 1.0)
    assert ("2024-01-08", 1) not in out


def test_weighted_sample_properties(spark):
    from vectordb_migrator_spark.operators.slicing import weighted_sample

    rows = [(i, 10.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    s1 = sorted(r["id"] for r in weighted_sample(
        df, weight_col="w", k=100, id_col="id"
    ).collect())
    s2 = sorted(r["id"] for r in weighted_sample(
        df, weight_col="w", k=100, id_col="id"
    ).collect())
    assert s1 == s2 and len(s1) == 100  # deterministic, exact k
    # the 10%-of-rows heavy stratum (10x weight) must be strongly
    # overrepresented vs its 10% population share
    heavy = sum(1 for i in s1 if i < 50)
    assert heavy >= 25
    # a different seed gives a different (but still deterministic) draw
    s3 = sorted(r["id"] for r in weighted_sample(
        df, weight_col="w", k=100, id_col="id", seed=7
    ).collect())
    assert s3 != s1

    # zero/negative/null weights never selected
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 1.0)], "id long, w double"
    )
    out = [r["id"] for r in weighted_sample(
        df2, weight_col="w", k=10, id_col="id"
    ).collect()]
    assert out == [4]


def test_weighted_sample_topk_plan(spark):
    from vectordb_migrator_spark.operators.slicing import weighted_sample

    df = spark.createDataFrame([(1, 1.0)], "id long, w double")
    plan = (
        weighted_sample(df, weight_col="w", k=5, id_col="id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_scd2_history_intervals_and_collapse(spark):
    from vectordb_migrator_spark.operators.relational import scd2_history

    rows = [
        (1, "A", 10, 100),
        (1, "A", 20, 101),  # no-op change — collapses into v1
        (1, "B", 30, 102),
        (1, "A", 40, 103),  # back to A — NEW version, not merged
        (2, "X", 15, 104),
    ]
    df = spark.createDataFrame(rows, "k long, status string, ts long, seq long")
    out = scd2_history(
        df, key_col="k", attr_cols=["status"], ts_col="ts",
        tiebreak_cols=("seq",),
    )
    got = [
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["version"],
         r["is_current"])
        for r in out.orderBy("k", "version").collect()
    ]
    assert got == [
        (1, "A", 10, 30, 1, False),
        (1, "B", 30, 40, 2, False),
        (1, "A", 40, None, 3, True),
        (2, "X", 15, None, 1, True),
    ]
    # lag-detector and lead-closer share one (k, ts, seq) sort order →
    # exactly one exchange in the whole plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_range_join_bucketed_equals_broadcast(spark):
    """The grid-cell equi-join must reproduce the nested-loop
    inequality join exactly — including overlapping bands and values
    on cell boundaries — while planning a hash join instead of a
    BroadcastNestedLoopJoin."""
    from vectordb_migrator_spark.operators.relational import (
        range_join,
        range_join_bucketed,
    )

    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(
            [0.0, 4.999, 5.0, 9.3, 10.0, 14.5, 20.0, 3.2, 17.7]
        )],
        "fid long, value double",
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 15.0), ("c", 10.0, 20.0)],
        "band string, lo double, hi double",
    )
    kw = dict(value_col="value")
    exact = {
        (r["fid"], r["band"])
        for r in range_join(facts, bands, **kw).collect()
    }
    got = {
        (r["fid"], r["band"])
        for r in range_join_bucketed(
            facts, bands, cell_width=4.0, **kw
        ).collect()
    }
    assert got == exact
    # boundary semantics: hi is exclusive, lo inclusive
    assert (4, "a") not in exact and (4, "b") in exact and (4, "c") in exact

    bcast = range_join(facts, bands, **kw)
    buck = range_join_bucketed(facts, bands, cell_width=4.0, **kw)
    assert "BroadcastNestedLoopJoin" in bcast._jdf.queryExecution().executedPlan().toString()
    bplan = buck._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in bplan  # equi-join on the grid cell


def test_dataset_diff_categories_and_churn(spark):
    """dataset_diff buckets every id correctly across two snapshots
    and computes churn against the old size; missing content columns
    fail loudly."""
    import pytest as _pytest

    from vectordb_migrator_spark.operators.validation import dataset_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d"), (9, "z")], ["doc_id", "text"]
    )
    r = dataset_diff(old, new).first()
    assert (r["added"], r["removed"], r["changed"], r["unchanged"]) == (1, 1, 1, 2)
    assert r["churn_vs_old"] == 0.75  # (1+1+1)/4
    with _pytest.raises(ValueError, match="content column"):
        dataset_diff(old.select("doc_id"), new.select("doc_id"))


def test_enforce_rules_quarantine_routing(spark):
    """Row-level contract gate: violation arrays carry the failed rule
    names (NULL predicate = violation), clean/quarantine routes
    partition the frame, and the combo summary accounts every row."""
    import pytest
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.validation import (
        enforce_rules,
        quarantine_summary,
    )

    df = spark.createDataFrame(
        [
            (1, 50.0, "view"),
            (2, 150.0, "view"),       # value cap
            (3, 50.0, "error"),       # bad type
            (4, None, "error"),       # NULL value -> cap+positive, bad type
        ],
        "id long, value double, event_type string",
    )
    rules = [
        ("value_le_100", F.col("value") <= 100),
        ("known_type", F.col("event_type").isin("view", "click")),
        ("value_positive", F.col("value") > 0),
    ]
    gated = enforce_rules(df, rules)
    got = {r["id"]: sorted(r["violations"]) for r in gated.collect()}
    assert got == {
        1: [],
        2: ["value_le_100"],
        3: ["known_type"],
        4: ["known_type", "value_le_100", "value_positive"],
    }
    clean = gated.filter(F.size("violations") == 0)
    quarantined = gated.filter(F.size("violations") > 0)
    assert clean.count() == 1 and quarantined.count() == 3

    summary = {r["combo"]: (r["n"], r["share"])
               for r in quarantine_summary(df, rules).collect()}
    assert summary[""] == (1, 0.25)
    assert summary["known_type,value_le_100,value_positive"] == (1, 0.25)
    assert sum(n for n, _ in summary.values()) == 4

    with pytest.raises(ValueError, match="rules"):
        enforce_rules(df, [])


def test_referential_audit_planted_orphans(spark):
    """FK audit: planted orphans and NULL keys land in the right
    columns (NULL reference is NOT an orphan, per SQL FK semantics),
    a clean relation reports zeros, and rates divide by the non-null
    key count. Empty relation list fails loudly."""
    import pytest

    from vectordb_migrator_spark.operators.validation import (
        referential_audit,
    )

    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    child = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 9), (4, 9), (5, None), (6, 3)],
        "id long, fk long",
    )
    clean_child = spark.createDataFrame([(1, 1), (2, 2)], "id long, fk long")

    rows = {
        r["relation"]: r
        for r in referential_audit(
            [
                ("dirty", child, "fk", parent, "pk"),
                ("clean", clean_child, "fk", parent, "pk"),
            ]
        ).collect()
    }
    d = rows["dirty"]
    assert (d["child_rows"], d["null_keys"], d["orphans"]) == (6, 1, 2)
    assert d["orphan_rate"] == 0.4  # 2 orphans / 5 non-null keys
    c = rows["clean"]
    assert (c["child_rows"], c["null_keys"], c["orphans"]) == (2, 0, 0)
    assert c["orphan_rate"] == 0.0

    with pytest.raises(ValueError, match="relations"):
        referential_audit([])


def test_psi_drift_planted_shift(spark):
    """PSI is ~0 for identical distributions, large for a planted
    location shift, and the detail view decomposes per bin with an
    eps-clamped contribution for bins the current side never hits."""
    from vectordb_migrator_spark.operators.validation import psi_drift

    base = [(float(i % 100),) for i in range(1000)]
    same = spark.createDataFrame(base, "v double")
    shifted = spark.createDataFrame(
        [(x + 200.0,) for (x,) in base], "v double"
    )

    stable = psi_drift(same, same, "v").first()
    assert stable["psi"] == 0.0 and not stable["drifted"]
    assert stable["n_ref"] == stable["n_cur"] == 1000

    moved = psi_drift(same, shifted, "v").first()
    assert moved["drifted"] and moved["psi"] > 1.0

    det = psi_drift(same, shifted, "v", detail=True).collect()
    assert len(det) == 10
    # every value of the shifted side lands past the last ref decile
    top = [r for r in det if r["bin"] == 10][0]
    assert top["cur_share"] == 1.0
    low = [r for r in det if r["bin"] == 1][0]
    assert low["cur_share"] == 0.0 and low["contrib"] > 0


def test_benford_audit_digits_and_summary(spark):
    """First-digit extraction is string-exact at cent precision
    (999.995 rounds up to digit 1, sub-cent values drop), uniform
    digits produce the known deviation table, and the summary's chi2
    and MAD match a Python replay."""
    import math

    from vectordb_migrator_spark.operators.validation import benford_audit

    vals = [float(d) for d in range(1, 10)] + [999.995, 0.005, -5.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    det = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    # 9 uniform digits + 999.995 -> 100000 cents -> digit 1
    assert det[1]["n"] == 2 and all(det[d]["n"] == 1 for d in range(2, 10))
    assert sum(r["n"] for r in det.values()) == 10  # 0.005, -5 excluded
    assert abs(det[2]["obs_share"] - 0.1) < 1e-9
    assert abs(det[2]["exp_share"] - math.log10(1.5)) < 1e-6

    s = benford_audit(df, "v", summary=True).first()
    obs = {d: det[d]["n"] / 10 for d in det}
    exp = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    chi2 = 10 * sum((obs[d] - exp[d]) ** 2 / exp[d] for d in range(1, 10))
    mad = sum(abs(obs[d] - exp[d]) for d in range(1, 10)) / 9
    assert s["n"] == 10
    assert abs(s["chi2"] - chi2) < 1e-5
    assert abs(s["mad"] - mad) < 1e-6
    assert not s["conforms"]  # uniform digits are far from Benford


def test_transition_matrix_known_sequences(spark):
    """Lag-1 transitions count correctly per unit, probabilities
    row-normalize, last events drop, and the tiebreak makes
    same-timestamp sequences reproducible."""
    from vectordb_migrator_spark.operators.relational import (
        transition_matrix,
    )

    rows = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "view"), (2, 2, "view"), (2, 3, "click"),
        (3, 5, "view"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "uid long, t long, state string")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_matrix(
            df, unit_col="uid", state_col="state", order_col="t"
        ).collect()
    }
    assert got[("view", "click")] == (2, 0.666667)
    assert got[("view", "view")] == (1, 0.333333)
    assert got[("click", "purchase")] == (1, 1.0)
    assert len(got) == 3  # u2's trailing click and u3's solo view drop

    # ties on t: tiebreak by id fixes the order
    tied = spark.createDataFrame(
        [(1, 1, 10, "a"), (1, 1, 20, "b"), (1, 1, 30, "c")],
        "uid long, t long, eid long, state string",
    )
    seq = transition_matrix(
        tied, unit_col="uid", state_col="state", order_col="t",
        tiebreak_col="eid",
    ).collect()
    assert {(r["from_state"], r["to_state"]) for r in seq} == {
        ("a", "b"), ("b", "c")
    }


def test_pareto_classes_cumulative_bounds(spark):
    """Keys are classed by cumulative share including themselves,
    with value ties broken by key; shares sum to 1 at the tail."""
    from vectordb_migrator_spark.operators.relational import pareto_classes

    rows = [("k1", 60.0), ("k2", 25.0), ("k3", 10.0), ("k4", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in pareto_classes(
        df, key_col="k", value_col="v"
    ).collect()}
    assert got["k1"]["class"] == "A" and got["k1"]["cum_share"] == 0.6
    assert got["k2"]["class"] == "B" and got["k2"]["cum_share"] == 0.85
    assert got["k3"]["class"] == "B" and got["k3"]["cum_share"] == 0.95  # boundary-inclusive
    assert got["k4"]["class"] == "C" and got["k4"]["cum_share"] == 1.0


def test_attribution_credits_three_models(spark):
    """Known journeys: last/first/linear credits land on the right
    touch types, linear splits 1/k, out-of-window and post-conversion
    touches get nothing, and every model's total equals the number of
    attributed conversions."""
    from vectordb_migrator_spark.operators.relational import (
        attribution_credits,
    )

    # user 1: view(t=10) -> click(t=20) -> PURCHASE(t=30)
    # user 2: click(t=5) [out of window] -> view(t=95) -> PURCHASE(t=100)
    # user 3: PURCHASE(t=50) with no touches; view(t=60) is after it
    events = [
        (1, 10, "view", 101), (1, 20, "click", 102), (1, 30, "purchase", 103),
        (2, 5, "click", 201), (2, 95, "view", 202), (2, 100, "purchase", 203),
        (3, 50, "purchase", 301), (3, 60, "view", 302),
    ]
    df = spark.createDataFrame(events, "uid long, ts long, et string, eid long")
    conv = df.filter(F.col("et") == "purchase")
    touch = df.filter(F.col("et") != "purchase")
    got = {
        (r["model"], r["touch_type"]): r["credited"]
        for r in attribution_credits(
            conv, touch,
            unit_col="uid", conv_ts_col="ts", conv_id_col="eid",
            touch_ts_col="ts", touch_type_col="et", touch_id_col="eid",
            lookback_s=50,
        ).collect()
    }
    # user1 window [>-20..30]: view+click; user2 window (50..100]: view only
    assert got[("last_touch", "click")] == 1.0  # user1's last touch
    assert got[("last_touch", "view")] == 1.0  # user2
    assert got[("first_touch", "view")] == 2.0  # both users start on view
    assert ("first_touch", "click") not in got or got[
        ("first_touch", "click")
    ] == 0.0
    assert got[("linear", "view")] == 1.5 and got[("linear", "click")] == 0.5
    for m in ("last_touch", "first_touch", "linear"):
        tot = sum(v for (mm, _), v in got.items() if mm == m)
        assert abs(tot - 2.0) < 1e-9  # user3 unattributed


def test_association_rules_known_baskets(spark):
    """Support/confidence/lift match hand computation; the support
    floor drops singleton pairs; duplicate basket lines dedup."""
    from vectordb_migrator_spark.operators.relational import (
        association_rules,
    )

    baskets = {
        1: ["milk", "bread"], 2: ["milk", "bread", "eggs"],
        3: ["milk", "bread"], 4: ["milk", "eggs", "eggs"],
        5: ["bread"], 6: ["juice"],
    }
    rows = [(b, i) for b, its in baskets.items() for i in its]
    df = spark.createDataFrame(rows, "o long, item string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(
            df, basket_col="o", item_col="item", min_count=2, top_k=10
        ).collect()
    }
    r = got[("bread", "milk")]
    # n_ab=3, N=6, n_bread=4, n_milk=4
    assert r["n_ab"] == 3 and r["support"] == 0.5
    assert r["conf_a_b"] == 0.75 and r["conf_b_a"] == 0.75
    assert abs(r["lift"] - 6 * 3 / 16) < 1e-6
    assert ("eggs", "milk") in got  # count 2 (basket 4 dedups eggs)
    assert got[("eggs", "milk")]["n_ab"] == 2
    assert ("bread", "eggs") not in got  # count 1 < floor


def test_schema_evolution_report_classification(spark):
    """Widenings and nullable additions are safe; drops, narrowings,
    and required-tightening are breaking; identical schemas diff
    empty."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    from vectordb_migrator_spark.operators.validation import (
        schema_evolution_report,
    )

    old = StructType([
        StructField("id", IntegerType(), False),
        StructField("price", DoubleType(), True),
        StructField("legacy", StringType(), True),
        StructField("note", StringType(), True),
    ])
    new = StructType([
        StructField("id", LongType(), False),        # safe widen
        StructField("price", IntegerType(), True),   # breaking narrow
        StructField("note", StringType(), False),    # breaking tighten
        StructField("tag", StringType(), True),      # safe add
        StructField("score", DoubleType(), False),   # breaking add
    ])
    rep = {(r["column"], r["change"]): r["severity"]
           for r in schema_evolution_report(old, new)}
    assert rep[("id", "type")] == "safe"
    assert rep[("price", "type")] == "breaking"
    assert rep[("legacy", "dropped")] == "breaking"
    assert rep[("note", "nullability")] == "breaking"
    assert rep[("tag", "added")] == "safe"
    assert rep[("score", "added")] == "breaking"
    assert schema_evolution_report(old, old) == []


def test_root_cause_report_planted_shift(spark):
    """A planted composition shift in ONE dimension value dominates
    that dimension's surprise ranking with the right explanatory
    power; an unchanged dimension scores ~0 surprise; absent-in-ref
    values stay finite; empty dims fail loudly."""
    import pytest

    from vectordb_migrator_spark.operators.validation import (
        root_cause_report,
    )

    ref = spark.createDataFrame(
        [("us", "web")] * 50 + [("eu", "web")] * 50,
        "country string, channel string",
    )
    # cur: eu doubles, and a brand-new country appears
    cur = spark.createDataFrame(
        [("us", "web")] * 50 + [("eu", "web")] * 100 + [("jp", "web")] * 10,
        "country string, channel string",
    )
    rep = {
        (r["dim"], r["value"]): r
        for r in root_cause_report(
            ref, cur, ["country", "channel"]
        ).collect()
    }
    eu = rep[("country", "eu")]
    assert eu["ref_n"] == 50 and eu["cur_n"] == 100
    # delta: total 100 -> 160; eu contributes 50/60
    assert abs(eu["explanatory_power"] - 50 / 60) < 1e-6
    top_country = [
        r for (d, _), r in rep.items() if d == "country" and r["rank"] == 1
    ][0]
    # a brand-new value is maximally surprising (share eps -> 1/16)
    assert top_country["value"] == "jp"
    jp = rep[("country", "jp")]
    assert jp["ref_n"] == 0 and jp["surprise"] is not None
    web = rep[("channel", "web")]
    assert abs(web["surprise"]) < 1e-9  # composition unchanged (100%)

    with pytest.raises(ValueError, match="dims"):
        root_cause_report(ref, cur, [])


def test_referential_audit_all_null_keys_reports_null_rate(spark):
    """ANSI-mode regression (round-8 ADVICE): a child whose keys are
    ALL NULL is an in-contract case the audit must REPORT (null_keys
    = child_rows, orphan_rate NULL via try_divide), not abort with
    DIVIDE_BY_ZERO on the zero non-null denominator."""
    from vectordb_migrator_spark.operators.validation import (
        referential_audit,
    )

    parent = spark.createDataFrame([(1,)], ["pk"])
    child = spark.createDataFrame(
        [(1, None), (2, None)], "id long, fk long"
    )
    r = referential_audit([("nulls", child, "fk", parent, "pk")]).head()
    assert (r["child_rows"], r["null_keys"], r["orphans"]) == (2, 2, 0)
    assert r["orphan_rate"] is None


def test_pk_uniqueness_planted_duplicates_and_composite_key(spark):
    """Planted duplicate keys, NULL keys, and a composite key: counts
    land in the right columns and a clean table reports zeros."""
    import pytest

    from vectordb_migrator_spark.operators.validation import pk_uniqueness

    dirty = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,), (3,)], "k long"
    )
    comp = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (2, None)], "a long, b long"
    )
    clean = spark.createDataFrame([(1,), (2,)], "k long")
    rows = {
        r["tbl"]: r
        for r in pk_uniqueness(
            [
                ("dirty", dirty, ["k"]),
                ("comp", comp, ["a", "b"]),
                ("clean", clean, ["k"]),
            ]
        ).collect()
    }
    d = rows["dirty"]
    assert (d["n_rows"], d["distinct_keys"], d["dup_keys"]) == (6, 3, 1)
    assert (d["dup_rows"], d["null_rows"]) == (2, 1)
    assert d["dup_rate"] == round(2 / 6, 6)
    c = rows["comp"]
    # (1,1) unique, (1,2) duplicated, (2,NULL) is a null-key row
    assert (c["n_rows"], c["distinct_keys"], c["dup_keys"]) == (4, 2, 1)
    assert (c["dup_rows"], c["null_rows"]) == (1, 1)
    cl = rows["clean"]
    assert (cl["dup_keys"], cl["dup_rows"], cl["null_rows"]) == (0, 0, 0)

    with pytest.raises(ValueError, match="tables"):
        pk_uniqueness([])
    with pytest.raises(ValueError, match="key columns"):
        pk_uniqueness([("x", clean, [])])


def test_rfm_segments_deterministic_tiles(spark):
    import datetime as dt

    from vectordb_migrator_spark.operators.relational import rfm_segments

    base = dt.datetime(2024, 6, 1)
    rows = []
    # user u: u+1 events, each value 10*u, last event at day u
    for u in range(5):
        for i in range(u + 1):
            rows.append((u, base + dt.timedelta(days=u, hours=i), 10.0 * u))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = rfm_segments(
        df, user_col="user_id", ts_col="ts", value_col="value"
    ).collect()
    # 5 users, 5 tiles: each user its own tile on every axis.
    # recency: anchor day 4; user u last seen day u -> r = 4-u;
    # ORDER BY r DESC puts u=0 (stalest) in tile 1, u=4 in tile 5.
    # f and m both increase with u, so every axis scores u+1.
    assert len(out) == 5
    for r in out:
        assert r["r_score"] == r["f_score"] == r["m_score"]
        assert r["users"] == 1
    by_tile = {r["r_score"]: r for r in out}
    assert by_tile[1]["avg_recency_days"] == 4.0
    assert by_tile[5]["avg_recency_days"] == 0.0
    assert by_tile[5]["avg_frequency"] == 5.0
    assert by_tile[5]["avg_monetary"] == 200.0  # 5 events * 40
