"""resample_fill_hourly + sketch accuracy tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.timeseries import resample_fill_hourly


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_gap_fill_creates_zero_rows(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 10:15:00"), "a"),
            (_ts("2024-01-01 10:45:00"), "a"),
            # hour 11 silent for both keys
            (_ts("2024-01-01 12:05:00"), "b"),
        ],
        "ts timestamp, event_type string",
    )
    out = {
        (r["hour"].isoformat(), r["event_type"]): r["n"]
        for r in resample_fill_hourly(df).collect()
    }
    # 3 hours × 2 keys = dense grid
    assert len(out) == 6
    assert out[("2024-01-01T10:00:00", "a")] == 2
    assert out[("2024-01-01T11:00:00", "a")] == 0
    assert out[("2024-01-01T11:00:00", "b")] == 0
    assert out[("2024-01-01T12:00:00", "b")] == 1
    assert out[("2024-01-01T12:00:00", "a")] == 0


def test_approx_percentile_close_to_exact(spark):
    """The sketch (accuracy 10000) must sit within a tight relative
    band of the exact interpolated percentile on real data."""
    from vectordb_migrator_spark.suite import _t

    ev = _t(spark, "/root/testdata/sf0.001", "events")
    approx, exact = (
        ev.agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("a"),
            F.percentile("value", F.lit(0.5)).alias("e"),
        )
        .collect()[0]
    )
    assert abs(approx - exact) <= max(abs(exact) * 0.02, 1e-6)


def test_zscore_anomalies_flags_only_outliers(spark):
    from vectordb_migrator_spark.operators.timeseries import zscore_anomalies

    # key "a": 20 values at ~10 plus one wild outlier; key "b": flat
    rows = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(20)]
    rows.append((99, "a", 1000.0))
    rows += [(200 + i, "b", 5.0 + (i % 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = zscore_anomalies(df, threshold=3.0)
    got = [(r["event_id"], r["event_type"]) for r in out.collect()]
    assert got == [(99, "a")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # stats side broadcast, no skewed window
    assert "Window" not in plan


def test_equal_frequency_bins_quartiles(spark):
    from vectordb_migrator_spark.operators.slicing import equal_frequency_bins

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "value double"
    )
    out = equal_frequency_bins(df, value_col="value")
    counts = {
        r["bin"]: r["n"]
        for r in out.groupBy("bin").agg(F.count("*").alias("n")).collect()
    }
    # 1..100: boundaries 25.75/50.5/75.25 → 25/25/25/25
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan  # no global ordering — broadcast bounds


def test_equal_frequency_bins_nulls_stay_unbinned(spark):
    """NULL values must get a NULL bin, not silently land in the top
    bin via the otherwise() branch."""
    from vectordb_migrator_spark.operators.slicing import equal_frequency_bins

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (None,), (None,)], "value double"
    )
    out = equal_frequency_bins(df, value_col="value").collect()
    bins = {r["value"]: r["bin"] for r in out}
    assert bins[1.0] == 1 and bins[4.0] == 4
    assert all(r["bin"] is None for r in out if r["value"] is None)


def test_window_ewma_matches_recursive_python(spark):
    """The closed-form window EWMA must equal the recursive definition
    (seeded with the first value) on a toy series."""
    import sys
    sys.path.insert(0, ".")
    from vectordb_migrator_spark.suite import QUERIES  # noqa: F401

    a = 0.3
    xs = [10.0, 20.0, 5.0, 7.0, 30.0]
    ew = xs[0]
    want = [round(ew, 6)]
    for x in xs[1:]:
        ew = a * x + (1 - a) * ew
        want.append(round(ew, 6))

    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "rn int, n double"
    )
    w = W.orderBy("rn").rowsBetween(W.unboundedPreceding, W.currentRow)
    term = F.when(F.col("rn") == 1, F.lit(0.0)).otherwise(
        F.col("n") / F.pow(F.lit(1 - a), F.col("rn"))
    )
    ewma = (
        F.lit(a) * F.pow(F.lit(1 - a), F.col("rn")) * F.sum(term).over(w)
        + F.pow(F.lit(1 - a), F.col("rn") - 1) * F.first("n").over(W.orderBy("rn"))
    )
    got = [
        r["e"] for r in df.select(F.round(ewma, 6).alias("e")).orderBy("rn").collect()
    ]
    assert got == want


def test_rolling_correlation_tracks_comovement(spark):
    """Perfectly co-moving series converge to corr 1, anti-moving to
    -1; the first window (single hour) and zero-variance windows are
    NULL rather than an ANSI divide-by-zero error."""
    from datetime import datetime, timedelta

    from vectordb_migrator_spark.operators.timeseries import rolling_correlation

    t0 = datetime(2026, 5, 1)
    rows = []
    for h in range(6):
        rows.append((h, "view", float(h + 1), t0 + timedelta(hours=h)))
        rows.append((h, "click", float(2 * (h + 1)), t0 + timedelta(hours=h)))
        rows.append((h, "other", 99.0, t0 + timedelta(hours=h)))  # ignored
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp"
    )
    out = rolling_correlation(
        df, key_a="view", key_b="click", window_hours=4
    ).orderBy("hour").collect()
    assert out[0]["corr"] is None            # single-row window
    assert all(r["corr"] == 1.0 for r in out[1:])  # exact linear relation

    const = df.withColumn("value", F.lit(5.0))
    flat = rolling_correlation(
        const, key_a="view", key_b="click", window_hours=4
    ).collect()
    assert all(r["corr"] is None for r in flat)  # zero variance → NULL


def test_seasonal_zscore_uses_hourly_baseline(spark):
    """A value normal globally but wild for ITS hour is flagged; the
    same value at an hour where it is typical is not — the distinction
    the global z-score cannot make."""
    from datetime import datetime, timedelta

    from vectordb_migrator_spark.operators.timeseries import (
        seasonal_zscore_anomalies,
        zscore_anomalies,
    )

    rows = []
    eid = 0
    # hour 3: quiet (value ~1); hour 12: busy (value ~100)
    for d in range(12):
        base = datetime(2026, 6, 1 + d)
        for v in (0.9, 1.0, 1.1):
            rows.append((eid, "a", v, base + timedelta(hours=3))); eid += 1
        for v in (99.0, 100.0, 101.0):
            rows.append((eid, "a", v, base + timedelta(hours=12))); eid += 1
    # the anomaly: a hour-12-sized value at 3am
    rows.append((9999, "a", 100.0, datetime(2026, 6, 20, 3)))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp"
    )
    seasonal = {r["event_id"] for r in seasonal_zscore_anomalies(df).collect()}
    assert 9999 in seasonal
    # globally, 100.0 is a perfectly common value → global z misses it
    global_z = {r["event_id"] for r in zscore_anomalies(df).collect()}
    assert 9999 not in global_z


def test_cusum_changepoints_detects_level_shift(spark):
    """A synthetic series with a known mean shift: the |CUSUM| peak
    must land on the shift boundary, exactly one row is flagged peak,
    and the statistic matches a NumPy replica."""
    import datetime as dt

    import numpy as np

    from vectordb_migrator_spark.operators.timeseries import (
        cusum_changepoints,
    )

    # 20 days at level 10, then 20 days at level 30 — shift at day 21
    rows = []
    for i in range(40):
        base = 10.0 if i < 20 else 30.0
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        for j in range(3):
            rows.append((ts + dt.timedelta(hours=j), base + j))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = cusum_changepoints(df, threshold=3.0).collect()
    assert len(out) == 40
    assert sum(r["is_peak"] for r in out) == 1
    peak = next(r for r in out if r["is_peak"] == 1)
    # the cumulative deviation is most negative right before the shift
    assert peak["day"] == "2024-01-20"
    assert any(r["exceeds"] == 1 for r in out)

    v = np.array([r["v"] for r in out])
    mu, sd = v.mean(), v.std()
    want = np.round(np.cumsum((v - mu) / sd), 6)
    got = np.array([r["cusum"] for r in out])
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_cusum_streaming_store_matches_batch(spark, tmp_path):
    """Round-7 X13×X8: the daily-stats store accumulates per-batch
    (day, sum, cnt) partials and changepoints_over answers EXACTLY
    what the batch operator computes over the full data (weighted-sum
    merge, not mean-of-means); replays append nothing."""
    import datetime as dt

    from vectordb_migrator_spark.operators.timeseries import (
        cusum_changepoints,
    )
    from vectordb_migrator_spark.streaming.incremental import (
        changepoints_over,
        daily_stats_ingest,
    )

    src = str(tmp_path / "in")
    schema = "ts timestamp, value double"
    base = dt.datetime(2024, 3, 1)
    b1 = [
        (base + dt.timedelta(days=d, hours=h), 5.0 + d + h)
        for d in range(10)
        for h in range(3)
    ]
    spark.createDataFrame(b1, schema).write.parquet(src)

    def run():
        q = daily_stats_ingest(
            spark,
            source_path=src,
            source_schema=schema,
            store_path=str(tmp_path / "store"),
            checkpoint=str(tmp_path / "ck"),
        )
        q.awaitTermination(120)

    run()
    # second batch SPLITS day 9 across batches and adds shifted days —
    # the weighted merge has to reconstruct the true daily mean
    b2 = [
        (base + dt.timedelta(days=d, hours=h), 40.0 + h)
        for d in range(9, 16)
        for h in range(2)
    ]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    run()

    full = spark.createDataFrame(b1 + b2, schema)
    want = [r.asDict() for r in cusum_changepoints(full).collect()]
    got = [
        r.asDict()
        for r in changepoints_over(spark, str(tmp_path / "store"))
        .orderBy("day")
        .collect()
    ]
    assert got == want

    n = spark.read.parquet(str(tmp_path / "store")).count()
    run()  # replay idempotence
    assert spark.read.parquet(str(tmp_path / "store")).count() == n


def test_mad_outliers_robust_to_masking(spark):
    """The masking failure mode: three huge values inflate stddev
    until the z-gate misses the smallest of them, while the
    median/MAD gate flags exactly the planted outliers."""
    from vectordb_migrator_spark.operators.timeseries import (
        mad_outliers,
        zscore_anomalies,
    )

    base = [(i, "a", 10.0 + (i % 7) * 0.1) for i in range(40)]
    spikes = [(100, "a", 5000.0), (101, "a", 6000.0), (102, "a", 7000.0)]
    df = spark.createDataFrame(
        base + spikes, "event_id long, event_type string, value double"
    )
    mad_ids = {r["event_id"] for r in mad_outliers(df).collect()}
    assert mad_ids == {100, 101, 102}
    z_ids = {r["event_id"]
             for r in zscore_anomalies(df, threshold=3.0).collect()}
    assert 100 not in z_ids  # masked: the spikes drag stddev up
    assert z_ids < {100, 101, 102}  # and nothing normal is flagged


def test_mad_outliers_constant_key_not_flagged(spark):
    """A majority-constant key has MAD 0 -> NULL scores, nothing
    flagged (not an everything-is-an-outlier explosion)."""
    from vectordb_migrator_spark.operators.timeseries import mad_outliers

    df = spark.createDataFrame(
        [(i, "k", 5.0) for i in range(20)] + [(99, "k", 9.0)],
        "event_id long, event_type string, value double",
    )
    assert mad_outliers(df).count() == 0


def test_acf_matches_numpy(spark):
    """The suite ACF query equals the NumPy autocovariance ratio on
    the same daily series."""
    import numpy as np

    from vectordb_migrator_spark.suite import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r["lag"]: r["acf"]
           for r in QUERIES["x13_acf"](spark, sf).collect()}
    import duckdb
    v = [
        r[1]
        for r in duckdb.sql(
            f"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
                       round(avg(value), 6) AS v
                FROM read_parquet('{sf}/events.parquet')
                GROUP BY 1 ORDER BY 1"""
        ).fetchall()
    ]
    x = np.array(v)
    mu = x.mean()
    denom = ((x - mu) ** 2).sum()
    for lag in range(1, 15):
        want = ((x[lag:] - mu) * (x[:-lag] - mu)).sum() / denom
        assert abs(got[lag] - want) < 2e-6, lag


def test_seasonal_naive_backtest_known_series(spark):
    """A perfectly weekly series scores MAE 0 and skill 0; a flat
    series scores identically under both forecasters (skill 1); short
    series exclude unlagged points."""
    import datetime as dt

    from vectordb_migrator_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(21)]
    weekly = [("w", d, float([5, 1, 1, 1, 1, 9, 9][i % 7]))
              for i, d in enumerate(days)]
    flat = [("f", d, 4.0) for d in days]
    df = spark.createDataFrame(weekly + flat, "g string, day date, v double")

    got = {
        r["g"]: r
        for r in seasonal_naive_backtest(
            df, group_cols=["g"], season=7, horizon=7
        ).collect()
    }
    assert got["w"]["n_scored"] == 7
    assert got["w"]["mae"] == 0.0 and got["w"]["rmse"] == 0.0
    assert got["w"]["skill"] == 0.0  # seasonal exact, naive-1 isn't
    assert got["f"]["mae"] == 0.0 and got["f"]["skill"] is None  # 0/0


def test_theil_sen_trend_outlier_robust(spark):
    """Theil-Sen recovers the true slope of a clean linear series and
    ignores a single wild outlier that would drag least squares."""
    import datetime as dt

    from vectordb_migrator_spark.operators.timeseries import theil_sen_trend

    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(15)]
    rows = [("a", d, 10.0 + 2.0 * i) for i, d in enumerate(days)]
    rows[7] = ("a", days[7], 10_000.0)  # one corrupted day
    df = spark.createDataFrame(rows, "g string, day date, v double")

    r = theil_sen_trend(df, group_cols=["g"]).first()
    assert r["n_days"] == 15
    assert abs(r["slope_per_day"] - 2.0) < 1e-6
    # intercept consistent with v = 10 + 2*(t - t0)
    t0 = (days[0] - dt.date(1970, 1, 1)).days
    assert abs(r["intercept"] - (10.0 - 2.0 * t0)) < 1e-6


def test_kaplan_meier_textbook_example(spark):
    """KM product-limit matches the hand computation on a classic
    censored dataset, censored units reduce the risk set without
    dropping survival, and an everyone-leaves time drives S to 0."""
    from vectordb_migrator_spark.operators.timeseries import kaplan_meier

    # durations: events at 1,3,3,7; censored at 2,5
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1), (5.0, 0), (7.0, 1)]
    df = spark.createDataFrame(rows, "dur double, ev int")
    got = {r["t"]: r for r in kaplan_meier(
        df, duration_col="dur", event_col="ev"
    ).collect()}
    # t=1: n=6, d=1 -> S=5/6
    assert got[1.0]["n_at_risk"] == 6
    assert abs(got[1.0]["survival"] - 5 / 6) < 1e-6
    # t=3: n=4 (6-1 event-1 censored), d=2 -> S=5/6 * 2/4
    assert got[3.0]["n_at_risk"] == 4 and got[3.0]["n_events"] == 2
    assert abs(got[3.0]["survival"] - (5 / 6) * 0.5) < 1e-6
    # t=7: n=1, d=1 -> S=0 exactly (everyone left)
    assert got[7.0]["survival"] == 0.0
    assert set(got) == {1.0, 3.0, 7.0}  # censor-only times excluded


def test_cusum_flat_series_yields_null_not_abort(spark):
    """ANSI-mode regression (round-8 ADVICE): a constant (or single
    day) series has stddev 0; the standardized deviation must come
    back NULL via try_divide instead of aborting the job with
    DIVIDE_BY_ZERO — the failure mode that would kill a streaming
    changepoints_over read on a fresh one-day store."""
    import datetime as dt

    from vectordb_migrator_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 5.0)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = cusum_changepoints(df, threshold=3.0).collect()
    assert len(out) == 3
    assert all(r["cusum"] is None for r in out)

    one_day = spark.createDataFrame(rows[:1], "ts timestamp, value double")
    assert cusum_changepoints(one_day).count() == 1


def test_ols_trend_matches_numpy(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.timeseries import ols_trend

    rows = []
    # series A: clean line v = 2t + 5; series B: line + one outlier;
    # series C: single point (NULL report); series D: constant t
    for t in range(10):
        rows.append(("a", float(t), 2.0 * t + 5.0))
        rows.append(("b", float(t), 1.5 * t + (100.0 if t == 7 else 0.0)))
    rows.append(("c", 3.0, 9.9))
    rows += [("d", 1.0, 1.0), ("d", 1.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {
        r["g"]: r
        for r in ols_trend(
            df, t_col="t", value_col="v", group_cols=["g"]
        ).collect()
    }

    for g in ("a", "b"):
        t = np.array([r[1] for r in rows if r[0] == g])
        v = np.array([r[2] for r in rows if r[0] == g])
        slope, intercept = np.polyfit(t, v, 1)
        r = np.corrcoef(t, v)[0, 1]
        assert abs(got[g]["slope"] - round(slope, 6)) < 1e-5, g
        assert abs(got[g]["intercept"] - round(intercept, 6)) < 1e-5, g
        assert abs(got[g]["r2"] - round(r * r, 6)) < 1e-5, g
    assert got["a"]["r2"] == 1.0
    assert got["b"]["r2"] < 1.0
    assert got["c"]["slope"] is None and got["c"]["n"] == 1
    assert got["d"]["slope"] is None  # zero time-variance


def test_anomaly_ensemble_vote_semantics(spark):
    """A one-day spike trips z but not CUSUM; a sustained level shift
    trips CUSUM (and MAD) where z stays quiet — and only days with
    two agreeing detectors flag."""
    from vectordb_migrator_spark.operators.timeseries import (
        anomaly_ensemble,
    )

    # alternating 10/11 baseline (MAD stays positive) + one spike
    days = [(f"2024-01-{d:02d}", 10.0 + (d % 2)) for d in range(1, 21)]
    days[9] = ("2024-01-10", 60.0)  # spike day
    df = spark.createDataFrame(days, "day string, v double")
    got = {r["day"]: r for r in anomaly_ensemble(df).collect()}
    spike = got["2024-01-10"]
    assert spike["z_flag"] == 1 and spike["mad_flag"] == 1
    assert spike["votes"] >= 2 and spike["flagged"]
    # an early ordinary day: all three detectors quiet
    quiet = got["2024-01-05"]
    assert quiet["votes"] == 0 and not quiet["flagged"]


def test_anomaly_ensemble_constant_series_no_abort(spark):
    from vectordb_migrator_spark.operators.timeseries import (
        anomaly_ensemble,
    )

    df = spark.createDataFrame(
        [(f"2024-02-{d:02d}", 5.0) for d in range(1, 11)],
        "day string, v double",
    )
    out = anomaly_ensemble(df).collect()  # sd = 0, MAD = 0: no abort
    assert all(r["votes"] == 0 and not r["flagged"] for r in out)


def test_mix_decomposition_identity_and_effects(spark):
    from vectordb_migrator_spark.operators.timeseries import (
        mix_decomposition,
    )

    rows = []
    # seg 'grow': volume doubles, rate constant 10
    rows += [("grow", "a", 10.0)] * 4 + [("grow", "b", 10.0)] * 8
    # seg 'rate': volume constant 4, rate 10 -> 15
    rows += [("rate", "a", 10.0)] * 4 + [("rate", "b", 15.0)] * 4
    # seg 'gone': only in period a (pure negative volume effect)
    rows += [("gone", "a", 20.0)] * 3
    df = spark.createDataFrame(rows, "segment string, p string, value double")
    got = {
        r["segment"]: r
        for r in mix_decomposition(
            df, segment_col="segment", period_col="p",
            value_col="value", period_a="a", period_b="b",
        ).collect()
    }
    g = got["grow"]
    assert (g["volume_effect"], g["rate_effect"], g["interaction"]) == (
        40.0, 0.0, 0.0,
    )
    r = got["rate"]
    assert (r["volume_effect"], r["rate_effect"], r["interaction"]) == (
        0.0, 20.0, 0.0,
    )
    z = got["gone"]
    assert z["n_b"] == 0 and z["rate_b"] == 0.0
    assert z["volume_effect"] == -60.0
    # per-segment identity: effects always sum to total change
    for v in got.values():
        assert abs(
            v["volume_effect"] + v["rate_effect"] + v["interaction"]
            - v["total_change"]
        ) < 1e-6


def test_interarrival_profile_poisson_vs_metronome(spark):
    import datetime as dt
    import math
    import random

    from vectordb_migrator_spark.operators.timeseries import (
        interarrival_profile,
    )

    base = dt.datetime(2024, 4, 1)
    rows = []
    # metronome: exact 60s gaps -> sd 0, burstiness -1, exp fit bad
    t = base
    for i in range(60):
        rows.append(("tick", t, i))
        t += dt.timedelta(seconds=60)
    # seeded exponential-ish gaps -> burstiness near 0, exp fit ok
    rng = random.Random(7)
    t = base
    for i in range(400):
        rows.append(("poisson", t, 1000 + i))
        t += dt.timedelta(seconds=-60.0 * math.log(1 - rng.random()))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long")
    got = {
        r["key"]: r for r in interarrival_profile(df).collect()
    }
    tick = got["tick"]
    assert tick["mean_gap_s"] == 60.0 and tick["cv"] == 0.0
    assert tick["burstiness"] == -1.0
    assert not tick["exponential_fit_ok"]  # step CDF vs smooth exp
    poi = got["poisson"]
    assert abs(poi["burstiness"]) < 0.15
    assert poi["exponential_fit_ok"]


def test_periodogram_daily_finds_planted_weekly_cycle(spark):
    import datetime
    import math

    from vectordb_migrator_spark.operators.timeseries import (
        periodogram_daily,
    )

    d0 = datetime.date(2024, 1, 1)
    rows = [
        (
            d0 + datetime.timedelta(days=i),
            100.0 + 30.0 * math.cos(2 * math.pi * i / 7),
        )
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "day date, y double")
    out = periodogram_daily(df, day_col="day", value_col="y").collect()
    by_p = {r["period"]: r for r in out}
    assert bool(by_p[7]["dominant"])
    assert sum(1 for r in out if r["dominant"]) == 1
    # the planted cycle carries essentially all grid power
    assert by_p[7]["power_share"] > 0.9
    shares = [r["power_share"] for r in out]
    assert abs(sum(shares) - 1.0) < 1e-3


def test_periodogram_trig_table_is_unit_circle(spark):
    from vectordb_migrator_spark.operators.timeseries import (
        periodogram_trig_table,
    )

    rows = periodogram_trig_table((2, 7))
    assert len(rows) == 9
    for p, r, c, s in rows:
        assert 0 <= r < p
        assert abs(c * c + s * s - 1.0) < 1e-8
    # residue 0 is always angle 0
    assert all(c == 1.0 and s == 0.0 for p, r, c, s in rows if r == 0)


def test_granger_lag1_detects_planted_direction(spark):
    import datetime

    from vectordb_migrator_spark.operators.timeseries import granger_lag1

    # y_t = x_{t-1} (pure lag copy): x->y must dominate; x is a
    # deterministic pseudo-random walk with no dependence on y
    d0 = datetime.date(2024, 1, 1)
    xs = [((i * 37) % 23) + ((i * 11) % 7) for i in range(40)]
    rows = []
    for i in range(40):
        # y follows yesterday's x plus small deterministic noise (a
        # perfectly-fit y would make rss_u = 0 -> NULL F by contract)
        y = (xs[i - 1] if i > 0 else 0) + (i * 13) % 3
        rows.append((d0 + datetime.timedelta(days=i), xs[i], y))
    df = spark.createDataFrame(rows, "day date, x long, y long")
    out = {r["direction"]: r for r in granger_lag1(df).collect()}
    assert bool(out["x->y"]["significant"])
    assert out["x->y"]["f_stat"] > 100  # near-perfect fit
    assert out["x->y"]["rss_unrestricted"] < out["x->y"]["rss_restricted"]
    assert not bool(out["y->x"]["significant"])


def test_granger_lag1_short_series_null_f(spark):
    import datetime

    from vectordb_migrator_spark.operators.timeseries import granger_lag1

    d0 = datetime.date(2024, 1, 1)
    rows = [(d0 + datetime.timedelta(days=i), i, i) for i in range(3)]
    df = spark.createDataFrame(rows, "day date, x long, y long")
    out = granger_lag1(df).collect()
    # n = 2 lagged rows -> rss_u/(n-3) divides by -1? n-3 = -1 is fine
    # arithmetic; the perfectly-collinear x/y makes det 0 -> NULL b's
    for r in out:
        assert r["f_stat"] is None or r["f_stat"] >= 0


def test_periodogram_streaming_store_matches_batch(spark, tmp_path):
    """X13×X8: periodogram_over answers EXACTLY what the batch
    periodogram computes over the full data — daily counts merge as
    sums of per-batch counts, so batch splits can't skew the series."""
    import datetime as dt
    import math

    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.timeseries import (
        periodogram_daily,
    )
    from vectordb_migrator_spark.streaming.incremental import (
        daily_stats_ingest,
        periodogram_over,
    )

    src = str(tmp_path / "in")
    schema = "ts timestamp, value double"
    base = dt.datetime(2024, 3, 1)

    def day_events(d):
        # planted weekly cycle in EVENT COUNT: 3..17 events per day
        n = 10 + int(round(7 * math.cos(2 * math.pi * d / 7)))
        return [(base + dt.timedelta(days=d, minutes=m), 1.0) for m in range(n)]

    b1 = [e for d in range(20) for e in day_events(d)]
    spark.createDataFrame(b1, schema).write.parquet(src)

    def run():
        q = daily_stats_ingest(
            spark,
            source_path=src,
            source_schema=schema,
            store_path=str(tmp_path / "store"),
            checkpoint=str(tmp_path / "ck"),
        )
        q.awaitTermination(120)

    run()
    # second batch splits day 19 and extends the series
    b2 = [e for d in range(19, 28) for e in day_events(d + 100)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    run()

    full = spark.createDataFrame(b1 + b2, schema)
    daily = full.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    want = [
        r.asDict()
        for r in periodogram_daily(daily, day_col="day", value_col="y")
        .orderBy("period")
        .collect()
    ]
    got = [
        r.asDict()
        for r in periodogram_over(spark, str(tmp_path / "store"))
        .orderBy("period")
        .collect()
    ]
    assert got == want
    assert next(r for r in got if r["dominant"])["period"] == 7


def test_p_chart_flags_only_the_broken_day(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.timeseries import p_chart

    base = dt.datetime(2024, 5, 1)
    rows = []
    for d in range(12):
        # steady process: 5% error rate on 400 events/day
        for i in range(400):
            rows.append(
                (base + dt.timedelta(days=d, seconds=i), i % 20 == 0)
            )
    # the incident day: 25% errors
    for i in range(400):
        rows.append(
            (base + dt.timedelta(days=12, seconds=i), i % 4 == 0)
        )
    df = spark.createDataFrame(rows, "ts timestamp, is_err boolean")
    out = p_chart(df, flag_expr=F.col("is_err")).collect()
    flagged = [r["day"] for r in out if r["out_of_control"]]
    assert flagged == ["2024-05-13"]
    steady = [r for r in out if r["day"] != "2024-05-13"]
    assert all(r["lcl"] <= r["p"] <= r["ucl"] for r in steady)
    # limits widen as volume shrinks: halve a day's volume and its
    # band must widen
    r0 = out[0]
    assert r0["ucl"] - r0["lcl"] > 0


def test_holt_winters_backtest_matches_python_replica(spark):
    import datetime
    import math

    from vectordb_migrator_spark.operators.timeseries import (
        holt_winters_backtest,
    )

    # planted series consistent with the model: level 100, trend 2/day,
    # weekly seasonal pattern summing to zero, 8 weeks long
    seas = [5.0, -3.0, 2.0, -1.0, 4.0, -6.0, -1.0]
    t0 = datetime.date(2026, 1, 5)
    ys = [100.0 + 2.0 * t + seas[t % 7] for t in range(56)]
    rows = [
        ("a", t0 + datetime.timedelta(days=t), ys[t]) for t in range(56)
    ] + [("short", t0, 1.0)]  # < 21 days -> dropped
    daily = spark.createDataFrame(rows, "event_type string, day date, v double")
    got = holt_winters_backtest(daily, group_cols=["event_type"]).collect()
    assert [r["event_type"] for r in got] == ["a"]
    r = got[0]
    assert r["n_days"] == 56

    # pure-Python replica of the exact recursion
    l = sum(ys[:7]) / 7.0
    b = (sum(ys[7:14]) / 7.0 - sum(ys[:7]) / 7.0) / 7.0
    s = [y - sum(ys[:7]) / 7.0 for y in ys[:7]]
    sae = sse = 0.0
    n = len(ys)
    for t in range(8, n + 1):
        y = ys[t - 1]
        s1 = s[0]
        f = l + b + s1
        l2 = 0.5 * (y - s1) + 0.5 * (l + b)
        b2 = 0.25 * (l2 - l) + 0.75 * b
        s = s[1:] + [0.25 * (y - l2) + 0.75 * s1]
        if t > n - 7:
            sae += abs(f - y)
            sse += (f - y) * (f - y)
        l, b = l2, b2
    assert abs(r["mae"] - round(sae / 7.0, 6)) < 1e-9
    assert abs(r["rmse"] - round(math.sqrt(sse / 7.0), 6)) < 1e-9
    assert abs(r["level"] - round(l, 6)) < 1e-9
    assert abs(r["trend"] - round(b, 6)) < 1e-9

    # the model family fits the generator: trend heading toward the
    # planted 2/day (beta=1/4 adapts slowly from the trend-biased
    # seasonal init), final-week error below the seasonal amplitude
    assert 1.0 < r["trend"] < 3.0
    assert r["mae"] < 4.0


def test_cusum_changepoint_matches_python_replica(spark):
    import datetime
    import math

    from vectordb_migrator_spark.operators.timeseries import (
        cusum_changepoint,
    )

    d0 = datetime.date(2024, 1, 1)
    rows = []
    # "shift": stable baseline, then a +3-ish persistent level shift
    vals_shift = [10.0 + ((i * 7) % 5) * 0.5 for i in range(14)] + [
        13.0 + ((i * 3) % 4) * 0.5 for i in range(16)
    ]
    # "stable": same generator throughout (no alarm expected)
    vals_stable = [10.0 + ((i * 7) % 5) * 0.5 for i in range(30)]
    # "flat": zero-variance baseline -> NULL metrics
    vals_flat = [5.0] * 20
    for g, vs in (("shift", vals_shift), ("stable", vals_stable),
                  ("flat", vals_flat)):
        for i, v in enumerate(vs):
            rows.append((g, d0 + datetime.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "g string, day date, v double")
    got = {
        r["g"]: r
        for r in cusum_changepoint(
            df, "v", time_col="day", group_cols=["g"], baseline=14
        ).collect()
    }

    def replica(vs):
        mu = 0.0
        for y in vs[:14]:
            mu += round(y, 6)
        mu /= 14.0
        var = 0.0
        for y in vs[:14]:
            var += (round(y, 6) - mu) * (round(y, 6) - mu)
        sd = math.sqrt(var / 14.0)
        sp = sn = mp = mn = 0.0
        alarm = 0
        for t in range(15, len(vs) + 1):
            z = (round(vs[t - 1], 6) - mu) / sd
            sp = max(0.0, sp + z - 0.5)
            sn = max(0.0, sn - z - 0.5)
            mp, mn = max(mp, sp), max(mn, sn)
            if alarm == 0 and (sp > 4.0 or sn > 4.0):
                alarm = t
        return (len(vs), round(mu, 6), round(sd, 6), round(mp, 6),
                round(mn, 6), alarm if alarm else None, alarm > 0)

    for g, vs in (("shift", vals_shift), ("stable", vals_stable)):
        r = got[g]
        assert (
            r["n_days"], r["baseline_mean"], r["baseline_sd"],
            r["max_cusum_pos"], r["max_cusum_neg"], r["alarm_day"],
            r["alarmed"],
        ) == replica(vs)
    assert got["shift"]["alarmed"] is True
    assert got["stable"]["alarmed"] is False
    flat = got["flat"]
    assert flat["baseline_sd"] is None and flat["alarmed"] is None
    assert flat["max_cusum_pos"] is None and flat["alarm_day"] is None
