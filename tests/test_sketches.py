"""X7 sketch tests — accuracy and mergeability of the HLL rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vectordb_migrator_spark.suite import QUERIES


def test_hll_daily_merge_accuracy_and_mergeability(spark):
    """The union-merged daily sketches estimate the period's exact
    distinct-user count within HLL error (lgK=12 default → ~2% rsd;
    assert 5%), and event totals are exact."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = ev.select("user_id").distinct().count()
    n_events = ev.count()
    n_days = ev.select(F.to_date("ts")).distinct().count()

    row = QUERIES["x7_hll_daily_merge"](spark, SF_DIR).first()
    assert row["n_days"] == n_days
    assert row["n_events"] == n_events
    assert abs(row["distinct_users_est"] - exact) <= max(2, 0.05 * exact)

    # mergeability: the union of per-day sketches equals (same estimate
    # as) one global sketch over the raw data — the invariant that lets
    # a metrics store pre-aggregate once and roll up forever
    global_est = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .first()["e"]
    )
    assert row["distinct_users_est"] == int(global_est)


def test_cms_estimate_one_sided_and_merge_invariant(spark):
    """Round-6: CMS estimates are >= exact always; a sketch merged
    from two halves (cell-wise sum) answers exactly like a monolithic
    build — the mergeability the streaming store relies on."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(f"k{i % 7}",) for i in range(200)] + [("hot",)] * 50
    df = spark.createDataFrame(rows, ["k"])
    cells = cms_build(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {r["k"]: r["est"] for r in
           cms_estimate(cells, keys, "k", depth=4, width=64).collect()}
    exact = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
    assert est["hot"] >= 50

    half1 = spark.createDataFrame(rows[:100], ["k"])
    half2 = spark.createDataFrame(rows[100:], ["k"])
    merged = (
        cms_build(half1, "k", depth=4, width=64)
        .unionAll(cms_build(half2, "k", depth=4, width=64))
        .groupBy("d", "w")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    est2 = {r["k"]: r["est"] for r in
            cms_estimate(merged, keys, "k", depth=4, width=64).collect()}
    assert est2 == est


def test_log_histogram_nonpositive_policy(spark):
    """r6 bench-killer class: sf0.1 contains zero-valued events, and a
    histogram that aborts the job on them is itself a scale bug. The
    default policy drops non-positive values scan-side; 'error' keeps
    the old fail-fast contract; anything else is rejected up front."""
    import pytest
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.sketches import log_histogram

    df = spark.createDataFrame(
        [("a", 0.0), ("a", -3.0), ("a", 10.0), ("b", 100.0)], ["g", "val"]
    )
    # default 'drop': only the two positive rows survive
    hist = log_histogram(df, "val", base=2.0).collect()
    assert sum(r["n"] for r in hist) == 2
    grouped = log_histogram(df, "val", base=2.0, group_cols=["g"]).collect()
    assert {(r["g"], r["n"]) for r in grouped} == {("a", 1), ("b", 1)}
    # 'error': the old raise-at-read contract
    with pytest.raises(Exception, match="value <= 0"):
        log_histogram(df, "val", base=2.0, nonpositive="error").collect()
    # positive-only input is identical under both policies
    pos = df.filter(F.col("val") > 0)
    a = {(r["bucket"], r["n"]) for r in log_histogram(pos, "val", base=2.0).collect()}
    b = {(r["bucket"], r["n"])
         for r in log_histogram(pos, "val", base=2.0, nonpositive="error").collect()}
    assert a == b
    with pytest.raises(ValueError, match="nonpositive"):
        log_histogram(df, "val", nonpositive="ignore")


def test_log_histogram_quantiles_error_bound(spark):
    """Quantile estimates off the log-bucket histogram are >= the true
    quantile and within the geometric error bound (factor base)."""
    import numpy as np

    from vectordb_migrator_spark.operators.sketches import (
        histogram_quantiles,
        log_histogram,
    )

    vals = [float(v) for v in np.random.default_rng(5).integers(1, 5000, 800)]
    df = spark.createDataFrame([(v,) for v in vals], ["val"])
    base = 1.05
    hist = log_histogram(df, "val", base=base).localCheckpoint(eager=True)
    out = {r["q"]: r["est"] for r in
           histogram_quantiles(hist, [0.5, 0.9, 0.99], base=base).collect()}
    svals = sorted(vals)
    for q, est in out.items():
        true = svals[min(len(svals) - 1, int(np.ceil(q * len(svals))) - 1)]
        assert est >= true * (1 - 1e-9), (q, est, true)
        assert est <= true * base * (1 + 1e-9), (q, est, true)


def test_cms_and_histogram_streaming_stores(spark, tmp_path):
    """Round-6 X7×X8: both stores accumulate per-batch partials and
    answer identically to a batch build over the full data; replays
    append nothing."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from vectordb_migrator_spark.streaming.incremental import (
        cms_ingest,
        cms_estimate_over,
        histogram_ingest,
        quantiles_over,
    )

    src = str(tmp_path / "in")
    schema = "k string, val double"
    b1 = [(f"k{i % 5}", float(1 + i)) for i in range(40)]
    spark.createDataFrame(b1, schema).write.parquet(src)

    def run():
        q1 = cms_ingest(
            spark, source_path=src, source_schema=schema,
            cells_path=str(tmp_path / "cells"),
            checkpoint=str(tmp_path / "ck1"), key_col="k",
            depth=4, width=64,
        )
        q1.awaitTermination(120)
        q2 = histogram_ingest(
            spark, source_path=src, source_schema=schema,
            hist_path=str(tmp_path / "hist"),
            checkpoint=str(tmp_path / "ck2"), value_col="val",
        )
        q2.awaitTermination(120)

    run()
    b2 = [("k0", 100.0), ("knew", 7.0)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    run()

    full = spark.createDataFrame(b1 + b2, schema)
    keys = full.select("k").distinct()
    streamed = {r["k"]: r["est"] for r in cms_estimate_over(
        spark, str(tmp_path / "cells"), keys, "k", depth=4, width=64
    ).collect()}
    direct = {r["k"]: r["est"] for r in cms_estimate(
        cms_build(full, "k", depth=4, width=64), keys, "k",
        depth=4, width=64,
    ).collect()}
    assert streamed == direct

    sq = {r["q"]: r["est"] for r in
          quantiles_over(spark, str(tmp_path / "hist"), [0.5, 0.9]).collect()}
    assert set(sq) == {0.5, 0.9} and sq[0.9] >= sq[0.5]

    # replay idempotence: nothing new -> nothing appended
    n_cells = spark.read.parquet(str(tmp_path / "cells")).count()
    n_hist = spark.read.parquet(str(tmp_path / "hist")).count()
    run()
    assert spark.read.parquet(str(tmp_path / "cells")).count() == n_cells
    assert spark.read.parquet(str(tmp_path / "hist")).count() == n_hist


def test_bloom_no_false_negatives_and_replica(spark):
    """Round-6: every inserted key tests positive (the Bloom
    guarantee); the distributed mask equals an independent Python
    replica of the md5 position math; false-positive rate on fresh
    keys stays near the analytic estimate."""
    import hashlib

    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.sketches import (
        bloom_build,
        bloom_mask_frame,
        bloom_might_contain,
    )

    n_bits, k = 4096, 4
    keys = [f"key-{i}" for i in range(300)]
    df = spark.createDataFrame([(s,) for s in keys], ["s"])
    mask = bloom_build(df, "s", n_bits=n_bits, k=k)

    def replica():
        m = [0] * (n_bits // 64)
        for s in keys:
            for i in range(k):
                h = int(
                    hashlib.md5(f"bloom:{i}:{s}".encode()).hexdigest()[:15], 16
                )
                pos = h % n_bits
                w, b = divmod(pos, 64)
                bit = (1 << b) if b < 63 else -(1 << 63)
                # python ints: emulate signed-64 OR by masking
                m[w] = ((m[w] | bit) + (1 << 64)) % (1 << 64)
        return [v - (1 << 64) if v >= (1 << 63) else v for v in m]

    assert mask == replica()

    mf = bloom_mask_frame(spark, mask)
    probe = spark.createDataFrame(
        [(s,) for s in keys] + [(f"fresh-{i}",) for i in range(300)], ["s"]
    )
    got = {
        r["s"]: r["hit"]
        for r in probe.crossJoin(F.broadcast(mf))
        .select(
            "s",
            bloom_might_contain(
                F.col("s"), F.col("__bloom"), n_bits=n_bits, k=k
            ).alias("hit"),
        )
        .collect()
    }
    assert all(got[s] for s in keys)  # no false negatives, ever
    fp = sum(got[f"fresh-{i}"] for i in range(300)) / 300
    assert fp <= 0.10  # ~2.5% analytic at 300 keys / 4096 bits / k=4


def test_kmv_distinct_exact_small_and_bounded_error_large(spark):
    """KMV: groups under k distinct keys report the exact count;
    large groups estimate within a few sigma (1/sqrt(k-2)); the
    two-level salted reduce equals a direct k-th-smallest
    computation."""
    import hashlib

    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.sketches import kmv_distinct

    rows = [("small", f"u{i}") for i in range(20)]
    rows += [("big", f"v{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, k string")
    out = {r["g"]: r for r in
           kmv_distinct(df, "k", group_cols=["g"], k=64).collect()}
    assert out["small"]["n_kmin"] == 20 and out["small"]["est"] == 20.0
    est = out["big"]["est"]
    assert abs(est - 5000) / 5000 < 0.5  # well within a few sigma of 12.7%

    # replica: k-th smallest of the md5 hash set
    hs = sorted(
        int(hashlib.md5(f"v{i}".encode()).hexdigest()[:15], 16)
        for i in range(5000)
    )
    want = round(63.0 * float(1 << 60) / hs[63], 6)
    assert est == want


def test_weighted_quantiles_threshold_semantics(spark):
    """Weighted median is the smallest value whose cumulative weight
    share reaches q; heavy weights pull the quantile; non-positive
    weights drop; empty qs fails loudly."""
    import pytest

    from vectordb_migrator_spark.operators.sketches import (
        weighted_quantiles,
    )

    rows = [
        ("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 8.0),
        ("g", 4.0, 0.0),   # zero weight: ignored
        ("h", 10.0, 1.0), ("h", 20.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = {
        (r["g"], r["q"]): r["value"]
        for r in weighted_quantiles(
            df, "v", "w", [0.5, 0.9], group_cols=["g"]
        ).collect()
    }
    # g: total 10; cum(1)=1 < 5, cum(2)=2 < 5, cum(3)=10 >= 5 -> 3.0
    assert got[("g", 0.5)] == 3.0 and got[("g", 0.9)] == 3.0
    # h: cum(10)=1 >= 0.5*2 -> 10; 0.9*2=1.8 -> 20
    assert got[("h", 0.5)] == 10.0 and got[("h", 0.9)] == 20.0

    with pytest.raises(ValueError, match="qs"):
        weighted_quantiles(df, "v", "w", [])


def test_hll_md5_overlap_accuracy_and_merge(spark):
    """Deterministic md5-HLL: estimates land within HLL's expected
    m=256 error band (~10%) of the exact distincts; the union merge
    equals the sketch of the concatenated audience (mergeability);
    inclusion-exclusion recovers a planted half-overlap."""
    from vectordb_migrator_spark.operators.sketches import (
        hll_md5_overlap_report,
    )

    rows = (
        [(i, "a") for i in range(1000)]            # A = 0..999
        + [(i + 500, "b") for i in range(1000)]    # B = 500..1499
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = hll_md5_overlap_report(
        df, "user_id", group_col="event_type"
    ).first()
    assert (r["exact_a"], r["exact_b"], r["exact_overlap"]) == (
        1000, 1000, 500,
    )
    assert abs(r["est_a"] - 1000) / 1000 < 0.15
    assert abs(r["est_union"] - 1500) / 1500 < 0.15
    assert abs(r["est_overlap"] - 500) < 0.35 * 1500  # IE compounding
    # mergeability: union estimate == single-group sketch of A∪B
    both = spark.createDataFrame(
        [(i, "u") for i in range(1500)], "user_id long, event_type string"
    )
    # build a two-group frame whose union IS 0..1499
    r2 = hll_md5_overlap_report(
        df, "user_id", group_col="event_type"
    ).first()
    from vectordb_migrator_spark.operators.sketches import (
        _hll_md5_estimate_agg,
        _hll_md5_rho,
    )
    from pyspark.sql import functions as F

    h = F.md5(F.col("user_id").cast("string"))
    regs = (
        both.select(
            F.col("event_type").alias("g"),
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("reg"),
            _hll_md5_rho(h).alias("rho"),
        )
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("m"))
    )
    single = _hll_md5_estimate_agg(["g"])(regs).first()["est"]
    assert abs(round(single, 6) - r2["est_union"]) < 1e-9


def test_hll_md5_distinct_report_accuracy_and_merge(spark):
    """r12: the per-group md5-HLL distinct estimate lands within the
    m=256 error band (~6.5% standard error; assert 3 sigma) for
    groups spanning the linear-counting and raw-estimator branches,
    and is identical however the input is partitioned (the register
    MAX is order-free)."""
    from vectordb_migrator_spark.operators.sketches import (
        hll_md5_distinct_report,
    )

    rows = []
    for g, n_users in (("a", 40), ("b", 300), ("c", 1500)):
        rows += [
            (g, f"{g}-u{i % n_users}", i) for i in range(n_users * 2)
        ]
    df = spark.createDataFrame(rows, "event_type string, user_id string, x long")
    out = {r["event_type"]: r for r in
           hll_md5_distinct_report(df, "user_id", group_col="event_type").collect()}
    for g, n_users in (("a", 40), ("b", 300), ("c", 1500)):
        r = out[g]
        assert r["exact"] == n_users and r["n_events"] == 2 * n_users
        assert abs(r["est"] - n_users) <= 0.2 * n_users + 3, (g, r["est"])
    got1 = sorted(tuple(r) for r in
                  hll_md5_distinct_report(df.repartition(13), "user_id",
                                          group_col="event_type").collect())
    got2 = sorted(tuple(r) for r in
                  hll_md5_distinct_report(df.coalesce(1), "user_id",
                                          group_col="event_type").collect())
    assert got1 == got2
