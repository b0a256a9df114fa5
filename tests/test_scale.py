"""Skew/co-location toolkit tests: salted join equivalence, bucketed
exchange-free joins."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.scale import salted_join, write_bucketed


@contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with 500 rows
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 20)],
        ["k", "payload"],
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(1, 20)], ["k", "tag"]
    )
    plain = {
        (r["k"], r["payload"], r["tag"])
        for r in left.join(right, "k").collect()
    }
    salted = {
        (r["k"], r["payload"], r["tag"])
        for r in salted_join(left, right, "k", salt=8).collect()
    }
    assert salted == plain
    assert len(salted) == 500 + 18


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (99, "no-match")], ["k", "v"])
    right = spark.createDataFrame([(1, "r1")], ["k", "tag"])
    rows = {
        (r["k"], r["tag"])
        for r in salted_join(left, right, "k", salt=4, how="left").collect()
    }
    assert rows == {(1, "r1"), (99, None)}


def test_bucketed_join_is_exchange_free(spark):
    """Two tables bucketed by the same key + count: the join plan has
    no Exchange (the shuffle was paid once at write time)."""
    a = spark.createDataFrame([(i, i * 10) for i in range(1000)], ["k", "va"])
    b = spark.createDataFrame([(i, i * 100) for i in range(1000)], ["k", "vb"])
    write_bucketed(a, "bkt_a", bucket_cols="k", num_buckets=8)
    write_bucketed(b, "bkt_b", bucket_cols="k", num_buckets=8)
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 1000


def test_write_partitioned_prunes_on_read(spark, tmp_path, documents):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning) — NOT a data filter over all files."""
    from vectordb_migrator_spark.functions.text import lang_id
    from vectordb_migrator_spark.operators.scale import write_partitioned

    out = str(tmp_path / "by_lang")
    tagged = documents.withColumn("lang", lang_id("text"))
    write_partitioned(tagged, out, partition_cols="lang")

    back = spark.read.parquet(out).filter("lang = 'en'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    # the pruned read returns exactly the 'en' docs
    n_en = tagged.filter("lang = 'en'").count()
    assert back.count() == n_en > 0

    import os

    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert "lang=en" in dirs and len(dirs) >= 2


def test_fan_out_repartitions_packed_small_files(spark, tmp_path):
    """Many tiny files pack into 1-2 scan partitions
    (openCostInBytes/maxPartitionBytes) — a file COUNT above target
    must not short-circuit the width check; the physical probe still
    catches the packed scan and repartitions."""
    from vectordb_migrator_spark.operators.util import fan_out

    path = str(tmp_path / "tiny")
    spark.range(40).repartition(40).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= 8  # many tiny files...
    assert df.rdd.getNumPartitions() < 8  # ...packed into few splits
    out = fan_out(df, min_partitions=8)
    assert out.rdd.getNumPartitions() == 8


def test_fan_out_few_files_repartitions_without_physical_probe(spark, tmp_path):
    """The cheap common case: file count below target repartitions
    immediately (no second physical planning pass needed)."""
    from vectordb_migrator_spark.operators.util import fan_out

    path = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(path)
    out = fan_out(spark.read.parquet(path), min_partitions=4)
    assert out.rdd.getNumPartitions() == 4


def test_zorder_value_interleaves_bits(spark):
    """Morton key: bit i of column j lands at position i*n + j."""
    from vectordb_migrator_spark.operators.scale import zorder_value

    df = spark.createDataFrame([(5, 3)], "a long, b long")  # 101, 011
    z = df.select(zorder_value(["a", "b"], bits=3).alias("z")).first()["z"]
    # a bits (LSB first) 1,0,1 at positions 0,2,4 ; b bits 1,1,0 at 1,3,5
    assert z == (1 << 0) + (1 << 1) + (1 << 3) + (1 << 4)


def test_zorder_write_narrows_per_file_extents(spark, tmp_path):
    """Z-clustered files cover small hyper-rectangles: the mean
    per-file (max-min) extent of BOTH columns is far below an
    interleaving-hostile single-column sort layout, which preserves
    only its leading column's locality."""
    import pyarrow.parquet as pq
    import os

    from vectordb_migrator_spark.operators.scale import zorder_write

    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 256).alias("x"),
        (F.col("id") * 40503 % 256).alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(df, zpath, ["x", "y"], bits=8, num_files=16)
    # baseline: sort by x only — y locality destroyed
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def mean_extent(path, col):
        exts = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(f"{path}/{f}").metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(
                    [c.path_in_schema for c in
                     [md.row_group(rg).column(i) for i in range(md.row_group(rg).num_columns)]
                     ].index(col)
                ).statistics
                exts.append(st.max - st.min)
        return sum(exts) / len(exts)

    # x: both layouts cluster it; y: only the z-order does
    assert mean_extent(zpath, "y") < 0.55 * mean_extent(spath, "y")
    assert mean_extent(zpath, "x") < 256 * 0.6
    # round-trip: same multiset of rows
    assert (
        spark.read.parquet(zpath).groupBy("x", "y").count().orderBy("x", "y").collect()
        == df.groupBy("x", "y").count().orderBy("x", "y").collect()
    )


def test_export_shards_layout_and_manifest(spark, tmp_path):
    """export_shards writes shard-partitioned parquet with a manifest;
    the layout is reproducible (same seed -> identical assignment), a
    different seed reshuffles, and shard reads prune to one directory."""
    from vectordb_migrator_spark.operators.scale import (
        deterministic_shuffle,
        export_shards,
    )
    import pyspark.sql.functions as F

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("long").alias("n_tok"),
    )
    path = str(tmp_path / "shards")
    manifest = {
        r["shard"]: r for r in export_shards(
            df, path, id_col="doc_id", n_shards=4, seed=0
        ).collect()
    }
    assert set(manifest) == {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in manifest.values()) == 200
    assert all("n_tok" in r.asDict() for r in manifest.values())
    back = spark.read.parquet(path)
    assert back.count() == 200
    # directory pruning: one shard reads only its own rows
    one = back.filter(F.col("shard") == 2)
    assert one.count() == manifest[2]["n_rows"]
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan

    a = deterministic_shuffle(df, id_col="doc_id", n_shards=4, seed=0)
    b = deterministic_shuffle(df, id_col="doc_id", n_shards=4, seed=0)
    c = deterministic_shuffle(df, id_col="doc_id", n_shards=4, seed=1)
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
    assert key(a.collect()) == key(b.collect())  # reproducible
    assert key(a.collect()) != key(c.collect())  # seed reshuffles
    # the persisted manifest mirrors the returned one
    stored = {r["shard"]: r["n_rows"]
              for r in spark.read.parquet(path + "__manifest").collect()}
    assert stored == {k: r["n_rows"] for k, r in manifest.items()}


def test_key_skew_stats_recommends_salt_only_for_skew(spark):
    from vectordb_migrator_spark.operators.scale import key_skew_stats

    # hot: one key holds 400 of 499 rows; flat: every key holds 5
    hot = spark.createDataFrame(
        [(i, 0 if i < 400 else i) for i in range(499)], "row long, k long"
    )
    flat = spark.createDataFrame(
        [(i, i % 50) for i in range(250)], "row long, k long"
    )
    out = {
        r["key_col"]: r
        for r in key_skew_stats(
            [("hot", hot, "k"), ("flat", flat, "k")]
        ).collect()
    }
    assert out["flat"]["salt"] == 1 and out["flat"]["skew_ratio"] == 1.0
    h = out["hot"]
    assert h["max_n"] == 400 and h["ndv"] == 100
    assert h["skew_ratio"] > 4.0 and 1 < h["salt"] <= 64
    # clamp honors max_salt
    clamped = key_skew_stats([("hot", hot, "k")], max_salt=8).collect()[0]
    assert clamped["salt"] == 8


def test_key_skew_stats_empty_frames_rejected(spark):
    """ADVICE r6: an empty frame list must fail with a clear message,
    not an AttributeError on the None union accumulator."""
    import pytest

    from vectordb_migrator_spark.operators.scale import key_skew_stats

    with pytest.raises(ValueError, match="frames"):
        key_skew_stats([])


def test_rendezvous_assign_reshard_stability(spark):
    """HRW property: every row that moves when growing 5 -> 6 shards
    moves TO the new shard, survivors never reshuffle, and the moved
    fraction is near 1/6; assignments are deterministic."""
    from vectordb_migrator_spark.operators.scale import rendezvous_assign

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    a = rendezvous_assign(df, n_shards=5, out_col="s5")
    a = rendezvous_assign(a, n_shards=6, out_col="s6").collect()
    assert all(0 <= r["s5"] <= 4 and 0 <= r["s6"] <= 5 for r in a)
    moved = [r for r in a if r["s5"] != r["s6"]]
    assert all(r["s6"] == 5 for r in moved)  # movers go TO the new shard
    frac = len(moved) / len(a)
    assert 0.10 < frac < 0.24  # expected 1/6 ≈ 0.167

    b = {r["doc_id"]: r["s5"]
         for r in rendezvous_assign(df, n_shards=5, out_col="s5").collect()}
    assert all(b[r["doc_id"]] == r["s5"] for r in a)  # deterministic


def test_jackknife_ci_matches_numpy(spark):
    """Delete-one-bucket jackknife: the distributed closed-form result
    matches a NumPy replay of the same md5 bucketing, a group whose
    units all hash to one bucket reports NULL se, and buckets<2 fails
    loudly."""
    import hashlib
    import math

    import numpy as np
    import pytest

    from vectordb_migrator_spark.operators.scale import jackknife_ci

    rows = [(f"g{ i % 2}", i % 37, float((i * 7) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, uid long, v double")

    B, seed = 8, 7
    got = {
        r["g"]: r
        for r in jackknife_ci(
            df, "v", unit_col="uid", buckets=B, group_cols=["g"], seed=seed
        ).collect()
    }

    def bucket(uid):
        return int(hashlib.md5(f"{uid}:{seed}".encode()).hexdigest()[:8], 16) % B

    for g in ("g0", "g1"):
        sub = [(bucket(u), v) for gg, u, v in rows if gg == g]
        S = sum(v for _, v in sub)
        N = len(sub)
        bs = {}
        for b, v in sub:
            s, n = bs.get(b, (0.0, 0))
            bs[b] = (s + v, n + 1)
        loo = [(S - s) / (N - n) for s, n in bs.values()]
        nb = len(loo)
        mbar = float(np.mean(loo))
        se = math.sqrt((nb - 1) / nb * sum((m - mbar) ** 2 for m in loo))
        r = got[g]
        assert r["n"] == N and r["n_buckets"] == nb
        assert abs(r["mean"] - S / N) < 1e-6
        assert abs(r["se"] - se) < 1e-6
        assert abs(r["ci_lo"] - (round(S / N, 6) - 1.96 * se)) < 1e-5
        assert abs(r["ci_hi"] - (round(S / N, 6) + 1.96 * se)) < 1e-5

    # one unit only -> single bucket -> no leave-one-out estimate
    one = spark.createDataFrame([(1, 2.0), (1, 4.0)], "uid long, v double")
    r = jackknife_ci(one, "v", unit_col="uid", buckets=4).first()
    assert r["n_buckets"] == 1 and r["se"] is None

    with pytest.raises(ValueError, match="buckets"):
        jackknife_ci(df, "v", unit_col="uid", buckets=1)


def test_zonemap_prune_report_layout_contrast(spark):
    """Clustering by the predicate column prunes almost all chunks;
    an uncorrelated layout prunes ~none; matching-row counts are
    layout-invariant; empty layouts fail loudly."""
    import pytest

    from vectordb_migrator_spark.operators.scale import zonemap_prune_report

    import random

    n = 1024
    perm = list(range(n))
    random.Random(0).shuffle(perm)
    rows = [(i, float(i), float(perm[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, sorted_v double, perm_v double")

    rep = {
        r["layout"]: r
        for r in zonemap_prune_report(
            df,
            value_col="sorted_v",
            lo=100.0,
            hi=163.0,  # 64 matching rows = 1 of 16 chunks
            layouts=[("by_value", "sorted_v"), ("by_perm", "perm_v")],
            tiebreak_col="id",
            n_chunks=16,
        ).collect()
    }
    bv, bp = rep["by_value"], rep["by_perm"]
    assert bv["n_chunks"] == bp["n_chunks"] == 16
    assert bv["rows_matching"] == bp["rows_matching"] == 64
    assert bv["chunks_hit"] <= 2 and bv["prune_rate"] >= 0.875
    assert bp["chunks_hit"] >= 14 and bp["prune_rate"] <= 0.125
    assert bv["scan_efficiency"] > bp["scan_efficiency"]

    with pytest.raises(ValueError, match="layouts"):
        zonemap_prune_report(
            df, value_col="sorted_v", lo=0, hi=1, layouts=[],
            tiebreak_col="id",
        )


def test_cuped_adjust_matches_numpy(spark):
    """CUPED statistics match a NumPy replay on correlated data
    (population moments), and a zero-variance covariate reports NULL
    theta instead of dividing by zero."""
    import numpy as np

    from vectordb_migrator_spark.operators.scale import cuped_adjust

    rng = np.random.default_rng(42)
    x = np.round(rng.normal(50, 10, 400), 6)
    y = np.round(0.8 * x + rng.normal(0, 5, 400), 6)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "pre double, post double"
    )
    r = cuped_adjust(df, metric_col="post", covariate_col="pre").first()

    varx, vary = x.var(), y.var()  # population (ddof=0)
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    rho2 = cov**2 / (varx * vary)
    assert r["n"] == 400
    assert abs(r["mean"] - y.mean()) < 1e-5
    assert abs(r["theta"] - cov / varx) < 1e-5
    assert abs(r["var"] - vary) < 1e-4
    assert abs(r["var_reduction"] - rho2) < 1e-5
    assert abs(r["var_adjusted"] - vary * (1 - rho2)) < 1e-4
    assert r["se_cuped"] < r["se_naive"]

    flat = spark.createDataFrame(
        [(1.0, float(v)) for v in range(10)], "pre double, post double"
    )
    r2 = cuped_adjust(flat, metric_col="post", covariate_col="pre").first()
    assert r2["theta"] is None and r2["var_reduction"] is None


def test_join_cardinality_fanout_and_explosion(spark):
    """Exact join sizing: 1:1, fan-out, and many-to-many relations
    report the true output size (verified against the actual join),
    the hot key's share, and zero rows for disjoint keys."""
    import pytest

    from vectordb_migrator_spark.operators.scale import join_cardinality

    left = spark.createDataFrame(
        [(k, i) for k in (1, 1, 1, 2, 3) for i in range(2)][:8],
        "k long, i long",
    )
    right = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (9, 13)], "k long, j long"
    )
    rep = {
        r["relation"]: r
        for r in join_cardinality(
            [
                ("m2m", left, "k", right, "k"),
                ("disjoint", left, "i", right, "j"),
            ]
        ).collect()
    }
    m = rep["m2m"]
    truth = left.join(right, "k").count()
    assert m["join_rows"] == truth
    assert m["left_rows"] == 8 and m["right_rows"] == 4
    assert m["max_key_rows"] == 12  # hottest key 1: 6 left x 2 right
    assert abs(m["top_key_share"] - 12 / truth) < 1e-6
    d = rep["disjoint"]
    assert d["join_rows"] == 0 and d["matched_keys"] == 0
    assert d["top_key_share"] is None

    with pytest.raises(ValueError, match="relations"):
        join_cardinality([])


def test_mann_whitney_matches_scipy_formula(spark):
    """U and the tie-corrected z match a direct pairwise computation
    (including ties); identical distributions sit near z=0; a clean
    shift is significant; one-sided-only groups report NULL z."""
    import math

    from vectordb_migrator_spark.operators.scale import mann_whitney

    a = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 9.0, 9.0]
    b = [2.0, 4.0, 6.0, 6.0, 7.0, 9.0, 11.0]
    rows = [("g", "a", v) for v in a] + [("g", "b", v) for v in b]
    rows += [("solo", "a", v) for v in (1.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, side string, v double")

    got = {
        r["g"]: r
        for r in mann_whitney(
            df, "v", side_col="side", side_a="a", group_cols=["g"]
        ).collect()
    }
    # direct pairwise U for side a
    u = sum(
        1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b
    )
    na, nb = len(a), len(b)
    nn = na + nb
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(a + b).values())
    var = na * nb / 12 * ((nn + 1) - ties / (nn * (nn - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    r = got["g"]
    assert r["n_a"] == na and r["n_b"] == nb
    assert abs(r["u"] - u) < 1e-9
    assert abs(r["z"] - z) < 1e-6
    assert got["solo"]["z"] is None

    shifted = spark.createDataFrame(
        [("s", "a", float(i)) for i in range(50)]
        + [("s", "b", float(i + 40)) for i in range(50)],
        "g string, side string, v double",
    )
    rs = mann_whitney(
        shifted, "v", side_col="side", side_a="a", group_cols=["g"]
    ).first()
    assert rs["significant"] and rs["z"] < -1.96


def test_ks_test_matches_scipy_formula(spark):
    """D matches a direct two-ECDF computation (with ties), identical
    samples give D=0, a clean shift rejects, and a one-sided group
    reports NULL D."""
    from vectordb_migrator_spark.operators.scale import ks_test

    a = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 9.0]
    b = [2.0, 4.0, 6.0, 6.0, 7.0, 9.0, 11.0, 12.0]
    rows = [("g", "a", v) for v in a] + [("g", "b", v) for v in b]
    rows += [("same", s, float(v)) for s in ("a", "b") for v in range(10)]
    rows += [("solo", "a", 1.0)]
    df = spark.createDataFrame(rows, "g string, side string, v double")

    got = {
        r["g"]: r
        for r in ks_test(
            df, "v", side_col="side", side_a="a", group_cols=["g"]
        ).collect()
    }
    pts = sorted(set(a + b))
    ecdf = lambda xs, t: sum(1 for x in xs if x <= t) / len(xs)  # noqa: E731
    d_true = max(abs(ecdf(a, t) - ecdf(b, t)) for t in pts)
    assert abs(got["g"]["d"] - d_true) < 1e-6
    assert got["same"]["d"] == 0.0 and not got["same"]["significant"]
    assert got["solo"]["d"] is None

    big = spark.createDataFrame(
        [("s", "a", float(i)) for i in range(200)]
        + [("s", "b", float(i + 150)) for i in range(200)],
        "g string, side string, v double",
    )
    rs = ks_test(big, "v", side_col="side", side_a="a", group_cols=["g"]).first()
    assert rs["significant"] and rs["d"] == 0.75


def test_corr_matrix_matches_numpy(spark):
    """All C(k,2) correlations from one scan match NumPy (population
    moments on 6dp-rounded values), NULLs delete pairwise, and a
    constant column reports NULL corr."""
    import numpy as np
    import pytest

    from vectordb_migrator_spark.operators.scale import corr_matrix

    rng = np.random.default_rng(7)
    x = np.round(rng.normal(0, 1, 300), 6)
    y = np.round(0.6 * x + rng.normal(0, 0.5, 300), 6)
    z = np.round(rng.normal(5, 2, 300), 6)
    rows = [
        (float(a), float(b), float(c), 1.0)
        for a, b, c in zip(x, y, z)
    ]
    rows.append((None, 1.0, 1.0, 1.0))  # pairwise-deleted for x pairs
    df = spark.createDataFrame(rows, "x double, y double, z double, k double")

    got = {
        (r["col_a"], r["col_b"]): r
        for r in corr_matrix(df, ["x", "y", "z", "k"]).collect()
    }
    assert len(got) == 6
    assert got[("x", "y")]["n"] == 300
    assert abs(got[("x", "y")]["corr"] - np.corrcoef(x, y)[0, 1]) < 1e-5
    assert abs(got[("x", "z")]["corr"] - np.corrcoef(x, z)[0, 1]) < 1e-5
    assert got[("y", "z")]["n"] == 301
    assert got[("x", "k")]["corr"] is None  # constant column

    with pytest.raises(ValueError, match="two columns"):
        corr_matrix(df, ["x"])


def test_auc_score_matches_sklearn_formula(spark):
    """AUC matches the direct pairwise probability (ties counted half),
    a perfect separator scores 1, a reversed one 0, and a one-class
    group reports NULL."""
    from vectordb_migrator_spark.operators.scale import auc_score

    scores = [(0.9, 1), (0.8, 1), (0.8, 0), (0.4, 1), (0.3, 0), (0.1, 0)]
    df = spark.createDataFrame(
        [("g", s, l) for s, l in scores] + [("solo", 0.5, 1)],
        "g string, score double, label int",
    )
    got = {r["g"]: r for r in auc_score(
        df, score_col="score", label_col="label", group_cols=["g"]
    ).collect()}
    pos = [s for s, l in scores if l == 1]
    neg = [s for s, l in scores if l == 0]
    direct = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert abs(got["g"]["auc"] - direct) < 1e-6  # output rounds to 6dp
    assert got["solo"]["auc"] is None

    perfect = spark.createDataFrame(
        [("p", float(i), 1 if i >= 5 else 0) for i in range(10)],
        "g string, score double, label int",
    )
    assert auc_score(
        perfect, score_col="score", label_col="label", group_cols=["g"]
    ).first()["auc"] == 1.0


def test_mann_whitney_single_row_group_reports_null_z(spark):
    """ANSI-mode regression (round-8 ADVICE): a group with exactly
    one row makes the tie-correction denominator n(n-1) zero; the
    promise is NULL z for degenerate groups, not a DIVIDE_BY_ZERO
    abort killing every other group's result."""
    from vectordb_migrator_spark.operators.scale import mann_whitney

    df = spark.createDataFrame(
        [("solo", "a", 1.0), ("both", "a", 1.0), ("both", "b", 2.0)],
        "g string, side string, v double",
    )
    rows = {
        r["g"]: r
        for r in mann_whitney(
            df, "v", side_col="side", side_a="a", group_cols=["g"]
        ).collect()
    }
    assert rows["solo"]["z"] is None
    assert rows["both"]["z"] is not None


def test_srm_check_flags_planted_imbalance(spark):
    """Chi-square matches the hand formula; a balanced group passes,
    a 60/40 split on 1000 units flags, and a variant missing from a
    group counts zero (the worst SRM there is)."""
    from vectordb_migrator_spark.operators.scale import srm_check

    rows = (
        [("bal", "a", i) for i in range(500)]
        + [("bal", "b", i) for i in range(500, 1000)]
        + [("skew", "a", i) for i in range(600)]
        + [("skew", "b", i) for i in range(600, 1000)]
        + [("solo", "a", i) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "g string, v string, u long")
    got = {
        r["g"]: r
        for r in srm_check(
            df,
            unit_col="u",
            variant_col="v",
            expected=[("a", 0.5), ("b", 0.5)],
            group_cols=["g"],
        ).collect()
    }
    assert got["bal"]["chi2"] == 0.0 and not got["bal"]["srm"]
    # chi2 = (600-500)^2/500 + (400-500)^2/500 = 40
    assert got["skew"]["chi2"] == 40.0 and got["skew"]["srm"]
    assert got["solo"]["n_b"] == 0 and got["solo"]["srm"]
    # duplicate unit rows must not double-count
    dup = df.unionAll(df)
    got2 = {
        r["g"]: r["n_total"]
        for r in srm_check(
            dup, unit_col="u", variant_col="v",
            expected=[("a", 0.5), ("b", 0.5)], group_cols=["g"],
        ).collect()
    }
    assert got2 == {g: got[g]["n_total"] for g in got}


def test_diff_in_diff_recovers_planted_effect(spark):
    """A planted +5 treatment effect on top of a +2 common time trend
    is recovered exactly; the SE matches the NumPy cellwise formula."""
    import numpy as np

    from vectordb_migrator_spark.operators.scale import diff_in_diff

    rng = np.random.default_rng(7)
    rows = []
    cells = {}
    for treat in (False, True):
        for post in (False, True):
            base = 10.0 + (2.0 if post else 0.0) + (1.0 if treat else 0.0)
            eff = 5.0 if treat and post else 0.0
            vals = np.round(base + eff + rng.normal(0, 1.0, 400), 4)
            cells[(treat, post)] = vals
            rows += [(bool(treat), bool(post), float(v)) for v in vals]
    df = spark.createDataFrame(rows, "t boolean, p boolean, y double")
    r = diff_in_diff(df, outcome_col="y", treat_col="t", post_col="p").head()
    did = (
        cells[(True, True)].mean() - cells[(True, False)].mean()
    ) - (cells[(False, True)].mean() - cells[(False, False)].mean())
    se = np.sqrt(sum(v.var(ddof=1) / len(v) for v in cells.values()))
    assert abs(r["did"] - round(did, 6)) < 2e-6
    assert abs(r["se"] - round(se, 6)) < 2e-6
    assert r["significant"]
    assert r["n_post_t"] == 400


# ---------------------------------------------------------------- SPRT


def test_sprt_trace_matches_python(spark):
    import math

    from vectordb_migrator_spark.operators.scale import sprt_trace

    # variant 'x': all successes -> crosses the H1 boundary fast at
    # p0=0.2 vs p1=0.8; variant 'y': all failures -> crosses H0
    rows = []
    for d in range(1, 7):
        for i in range(3):
            rows.append(("x", f"2024-01-0{d}", 1))
            rows.append(("y", f"2024-01-0{d}", 0))
    df = spark.createDataFrame(rows, "variant string, period string, s int")
    got = sprt_trace(
        df,
        period_col="period",
        variant_col="variant",
        success_col="s",
        p0=0.2,
        p1=0.8,
    ).collect()

    w1 = round(math.log(0.8 / 0.2), 12)
    w0 = round(math.log(0.2 / 0.8), 12)
    ub = round(math.log(0.95 / 0.05), 6)
    lb = round(math.log(0.05 / 0.95), 6)
    by_key = {(r["variant"], r["period"]): r for r in got}
    stopped_seen = {"x": False, "y": False}
    for d in range(1, 7):
        day = f"2024-01-0{d}"
        n = 3 * d
        rx = by_key[("x", day)]
        assert (rx["n"], rx["k"]) == (n, n)
        want_llr = round(n * w1, 6)
        assert abs(rx["llr"] - want_llr) < 1e-9
        want_dec = "accept_h1" if want_llr >= ub else "continue"
        assert rx["decision"] == want_dec
        stopped_seen["x"] = stopped_seen["x"] or want_dec != "continue"
        assert rx["stopped"] == stopped_seen["x"]

        ry = by_key[("y", day)]
        assert (ry["n"], ry["k"]) == (n, 0)
        want_llr = round(n * w0, 6)
        assert abs(ry["llr"] - want_llr) < 1e-9
        want_dec = "accept_h0" if want_llr <= lb else "continue"
        assert ry["decision"] == want_dec
        stopped_seen["y"] = stopped_seen["y"] or want_dec != "continue"
        assert ry["stopped"] == stopped_seen["y"]
    # both arms eventually decided, in opposite directions
    assert by_key[("x", "2024-01-06")]["decision"] == "accept_h1"
    assert by_key[("y", "2024-01-06")]["decision"] == "accept_h0"


def test_sprt_streaming_store_matches_batch(spark, tmp_path):
    """Round-8 X7×X8: sprt_ingest accumulates (variant, day, n, k)
    partials and sprt_over answers EXACTLY what the batch sprt_trace
    computes over the full trial stream (counts merge by summation);
    replays append nothing."""
    import datetime as dt

    from vectordb_migrator_spark.operators.scale import sprt_trace
    from vectordb_migrator_spark.streaming.incremental import (
        sprt_ingest,
        sprt_over,
    )

    src = str(tmp_path / "in")
    schema = "ts timestamp, user_id long, event_type string"
    base = dt.datetime(2024, 5, 1)
    b1 = [
        (
            base + dt.timedelta(days=d, hours=h),
            u,
            "purchase" if (u + d + h) % 4 == 0 else "view",
        )
        for d in range(6)
        for h in range(3)
        for u in range(8)
    ]
    spark.createDataFrame(b1, schema).write.parquet(src)

    kw = dict(
        source_path=src,
        source_schema=schema,
        store_path=str(tmp_path / "store"),
        checkpoint=str(tmp_path / "ck"),
        variant_expr="CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END",
        success_expr="event_type = 'purchase'",
    )

    def run():
        sprt_ingest(spark, **kw).awaitTermination(120)

    run()
    # second batch splits day 5 across batches and adds new days
    b2 = [
        (
            base + dt.timedelta(days=d, hours=h + 6),
            u,
            "purchase" if (u * d + h) % 3 == 0 else "click",
        )
        for d in range(5, 9)
        for h in range(2)
        for u in range(8)
    ]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    run()

    full = spark.createDataFrame(b1 + b2, schema).select(
        F.expr("CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END").alias(
            "variant"
        ),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "period"
        ),
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    )
    want = [
        r.asDict()
        for r in sprt_trace(
            full,
            period_col="period",
            variant_col="variant",
            success_col="s",
            p0=0.2,
            p1=0.3,
        ).collect()
    ]
    got = [
        r.asDict()
        for r in sprt_over(
            spark, str(tmp_path / "store"), p0=0.2, p1=0.3
        )
        .orderBy("variant", "period")
        .collect()
    ]
    assert got == want and len(got) >= 9

    n = spark.read.parquet(str(tmp_path / "store")).count()
    run()  # replay idempotence
    assert spark.read.parquet(str(tmp_path / "store")).count() == n


def test_bh_fdr_matches_python_stepup(spark):
    import math

    from vectordb_migrator_spark.operators.scale import bh_fdr

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
          0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34]
    rows = [(f"t{i:02d}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "name string, p double")
    got = {
        r["name"]: (r["rank"], r["discovery"])
        for r in bh_fdr(
            df, p_col="p", key_cols=["name"], q=0.15
        ).collect()
    }
    m = len(ps)
    srt = sorted(rows, key=lambda t: (round(t[1], 6), t[0]))
    kstar = max(
        (i + 1 for i, (_, p) in enumerate(srt)
         if round(p, 6) <= round(0.15 * (i + 1) / m, 6)),
        default=0,
    )
    for i, (name, _p) in enumerate(srt):
        assert got[name] == (i + 1, i + 1 <= kstar), name
    # non-trivial step-up: rank 4 (p=0.041) fails its OWN threshold
    # (0.15*4/15 = 0.04) but rank 6 hits its boundary exactly
    # (0.06 <= 0.06), so the step-up pulls ranks 4-5 in anyway
    assert kstar == 6
    assert got["t03"] == (4, True)
    assert math.isclose(0.15 * 4 / 15, 0.04, abs_tol=1e-12)


def test_ks_p_value_kolmogorov_series(spark):
    import math

    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.scale import ks_p_value

    df = spark.createDataFrame(
        [(0.5, 100, 100), (0.05, 100, 100), (0.9, 50, 60)],
        "d double, n_a long, n_b long",
    )
    got = [
        r["p"]
        for r in df.select(
            ks_p_value(F.col("d"), F.col("n_a"), F.col("n_b")).alias("p")
        ).collect()
    ]
    for (d, na, nb), p in zip([(0.5, 100, 100), (0.05, 100, 100),
                               (0.9, 50, 60)], got):
        lam2 = d * d * na * nb / (na + nb)
        s = sum(
            (-1) ** (k - 1) * math.exp(-2 * k * k * lam2)
            for k in range(1, 6)
        )
        want = round(min(1.0, max(0.0, 2 * s)), 6)
        assert abs(p - want) < 1e-9
    # big D on decent n: decisive; tiny D: p -> 1
    assert got[0] < 1e-5 and got[1] > 0.999


def test_cmh_test_matches_scipy_style_hand_math(spark):
    """Classic stratified 2x2 example, CMH with continuity correction
    and the MH common odds ratio vs a hand replica; a single-row
    stratum contributes no variance term and must not abort."""
    from vectordb_migrator_spark.operators.scale import cmh_test

    # stratum s1: a=10 b=5 c=4 d=11 | s2: a=8 b=12 c=7 d=13
    rows = []
    for s, counts in (("s1", (10, 5, 4, 11)), ("s2", (8, 12, 7, 13))):
        a, b, c, d = counts
        rows += [(s, "t", True)] * a + [(s, "t", False)] * b
        rows += [(s, "c", True)] * c + [(s, "c", False)] * d
    rows.append(("s3", "t", True))  # degenerate n=1 stratum
    df = spark.createDataFrame(rows, "s string, v string, outc boolean")
    r = cmh_test(
        df, strata_col="s", exposure_col="v", exposed="t",
        outcome_col="outc",
    ).first()

    def term(a, b, c, d):
        n = a + b + c + d
        e = round((a + b) * (a + c) / n, 9)
        var = round(
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)), 9
        )
        return e, var, round(a * d / n, 9), round(b * c / n, 9)

    e1, v1, ad1, bc1 = term(10, 5, 4, 11)
    e2, v2, ad2, bc2 = term(8, 12, 7, 13)
    # s3: e = 1*1/1 = 1, var NULL, ad = 0, bc = 0
    se, sv = e1 + e2 + 1.0, v1 + v2
    sum_a = 10 + 8 + 1
    want_cmh = round((abs(sum_a - se) - 0.5) ** 2 / sv, 6)
    assert r["n_strata"] == 3 and r["sum_a"] == sum_a
    assert abs(r["cmh_chi2"] - want_cmh) < 1e-9
    assert abs(r["or_mh"] - round((ad1 + ad2) / (bc1 + bc2), 6)) < 1e-9
    # pooled OR uses the collapsed table
    ta, tb, tc, td = 19, 17, 11, 24
    assert abs(r["or_pooled"] - round(ta * td / (tb * tc), 6)) < 1e-9


def test_ratio_metric_ci_matches_numpy_delta_method(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.scale import ratio_metric_ci

    rng = np.random.default_rng(11)
    rows = []
    for u in range(40):
        y = int(rng.integers(1, 10))
        x = int(rng.integers(0, y + 1))
        for _ in range(y):
            pass
        rows.append(("a", u, x, y))
    for u in range(40, 75):
        y = int(rng.integers(1, 8))
        rows.append(("b", u, int(rng.integers(0, y + 1)), y))
    rows.append(("c", 99, 1, 2))  # single-unit variant: NULL se
    df = spark.createDataFrame(rows, "v string, u long, x long, y long")
    got = {
        r["variant"]: r
        for r in ratio_metric_ci(
            df, unit_col="u", variant_col="v",
            numerator_col="x", denominator_col="y",
        ).collect()
    }
    for v in ("a", "b"):
        xs = np.array([r[2] for r in rows if r[0] == v], dtype=float)
        ys = np.array([r[3] for r in rows if r[0] == v], dtype=float)
        n = len(xs)
        r = xs.sum() / ys.sum()
        cov = np.cov(xs, ys, ddof=1)
        var_r = (
            cov[0, 0] - 2 * r * cov[0, 1] + r * r * cov[1, 1]
        ) / (n * ys.mean() ** 2)
        se = float(np.sqrt(max(var_r, 0.0)))
        g = got[v]
        assert abs(g["ratio"] - round(r, 6)) < 1e-9
        assert abs(g["se"] - round(se, 6)) < 1e-6, v
        assert abs(g["ci_lo"] - round(r - 1.959964 * se, 6)) < 1e-5
    assert got["c"]["se"] is None and got["c"]["ci_lo"] is None


def test_eb_shrinkage_reorders_small_samples(spark):
    from vectordb_migrator_spark.operators.scale import eb_shrink_rates

    rows = []
    # lucky: 2/2; steady: 80/100; plenty of background units to pin
    # the prior near 0.3
    rows += [("lucky", 1, 1)] * 2
    rows += [("steady", 1, 1)] * 80 + [("steady", 0, 1)] * 20
    for i in range(30):
        rows += [(f"bg{i:02d}", 1, 1)] * 3 + [(f"bg{i:02d}", 0, 1)] * 7
    df = spark.createDataFrame(rows, "u string, s int, one int")
    out = eb_shrink_rates(
        df, unit_col="u", success_col="s", trial_col="one", top_k=50
    ).collect()
    by = {r["unit"]: r for r in out}
    lucky, steady = by["lucky"], by["steady"]
    # raw says lucky (1.0) beats steady (0.8); shrinkage flips it
    assert lucky["raw_rate"] > steady["raw_rate"]
    assert steady["shrunk_rate"] > lucky["shrunk_rate"]
    # shrinkage pulls toward the prior mean, never past the raw rate
    assert steady["shrunk_rate"] < steady["raw_rate"]
    assert lucky["shrunk_rate"] < lucky["raw_rate"]
    assert out[0]["unit"] == "steady"  # leaderboard head


def test_post_stratify_recovers_population_mean(spark):
    from vectordb_migrator_spark.operators.scale import post_stratify

    # population: stratum A mean 10 (80 rows), stratum B mean 100
    # (20 rows) -> population mean 28. Sample oversamples B 1:1.
    pop = [("A", 10.0)] * 80 + [("B", 100.0)] * 20
    smp = [("A", 10.0)] * 20 + [("B", 100.0)] * 20
    pop_df = spark.createDataFrame(pop, "s string, v double")
    smp_df = spark.createDataFrame(smp, "s string, v double")
    r = post_stratify(
        smp_df, pop_df, stratum_col="s", value_col="v"
    ).first()
    assert r["naive_mean"] == 55.0          # biased toward B
    assert r["weighted_mean"] == 28.0       # exact population mean
    assert r["uncovered_pop_share"] == 0.0
    assert r["n_eff"] < r["n_sample"]       # weighting costs precision

    # a population stratum missing from the sample is reported
    pop2 = pop + [("C", 0.0)] * 100
    r2 = post_stratify(
        smp_df,
        spark.createDataFrame(pop2, "s string, v double"),
        stratum_col="s",
        value_col="v",
    ).first()
    assert r2["uncovered_pop_share"] == 0.5


def test_anova_oneway_matches_numpy(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.scale import anova_oneway

    rng = np.random.default_rng(7)
    groups = {"a": 10.0, "b": 12.0, "c": 10.5}
    rows = []
    vals = {}
    for g, mu in groups.items():
        v = np.round(rng.normal(mu, 2.0, 40), 3)
        vals[g] = v
        rows += [(g, float(x)) for x in v]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", group_col="g").first()

    allv = np.concatenate(list(vals.values()))
    grand = allv.mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in vals.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in vals.values())
    f = (ssb / 2) / (ssw / (len(allv) - 3))
    assert r["n_total"] == 120 and r["k_groups"] == 3
    assert abs(r["ss_between"] - ssb) < 1e-2
    assert abs(r["ss_within"] - ssw) < 1e-2
    assert abs(r["f_stat"] - f) < 1e-3
    assert abs(r["eta_sq"] - ssb / (ssb + ssw)) < 1e-5


def test_anova_single_group_reports_null_f(spark):
    from vectordb_migrator_spark.operators.scale import anova_oneway

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    r = anova_oneway(df, "v", group_col="g").first()
    assert r["f_stat"] is None  # dof_between = 0 -> NULL, no ANSI abort


def test_spearman_rho_known_values(spark):
    from vectordb_migrator_spark.operators.scale import spearman_rho

    # perfectly monotone (nonlinear) relation -> rho exactly 1
    df = spark.createDataFrame(
        [(float(x), float(x**3)) for x in range(1, 11)],
        "x double, y double",
    )
    r = spearman_rho(df, "x", "y").first()
    assert r["rho"] == 1.0

    # textbook anti-monotone -> -1
    df2 = spark.createDataFrame(
        [(float(x), float(-x)) for x in range(1, 11)],
        "x double, y double",
    )
    assert spearman_rho(df2, "x", "y").first()["rho"] == -1.0


def test_spearman_rho_ties_average_ranks(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.scale import spearman_rho

    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0, 5.0]
    ys = [2.0, 1.0, 3.0, 5.0, 4.0, 6.0, 6.0, 7.0]

    def avg_ranks(v):
        v = np.asarray(v)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=float)
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    expected = np.corrcoef(rx, ry)[0, 1]
    df = spark.createDataFrame(
        list(zip(xs, ys)), "x double, y double"
    )
    r = spearman_rho(df, "x", "y").first()
    assert abs(r["rho"] - expected) < 1e-6


def test_permutation_test_md5_detects_planted_effect(spark):
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.scale import (
        permutation_test_md5,
    )

    # strong planted effect: even units ~ 100, odd units ~ 1
    rows = []
    for u in range(60):
        base = 100.0 if u % 2 == 0 else 1.0
        rows += [(u, base + (u % 7) * 0.01)]
    df = spark.createDataFrame(rows, "u long, v double")
    r = permutation_test_md5(
        df,
        unit_col="u",
        value_col="v",
        variant_expr=(F.col("u") % 2 == 0),
        n_perms=100,
    ).first()
    assert r["observed_diff"] > 98
    assert r["p_value"] == round(1 / 101, 6)  # nothing as extreme
    assert bool(r["significant"])

    # no effect: label by parity but values iid-ish -> p not tiny
    rows2 = [(u, float((u * 37) % 11)) for u in range(60)]
    df2 = spark.createDataFrame(rows2, "u long, v double")
    r2 = permutation_test_md5(
        df2,
        unit_col="u",
        value_col="v",
        variant_expr=(F.col("u") % 3 == 0),
        n_perms=100,
    ).first()
    assert r2["p_value"] > 0.05

    # deterministic: identical re-run, bit-identical p
    r3 = permutation_test_md5(
        df2,
        unit_col="u",
        value_col="v",
        variant_expr=(F.col("u") % 3 == 0),
        n_perms=100,
    ).first()
    assert r3["p_value"] == r2["p_value"]


def test_tost_equivalence_verdicts(spark):
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.scale import tost_equivalence

    # identical distributions, large n -> equivalent within 2%
    rows = [(u, 100.0 + (u % 13) * 0.1) for u in range(2000)]
    df = spark.createDataFrame(rows, "u long, v double")
    r = tost_equivalence(
        df, "v", variant_expr=(F.col("u") % 2 == 0)
    ).first()
    assert abs(r["diff"]) < r["margin"]
    assert bool(r["equivalent"])

    # a 10% planted shift -> NOT equivalent at a 2% margin
    rows2 = [
        (u, (110.0 if u % 2 == 0 else 100.0) + (u % 13) * 0.1)
        for u in range(2000)
    ]
    df2 = spark.createDataFrame(rows2, "u long, v double")
    r2 = tost_equivalence(
        df2, "v", variant_expr=(F.col("u") % 2 == 0)
    ).first()
    assert not bool(r2["equivalent"])
    assert r2["diff"] > r2["margin"]


def test_poisson_bootstrap_ci_brackets_mean_and_clusters_units(spark):
    from vectordb_migrator_spark.operators.scale import (
        poisson_bootstrap_ci,
    )

    # 500 units x 4 rows each, values ~ unit-level signal + row noise
    rows = [
        (u, float(50 + (u % 11) - 5 + (i % 3)))
        for u in range(500)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "u long, v double")
    r = poisson_bootstrap_ci(
        df, "v", unit_col="u", replicates=39, seed=7
    ).first()
    assert r["n"] == 2000
    # point estimate is the exact sample mean
    true_mean = sum(v for _, v in rows) / len(rows)
    assert abs(r["mean"] - true_mean) < 1e-6
    # percentile interval brackets the mean with sane width
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    assert 0 < r["boot_se"] < 1.0
    assert (r["ci_hi"] - r["ci_lo"]) < 8 * r["boot_se"] + 1e-9

    # deterministic: same seed -> bit-identical CI; new seed -> new draw
    r2 = poisson_bootstrap_ci(
        df, "v", unit_col="u", replicates=39, seed=7
    ).first()
    assert (r2["ci_lo"], r2["ci_hi"]) == (r["ci_lo"], r["ci_hi"])
    r3 = poisson_bootstrap_ci(
        df, "v", unit_col="u", replicates=39, seed=8
    ).first()
    assert (r3["ci_lo"], r3["ci_hi"]) != (r["ci_lo"], r["ci_hi"])

    # unit-clustered weights: a units-as-rows frame where one unit's
    # rows are split across many rows must produce the SAME replicate
    # weight for every row of the unit — so a frame with duplicated
    # unit rows has wider (not narrower) CI than iid rows would claim
    import pyspark.sql.functions as F

    one_unit = spark.createDataFrame(
        [(1, float(i)) for i in range(100)], "u long, v double"
    )
    r_clustered = poisson_bootstrap_ci(
        one_unit, "v", unit_col="u", replicates=39, seed=7
    ).first()
    # one unit -> every replicate mean equals the sample mean (all
    # rows share one weight) -> zero bootstrap variance
    assert r_clustered["boot_se"] == 0.0
    assert r_clustered["ci_lo"] == r_clustered["ci_hi"] == r_clustered["mean"]


def test_x12_bucketed_join_query_shape_is_exchange_free(spark):
    """The registry query's exact shape (16x16 buckets on the order
    key, external-path tables, different column names joined with an
    explicit predicate) must run the sort-merge join with NO Exchange
    on either side, and the external path must hold the bytes."""
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="bkt_shape_")
    o = spark.createDataFrame(
        [(i, f"P{i % 5}") for i in range(400)], ["o_orderkey", "o_p"]
    )
    li = spark.createDataFrame(
        [(i % 400, float(i)) for i in range(2000)],
        ["l_orderkey", "l_price"],
    )
    spark.sql("DROP TABLE IF EXISTS bkt_shape_o")
    spark.sql("DROP TABLE IF EXISTS bkt_shape_l")
    write_bucketed(
        o, "bkt_shape_o", bucket_cols="o_orderkey", num_buckets=16,
        sort_cols=["o_orderkey"], path=base + "/o",
    )
    write_bucketed(
        li, "bkt_shape_l", bucket_cols="l_orderkey", num_buckets=16,
        sort_cols=["l_orderkey"], path=base + "/l",
    )
    assert os.listdir(base + "/o")  # bytes at the external path
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        ot = spark.table("bkt_shape_o")
        lt = spark.table("bkt_shape_l")
        j = lt.join(ot, lt["l_orderkey"] == ot["o_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        agg = j.groupBy("o_p").agg(F.count("*").alias("n"))
        assert sum(r["n"] for r in agg.collect()) == 2000


def test_mmd_two_sample_separates_mean_and_covariance_drift(spark):
    from vectordb_migrator_spark.operators.scale import mmd_two_sample

    d = 64
    ones = [1.0] * d
    alt = [1.0 if i % 2 == 0 else -1.0 for i in range(d)]

    # identical populations -> exactly zero
    rows = [(i, ones if i % 2 == 0 else [-x for x in ones], i % 2)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, grp int"
    )
    r0 = mmd_two_sample(
        df, group_expr=(F.col("vec_id") % 4 < 2), d=d
    ).first()
    # both groups contain the same multiset {+ones, -ones} -> moments
    # equal -> mmd2 exactly 0
    assert r0["mmd2"] == 0.0

    # same MEANS (both zero), different CORRELATION structure:
    # group a = +-ones (S = all-ones matrix), group b = +-alt
    # (S = checkerboard). The mean term must stay 0; the Frobenius
    # term = sum over the 2048 sign-flipped entries of (1-(-1))^2 / d^2 = 2.
    rows2 = (
        [(i, ones if i % 2 == 0 else [-x for x in ones], 0)
         for i in range(40)]
        + [(100 + i, alt if i % 2 == 0 else [-x for x in alt], 1)
           for i in range(40)]
    )
    df2 = spark.createDataFrame(
        rows2, "vec_id long, embedding array<float>, grp int"
    )
    r1 = mmd_two_sample(df2, group_expr=(F.col("grp") == 0), d=d).first()
    assert r1["n_a"] == 40 and r1["n_b"] == 40
    assert r1["mean_term"] == 0.0
    assert abs(r1["cov_term"] - 2.0) < 1e-9
    assert abs(r1["mmd2"] - 2.0) < 1e-9

    # pure mean shift: b = a + 0.5*ones -> mean term 2*d*(0.5^2)/d = 0.5
    rows3 = (
        [(i, [0.0] * d, 0) for i in range(40)]
        + [(100 + i, [0.5] * d, 1) for i in range(40)]
    )
    df3 = spark.createDataFrame(
        rows3, "vec_id long, embedding array<float>, grp int"
    )
    r2 = mmd_two_sample(df3, group_expr=(F.col("grp") == 0), d=d).first()
    assert abs(r2["mean_term"] - 0.5) < 1e-9
    assert r2["mean_term"] > r2["cov_term"] - 1e-9


def test_split_conformal_matches_python_replica_and_covers(spark):
    import hashlib
    import math

    from vectordb_migrator_spark.operators.scale import (
        split_conformal_report,
    )

    rows = [(u, float(50 + (u * 37) % 100) + (u % 13) * 0.25)
            for u in range(3000)]
    df = spark.createDataFrame(rows, "u long, v double")
    r = split_conformal_report(
        df, "v", unit_col="u", alpha=0.1, seed=7
    ).first()

    # pure-Python replica of the exact md5-split + quantile rule
    def split(u):
        h = int(hashlib.md5(f"{u}:conf:7".encode()).hexdigest()[:8], 16)
        x = (h + 0.5) / 4294967296.0
        return "train" if x < 0.4 else ("cal" if x < 0.7 else "test")

    tr = [v for u, v in rows if split(u) == "train"]
    ca = [v for u, v in rows if split(u) == "cal"]
    te = [v for u, v in rows if split(u) == "test"]
    mu = sum(tr) / len(tr)
    res = sorted(abs(v - mu) for v in ca)
    k = math.ceil((len(ca) + 1) * 0.9)
    q = res[k - 1]
    cov = sum(1 for v in te if abs(v - mu) <= q) / len(te)
    assert r["n_train"] == len(tr)
    assert r["n_cal"] == len(ca)
    assert r["n_test"] == len(te)
    assert abs(r["qhat"] - round(q, 6)) < 1e-9
    assert abs(r["coverage"] - round(cov, 6)) < 1e-9
    assert abs(r["avg_width"] - round(2 * q, 6)) < 1e-9
    # the finite-sample guarantee holds empirically
    assert r["coverage"] >= 0.9 - 0.03


def test_split_conformal_emits_null_qhat_when_rank_exceeds_n_cal(spark):
    from vectordb_migrator_spark.operators.scale import (
        split_conformal_report,
    )

    # group "big" has plenty of calibration rows; group "tiny" has so
    # few units that ceil((n_cal+1)*0.9) > n_cal — it must still
    # appear, with qhat/coverage/avg_width NULL ("no finite guarantee
    # at this alpha"), not vanish from the report (r9 ADVICE)
    rows = [(u, "big", float(u % 50)) for u in range(2000)] + [
        (10_000 + u, "tiny", float(u)) for u in range(12)
    ]
    df = spark.createDataFrame(rows, "u long, g string, v double")
    out = {
        r["g"]: r
        for r in split_conformal_report(
            df, "v", unit_col="u", group_cols=["g"], alpha=0.1, seed=7
        ).collect()
    }
    assert set(out) == {"big", "tiny"}
    big, tiny = out["big"], out["tiny"]
    assert big["qhat"] is not None and big["coverage"] is not None
    import math

    assert math.ceil((tiny["n_cal"] + 1) * 0.9) > tiny["n_cal"]
    assert tiny["qhat"] is None
    assert tiny["coverage"] is None
    assert tiny["avg_width"] is None
    assert tiny["n_cal"] is not None and tiny["n_test"] is not None


def test_mann_whitney_matches_python_replica_and_edges(spark):
    import math

    from vectordb_migrator_spark.operators.scale import mann_whitney_report

    # group "shift": sample A shifted up by 5 (clearly significant);
    # group "same": identical distributions (not significant);
    # group "tied": every value equal (sigma = 0 -> NULL z)
    rows = []
    for u in range(120):
        a = u % 2 == 0
        rows.append((u, "shift", float(u % 13) + (5.0 if a else 0.0)))
        rows.append((u, "same", float((u * 7) % 23)))
        rows.append((u, "tied", 42.0))
    df = spark.createDataFrame(rows, "user_id long, g string, value double")
    got = {
        r["g"]: r
        for r in mann_whitney_report(
            df, "value", group_cols=["g"],
            split_expr=(df["user_id"] % 2 == 0),
        ).collect()
    }

    def replica(vals):  # [(value, is_a)] -> (n1, n2, u1, z)
        sv = sorted(v for v, _ in vals)
        # 2*avg rank per value: 2*minrank + t - 1
        first, cnt = {}, {}
        for i, v in enumerate(sv):
            first.setdefault(v, i + 1)
            cnt[v] = cnt.get(v, 0) + 1
        n1 = sum(1 for _, a in vals if a)
        n2 = len(vals) - n1
        r2a = sum(2 * first[v] + cnt[v] - 1 for v, a in vals if a)
        ties = sum(t * t * t - t for t in cnt.values())
        u1 = (r2a - n1 * (n1 + 1)) / 2.0
        n = n1 + n2
        mu = n1 * n2 / 2.0
        var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
        z = round((u1 - mu) / math.sqrt(var), 6) if var > 0 else None
        return n1, n2, round(u1, 1), z

    for g in ("shift", "same"):
        vals = [(v, u % 2 == 0) for u, gg, v in rows if gg == g]
        n1, n2, u1, z = replica(vals)
        r = got[g]
        assert (r["n1"], r["n2"], r["u1"], r["z"]) == (n1, n2, u1, z)
    assert got["shift"]["significant"] is True
    assert got["same"]["significant"] is False
    assert got["tied"]["z"] is None and got["tied"]["significant"] is None


def test_ks_two_sample_matches_python_replica_and_detects_shape(spark):
    import math

    from vectordb_migrator_spark.operators.scale import ks_two_sample_report

    rows = []
    for u in range(200):
        a = u % 2 == 0
        # "spread": same mean, sample A has 3x the spread (U would
        # barely see it; KS must)
        base = float((u * 7) % 21) - 10.0
        rows.append((u, "spread", 50.0 + (base * 3.0 if a else base)))
        # "same": identical distributions
        rows.append((u, "same", float((u * 11) % 17)))
        # "empty_b": only sample A present -> NULL D
        if a:
            rows.append((u, "empty_b", 1.0))
    df = spark.createDataFrame(rows, "user_id long, g string, value double")
    got = {
        r["g"]: r
        for r in ks_two_sample_report(
            df, "value", group_cols=["g"],
            split_expr=(df["user_id"] % 2 == 0),
        ).collect()
    }

    def replica(vals):
        va = sorted(v for v, a in vals if a)
        vb = sorted(v for v, a in vals if not a)
        n1, n2 = len(va), len(vb)
        dnum = 0
        for v in sorted(set(va + vb)):
            ca = sum(1 for x in va if x <= v)
            cb = sum(1 for x in vb if x <= v)
            dnum = max(dnum, abs(n2 * ca - n1 * cb))
        d = dnum / (n1 * n2)
        lam = round(d * math.sqrt(n1 * n2 / (n1 + n2)), 6)
        return n1, n2, dnum, round(d, 6), lam

    for g in ("spread", "same"):
        vals = [(v, u % 2 == 0) for u, gg, v in rows if gg == g]
        n1, n2, dnum, d, lam = replica(vals)
        r = got[g]
        assert (r["n1"], r["n2"], r["d_num"], r["d"], r["lambda"]) == (
            n1, n2, dnum, d, lam,
        )
    assert got["spread"]["significant"] is True  # pure shape change
    assert got["same"]["significant"] is False
    eb = got["empty_b"]
    assert eb["d"] is None and eb["significant"] is None


def test_neyman_allocation_properties(spark):
    """Hamilton rounding: Σalloc == budget exactly; noisier strata
    get more budget at equal size; constant strata weigh 0; an
    all-constant input yields NULL allocs, never a division error."""
    import pytest

    from vectordb_migrator_spark.operators.scale import neyman_allocation

    rows = []
    for i in range(300):
        rows.append((i, "noisy", float((i * 97) % 100)))      # wide
        rows.append((i, "quiet", 50.0 + (i % 3) * 0.01))      # narrow
        rows.append((i, "const", 7.0))                        # zero var
    df = spark.createDataFrame(rows, "id long, src string, v double")
    out = {
        r["stratum"]: r
        for r in neyman_allocation(
            df, "v", stratum_col="src", budget=777
        ).collect()
    }
    assert sum(r["alloc"] for r in out.values()) == 777
    assert out["noisy"]["alloc"] > out["quiet"]["alloc"]
    assert out["const"]["weight"] == 0 and out["const"]["alloc"] == 0
    assert abs(out["noisy"]["share"] - out["noisy"]["alloc"] / 777) < 1e-9

    flat = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 5.0) for i in range(50)],
        "id long, src string, v double",
    )
    got = neyman_allocation(flat, "v", stratum_col="src").collect()
    assert all(r["alloc"] is None for r in got)

    with pytest.raises(ValueError, match="budget"):
        neyman_allocation(df, "v", stratum_col="src", budget=0)


def test_temperature_mixing_flattens_toward_uniform(spark):
    """Higher roots flatten the distribution: the dominant domain's
    share strictly decreases from root 1 -> 2 -> 4 while the smallest
    domain's share increases; every root's allocations sum exactly to
    the budget; invalid roots are rejected."""
    import pytest

    from vectordb_migrator_spark.operators.scale import (
        temperature_mixing,
    )

    rows = (
        [(i, "big") for i in range(640)]
        + [(i + 1000, "mid") for i in range(80)]
        + [(i + 2000, "tiny") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "id long, lang string")
    out = temperature_mixing(
        df, domain_col="lang", budget=9973
    ).collect()
    by = {(r["root"], r["domain"]): r for r in out}
    for root in (1, 2, 4):
        assert (
            sum(r["alloc"] for r in out if r["root"] == root) == 9973
        ), root
    assert (
        by[(1, "big")]["share"]
        > by[(2, "big")]["share"]
        > by[(4, "big")]["share"]
    )
    assert (
        by[(1, "tiny")]["share"]
        < by[(2, "tiny")]["share"]
        < by[(4, "tiny")]["share"]
    )
    # root=1 reproduces raw proportions (640/730 of the budget +-1)
    assert abs(by[(1, "big")]["alloc"] - 9973 * 640 / 730) <= 1

    with pytest.raises(ValueError, match="roots"):
        temperature_mixing(df, domain_col="lang", roots=(3,))
