"""Hashed-feature linear classifiers (operators/classify.py).

Differential strategy: every Spark result is replayed by a pure-Python
replica of the same md5-bucket hashing + add-α counting math, so a
regression in either the hashing, the smoothing, or the fold order
shows up as a value mismatch — the same harness style as the k-means
and OPQ differentials."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.classify import (
    dsir_weights,
    nb_fit,
    nb_score,
)

DIM = 16
ALPHA = 1.0


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % DIM


def _toks(text: str) -> list[str]:
    return [t for t in text.strip().lower().split() if t]


def _py_nb(rows: list[tuple[str, str]]):
    """(text, label) rows -> {label: (log_prior, [loglik]*DIM)}."""
    from collections import Counter, defaultdict

    cell: dict[str, Counter] = defaultdict(Counter)
    docs: Counter = Counter()
    for text, label in rows:
        docs[label] += 1
        for t in _toks(text):
            cell[label][_bucket(t)] += 1
    out = {}
    for label in cell:
        tot = sum(cell[label].values())
        ll = [
            round(
                math.log((cell[label][b] + ALPHA) / (tot + ALPHA * DIM)), 9
            )
            for b in range(DIM)
        ]
        out[label] = (round(math.log(docs[label] / len(rows)), 9), ll)
    return out


CORPUS = [
    ("apple banana cherry apple", "fruit"),
    ("banana mango apple peach", "fruit"),
    ("mango peach cherry banana apple", "fruit"),
    ("bolt nut wrench gear", "tool"),
    ("gear wrench hammer bolt", "tool"),
    ("hammer nut gear bolt wrench", "tool"),
]


def test_nb_fit_matches_python_replica(spark):
    df = spark.createDataFrame(CORPUS, ["text", "label"])
    model = {
        r["label"]: (r["log_prior"], list(r["loglik"]))
        for r in nb_fit(df, "text", "label", dim=DIM, alpha=ALPHA).collect()
    }
    py = _py_nb(CORPUS)
    assert set(model) == set(py)
    for label in py:
        assert model[label][0] == pytest.approx(py[label][0], abs=1e-9)
        assert model[label][1] == pytest.approx(py[label][1], abs=1e-9)


def test_nb_score_separable_corpus(spark):
    df = spark.createDataFrame(CORPUS, ["text", "label"])
    model = nb_fit(df, "text", "label", dim=DIM, alpha=ALPHA)
    scored = nb_score(df, model, "text", dim=DIM)
    rows = scored.collect()
    assert all(r["pred"] == r["label"] for r in rows)

    # score differential: replay one doc by hand
    py = _py_nb(CORPUS)
    r0 = [r for r in rows if r["text"] == CORPUS[0][0]][0]
    cnts = [0.0] * DIM
    for t in _toks(CORPUS[0][0]):
        cnts[_bucket(t)] += 1.0
    want = max(
        (
            round(prior + sum(c * l for c, l in zip(cnts, ll)), 6),
            label,
        )
        for label, (prior, ll) in py.items()
    )
    assert (r0["pred_score"], r0["pred"]) == want


def test_nb_score_unseen_doc_and_tiebreak(spark):
    df = spark.createDataFrame(CORPUS, ["text", "label"])
    model = nb_fit(df, "text", "label", dim=DIM, alpha=ALPHA)
    probe = spark.createDataFrame(
        [("wrench gear hammer",), ("apple banana mango",)], ["text"]
    )
    got = {
        r["text"]: r["pred"]
        for r in nb_score(probe, model, "text", dim=DIM).collect()
    }
    assert got["wrench gear hammer"] == "tool"
    assert got["apple banana mango"] == "fruit"
    # empty text: only priors compete; equal priors tie-break toward
    # the lexicographically LARGEST label (array_max struct ordering)
    empty = nb_score(
        spark.createDataFrame([("",)], ["text"]), model, "text", dim=DIM
    ).first()
    assert empty["pred"] == "tool"


def test_dsir_weights_match_python_replica(spark):
    df = spark.createDataFrame(CORPUS, ["text", "label"])
    out = dsir_weights(
        df, "text", F.col("label") == "fruit", dim=DIM, alpha=ALPHA
    ).collect()

    from collections import Counter

    all_c: Counter = Counter()
    tgt_c: Counter = Counter()
    for text, label in CORPUS:
        for t in _toks(text):
            all_c[_bucket(t)] += 1
            if label == "fruit":
                tgt_c[_bucket(t)] += 1
    ta, tt = sum(all_c.values()), sum(tgt_c.values())
    delta = [
        round(
            math.log((tgt_c[b] + ALPHA) / (tt + ALPHA * DIM))
            - math.log((all_c[b] + ALPHA) / (ta + ALPHA * DIM)),
            9,
        )
        for b in range(DIM)
    ]
    for r in out:
        cnts = [0.0] * DIM
        for t in _toks(r["text"]):
            cnts[_bucket(t)] += 1.0
        want = round(sum(c * d for c, d in zip(cnts, delta)), 6)
        assert r["dsir_logratio"] == pytest.approx(want, abs=1e-9)

    # fruit docs must out-weigh tool docs under a fruit target
    fruit = [r["dsir_logratio"] for r in out if r["label"] == "fruit"]
    tool = [r["dsir_logratio"] for r in out if r["label"] == "tool"]
    assert min(fruit) > max(tool)


def test_nb_score_plan_projects_counts_once(spark):
    """The bucket-count vector must be a REAL projected column so the
    per-label folds reference it instead of re-inlining the
    tokenize+md5 tree (the documented Catalyst lambda-inlining trap)."""
    df = spark.createDataFrame(CORPUS, ["text", "label"])
    model = nb_fit(df, "text", "label", dim=DIM, alpha=ALPHA)
    plan = (
        nb_score(df, model, "text", dim=DIM)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("md5") <= 1, plan


def test_nb_score_posterior_properties(spark):
    from vectordb_migrator_spark.operators.classify import nb_fit, nb_score

    df = spark.createDataFrame(
        [
            (1, "aaa aaa aaa", "A"),
            (2, "aaa aaa aab", "A"),
            (3, "zzz zzz zzz", "B"),
            (4, "zzz zzy zzz", "B"),
            (5, "aaa zzz aaa", "A"),
        ],
        "id long, text string, lab string",
    )
    model = nb_fit(df, "text", "lab", dim=16)
    out = nb_score(df, model, "text", dim=16, posterior_col="conf").collect()
    for r in out:
        # posterior of the winner is in (1/n_labels .. 1]
        assert 0.5 - 1e-9 <= r["conf"] <= 1.0 + 1e-9
    by_id = {r["id"]: r for r in out}
    # a clean one-class doc is more confident than a mixed doc
    assert by_id[1]["conf"] > by_id[5]["conf"]


def test_isotonic_calibration_pav_and_apply(spark):
    """PAV pools adjacent violators into a nondecreasing step
    function (hand-checked example), apply maps scores through their
    segment (including between-segment and out-of-range scores), and
    the distinct-score guard fails loudly."""
    import pytest

    from vectordb_migrator_spark.operators.classify import (
        isotonic_apply,
        isotonic_calibrate,
    )

    rows = [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1), (5.0, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    model = isotonic_calibrate(df, score_col="score", label_col="label")
    ps = [seg["p"] for seg in model]
    assert ps == sorted(ps)  # nondecreasing by construction
    assert ps == [0.0, 0.5, 1.0]
    assert model[1]["score_lo"] == 2.0 and model[1]["score_hi"] == 3.0
    assert model[2]["n"] == 2

    applied = {
        r["score"]: r["calibrated"]
        for r in isotonic_apply(
            spark.createDataFrame(
                [(0.5,), (2.5,), (3.0,), (4.5,), (9.0,)], "score double"
            ),
            model,
            score_col="score",
        ).collect()
    }
    assert applied[0.5] == 0.0  # below first segment
    assert applied[2.5] == 0.5  # inside pooled segment
    assert applied[3.0] == 0.5
    assert applied[4.5] == 1.0
    assert applied[9.0] == 1.0  # above last segment

    nulls = isotonic_apply(
        spark.createDataFrame([(None,)], "score double"),
        model, score_col="score",
    ).first()
    assert nulls["calibrated"] is None

    with pytest.raises(ValueError, match="max_points"):
        isotonic_calibrate(
            df, score_col="score", label_col="label", max_points=2
        )
    with pytest.raises(ValueError, match="model"):
        isotonic_apply(df, [], score_col="score")


def test_f1_report_hand_checked_confusion(spark):
    """3-class toy confusion with an extra prediction-only class:
    per-class P/R/F1 match hand values, micro equals accuracy, macro
    averages unweighted, and the pred-only class gets recall NULL."""
    from vectordb_migrator_spark.operators.classify import f1_report

    #      true=a: pred a,a,b   true=b: pred b,b,b,a   true=c: pred z
    rows = (
        [("a", "a"), ("a", "a"), ("a", "b")]
        + [("b", "b"), ("b", "b"), ("b", "b"), ("b", "a")]
        + [("c", "z")]
    )
    df = spark.createDataFrame(rows, "t string, p string")
    got = {
        r["label"]: r
        for r in f1_report(df, true_col="t", pred_col="p").collect()
    }
    a = got["a"]
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (3, 2, 1, 1)
    assert a["precision"] == round(2 / 3, 6) and a["recall"] == round(2 / 3, 6)
    z = got["z"]
    assert z["support"] == 0 and z["recall"] is None and z["precision"] == 0.0
    micro = got["__micro__"]
    # micro P = R = F1 = accuracy = 5/8
    assert micro["precision"] == micro["recall"] == micro["f1"] == 0.625
    macro = got["__macro__"]
    # macro precision averages over a,b,c,z (c has precision NULL -> skipped)
    per_prec = [got[k]["precision"] for k in ("a", "b", "c", "z")]
    want = round(
        sum(p for p in per_prec if p is not None)
        / len([p for p in per_prec if p is not None]),
        6,
    )
    assert macro["precision"] == want


def test_ece_report_hand_checked_bins(spark):
    """Two-bin toy: per-bin conf/acc/gap and the summary ECE match
    hand arithmetic; score 0 joins the first bin (right-closed)."""
    from vectordb_migrator_spark.operators.classify import ece_report

    rows = [
        (0.0, 0), (0.05, 0), (0.1, 1),      # bin 0: conf .05, acc 1/3
        (0.95, 1), (0.85, 1), (0.9, 0),     # bin 8/9
    ]
    df = spark.createDataFrame(rows, "s double, y long")
    got = {r["bin"]: r for r in
           ece_report(df, score_col="s", label_col="y", n_bins=10).collect()}
    b0 = got[0]
    assert b0["n"] == 3
    assert b0["conf"] == 0.05 and b0["acc"] == round(1 / 3, 6)
    assert b0["gap"] == round(1 / 3 - 0.05, 6)
    # 0.85, 0.9 land in bin 8; 0.95 in bin 9
    assert got[8]["n"] == 2 and got[9]["n"] == 1
    ece = (3 * abs(1 / 3 - 0.05) + 2 * abs(0.5 - 0.875) + 1 * abs(1 - 0.95)) / 6
    assert abs(got[-1]["gap"] - round(ece, 6)) < 2e-6


def test_bradley_terry_recovers_planted_strengths(spark):
    from vectordb_migrator_spark.operators.classify import bradley_terry

    # planted: A beats B 3:1, B beats C 3:1, A beats C 9:1 (a
    # consistent BT world with s_A/s_B = s_B/s_C = 3)
    rows = (
        [("A", "B")] * 30 + [("B", "A")] * 10
        + [("B", "C")] * 30 + [("C", "B")] * 10
        + [("A", "C")] * 45 + [("C", "A")] * 5
    )
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {r["item"]: r for r in bradley_terry(df, iterations=20).collect()}
    sA, sB, sC = out["A"]["score"], out["B"]["score"], out["C"]["score"]
    assert sA > sB > sC
    # the fitted ratios recover the planted 3x gaps (MM converged)
    assert abs(sA / sB - 3.0) < 0.35
    assert abs(sB / sC - 3.0) < 0.35
    # win counts and match totals are the raw tallies
    assert out["A"]["wins"] == 75 and out["A"]["n_contests"] == 90
    assert out["C"]["wins"] == 15 and out["C"]["n_contests"] == 90
    # normalization: scores average to 1
    assert abs((sA + sB + sC) / 3.0 - 1.0) < 1e-6

    # determinism: identical rerun is bit-identical
    out2 = {r["item"]: r["score"] for r in
            bradley_terry(df, iterations=20).collect()}
    assert out2 == {k: v["score"] for k, v in out.items()}
