"""Hashed-feature linear classifiers — the fastText / DSIR stand-ins.

Every serious pre-training corpus pipeline carries a cheap linear
text classifier: CCNet's fastText language-ID, the GPT-3/LLaMA
"wiki-like" quality filters, and DSIR's importance-resampling
selector (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") are all bag-of-hashed-n-grams models whose
training is pure counting. That makes them an exact fit for Spark:

- **fit is one aggregation** — explode tokens to md5 buckets, count
  per ``(label, bucket)`` with map-side combine; the model is
  ``labels × dim`` cells, kilobytes at any corpus size;
- **scoring is one narrow codegen pass** — the per-doc bucket-count
  vector is computed once (projected as a REAL column so Catalyst
  cannot inline the tokenize+md5 tree into every per-label fold —
  the documented lambda-inlining trap), then each label's score is a
  ``dim``-length dot product against a broadcast-literal
  log-likelihood array. No shuffle, no UDF, no model server.

Because the bucket hash is md5-derived (bit-identical across
engines) and every log-likelihood is rounded to 9 decimals before
the dot product, the full train→score composition carries exact
value-hash oracles in DuckDB — the reference
(`/root/reference/vectordb_migration/core/migrator.py`) has no
classifier surface at all; this module is part of the
training-data-pipeline extension mandate.

The reference pipeline for DSIR: importance weight of a pool
document is ``Σ_b n_b · (ln p_target(b) − ln p_raw(b))`` under
add-α smoothed unigram-bucket models — literally a binary Naive
Bayes log-odds, so :func:`dsir_weights` shares the counting core.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.text import (
    feature_hash_vector,
    feature_hash_vector_arrow,
    ws_tokens,
)


def _buckets(text_col: str | Column, dim: int) -> Column:
    """Per-token md5 bucket array (same hash as feature_hash_vector)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(ws_tokens(c), lambda t: t != "")
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        % dim,
    )


def nb_fit(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    dim: int = 64,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit a multinomial Naive Bayes over md5-hashed unigram buckets.

    Returns one row per label: ``(label, log_prior, loglik)`` where
    ``loglik[b] = ln((count(label, b) + α) / (tokens(label) + α·dim))``
    and ``log_prior = ln(docs(label) / docs_total)``, every value
    rounded to 9 decimals so scoring is reproducible across engines.

    Scale: ONE corpus scan; the only shuffle is the
    ``(label, bucket)`` count (map-side combined, ≤ labels×dim cells
    reach the reducers). The doc-count prior rides the same scan via
    a second tiny aggregate; the corpus total is a 1-row broadcast
    cross join, so the whole fit stays lazy.
    """
    ex = df.select(
        F.col(label_col).alias("label"),
        F.explode(_buckets(text_col, dim)).alias("__b"),
    )
    cell = ex.groupBy("label", "__b").agg(F.count("*").alias("__n"))
    per_label = cell.groupBy("label").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__n")))
        ).alias("__m"),
        F.sum("__n").alias("__tot"),
    )
    loglik = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.round(
            F.log(
                (
                    F.coalesce(
                        F.element_at("__m", i.cast("long")), F.lit(0)
                    ).cast("double")
                    + F.lit(float(alpha))
                )
                / (F.col("__tot").cast("double") + F.lit(float(alpha * dim)))
            ),
            9,
        ),
    )
    docs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("__d")
    )
    total = df.select(F.count("*").alias("__dt"))
    prior = docs.crossJoin(F.broadcast(total)).select(
        "label",
        F.round(F.log(F.col("__d") / F.col("__dt")), 9).alias("log_prior"),
    )
    return per_label.select("label", loglik.alias("loglik")).join(
        prior, "label"
    )


def nb_score(
    df: DataFrame,
    model: DataFrame | list,
    text_col: str,
    *,
    dim: int = 64,
    pred_col: str = "pred",
    score_col: str = "pred_score",
    posterior_col: str | None = None,
) -> DataFrame:
    """Score every row against a fitted NB model; append the argmax
    label and its (round-6) log-score.

    With ``posterior_col``, also append the softmax posterior of the
    winning label, ``round(1 / Σ_k exp(s_k − s_max), 6)`` — the
    CONFIDENCE a calibration audit bins. The sum folds over labels in
    ascending-label order (a fixed expression, not a shuffle), so the
    double-precision result is order-independent and the same value
    an ordered-list fold produces in SQL.

    The model is collected driver-side — O(labels × dim) values, the
    same bounded-collect contract as the k-means centroids
    (`clustering.py`) — and baked into the plan as literal arrays, so
    scoring is zero-shuffle codegen: the bucket-count vector is
    projected ONCE as a real column (``__cnts``), then each label's
    score folds ``Σ_i cnts[i]·loglik[i] + prior`` over a literal.
    Argmax tie-breaks toward the lexicographically LARGEST label
    (``array_max`` struct ordering); mirror with
    ``ORDER BY score DESC, label DESC`` in SQL.
    """
    rows = model if isinstance(model, list) else model.collect()
    rows = sorted(rows, key=lambda r: r["label"])
    # Arrow twin (r13): same integer counts from a verified
    # token/md5 twin, one vectorized batch pass instead of the
    # per-token interpreted fold (guide §4.2; 1.54 s -> ~0.1 s of the
    # sf0.1 scoring pass). The per-label score folds below are
    # unchanged, so every downstream double is identical.
    scored = df.withColumn(
        "__cnts", feature_hash_vector_arrow(text_col, dim=dim)
    )
    seq = F.sequence(F.lit(0), F.lit(dim - 1))

    def _fold(ll: list) -> "F.Column":
        return lambda acc, i: acc + F.element_at(
            "__cnts", (i + 1).cast("int")
        ) * F.element_at(F.lit(ll), (i + 1).cast("int"))

    scores = [
        F.round(
            F.aggregate(seq, F.lit(float(r["log_prior"])), _fold(list(r["loglik"]))),
            6,
        ).alias(f"__s_{k}")
        for k, r in enumerate(rows)
    ]
    scored = scored.select("*", *scores)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"__s_{k}").alias("s"),
                    F.lit(str(r["label"])).alias("l"),
                )
                for k, r in enumerate(rows)
            ]
        )
    )
    out = (
        scored.withColumn("__best", best)
        .withColumn(pred_col, F.col("__best.l"))
        .withColumn(score_col, F.col("__best.s"))
    )
    if posterior_col is not None:
        denom = F.lit(0.0)
        for k in range(len(rows)):
            denom = denom + F.exp(F.col(f"__s_{k}") - F.col(score_col))
        out = out.withColumn(posterior_col, F.round(1.0 / denom, 6))
    return out.drop(
        "__cnts", "__best", *[f"__s_{k}" for k in range(len(rows))]
    )


def dsir_weights(
    df: DataFrame,
    text_col: str,
    is_target: Column,
    *,
    dim: int = 64,
    alpha: float = 1.0,
    weight_col: str = "dsir_logratio",
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): how much more
    likely each document is under the TARGET unigram-bucket model than
    under the RAW-pool model, ``Σ_b n_b·(ln p_t(b) − ln p_r(b))``.
    Selecting the top-weighted pool documents tilts the corpus toward
    the target domain without training anything.

    One counting scan builds BOTH distributions (raw = every row,
    target = rows where ``is_target``) — a single ``dim``-cell
    aggregate collected driver-side; the per-bucket log-ratio is
    rounded to 9 decimals and baked in as a literal, and the weight
    pass is the same zero-shuffle projected-counts fold as
    :func:`nb_score` (round-6 output).
    """
    ex = df.select(
        is_target.alias("__t"), F.explode(_buckets(text_col, dim)).alias("__b")
    )
    agg = ex.groupBy("__b").agg(
        F.count("*").alias("n_all"),
        F.sum(F.col("__t").cast("long")).alias("n_tgt"),
    )
    cells = {r["__b"]: (r["n_all"], r["n_tgt"]) for r in agg.collect()}
    tot_all = sum(v[0] for v in cells.values())
    tot_tgt = sum(v[1] for v in cells.values())
    delta = [
        round(
            math.log(
                (cells.get(b, (0, 0))[1] + alpha) / (tot_tgt + alpha * dim)
            )
            - math.log(
                (cells.get(b, (0, 0))[0] + alpha) / (tot_all + alpha * dim)
            ),
            9,
        )
        for b in range(dim)
    ]
    # zip_with references the (expensive) hashed-counts tree exactly
    # ONCE — the element_at-per-dimension fold this replaces made
    # Catalyst inline the whole tokenize+md5 tree into all `dim`
    # lambda invocations after projection collapse (measured 64× the
    # md5 work at dim=64: 55 s → 1.5 s at sf0.1). Same index-ascending
    # summation order, so the rounded weight is value-identical.
    w = F.round(
        F.aggregate(
            F.zip_with(
                # Arrow twin (r13): identical integer counts, one
                # vectorized pass (guide §4.2)
                feature_hash_vector_arrow(text_col, dim=dim),
                F.lit(delta),
                lambda c, d: c * d,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    return df.withColumn(weight_col, w)


def isotonic_calibrate(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    max_points: int = 100_000,
) -> list[dict]:
    """Isotonic (PAV) calibration of a score against a 0/1 label:
    pool-adjacent-violators over the per-distinct-score positive
    rates, returning the nondecreasing step function as a list of
    ``{score_lo, score_hi, p, n}`` segments — the nonparametric
    calibrator that fixes a confident-but-wrong classifier without
    assuming Platt's sigmoid shape (pair with the reliability diagram
    in ``x5_nb_calibration``: the diagram diagnoses, this repairs).

    Scale shape: the corpus folds to one (distinct score → positives,
    count) aggregate — map-side combinable — and PAV, which is
    inherently sequential, runs driver-side on that frame: O(distinct
    scores) work and memory, the same model-sized-driver contract as
    k-means centroids. ``max_points`` guards the collect; quantize
    the score upstream (round to 3-4dp) if a raw score exceeds it —
    calibration needs no more resolution than the bins it will be
    read at."""
    pts = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).cast("double").alias("s"))
        .agg(
            F.sum(F.col(label_col).cast("long")).alias("pos"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("s")
    )
    rows = pts.collect()
    if len(rows) > max_points:
        raise ValueError(
            f"{len(rows)} distinct scores exceeds max_points="
            f"{max_points}; quantize the score column first"
        )
    # PAV: maintain a stack of blocks (pos, n, lo, hi); merge while
    # the mean would decrease left-to-right.
    stack: list[list] = []
    for r in rows:
        blk = [float(r["pos"]), float(r["n"]), r["s"], r["s"]]
        stack.append(blk)
        while (
            len(stack) >= 2
            and stack[-2][0] * stack[-1][1]
            >= stack[-1][0] * stack[-2][1]
        ):
            b = stack.pop()
            a = stack.pop()
            stack.append([a[0] + b[0], a[1] + b[1], a[2], b[3]])
    import math

    # half-away-from-zero at 6dp (p >= 0 here), matching SQL engines'
    # round() — Python's builtin round is half-EVEN, which disagrees
    # on exact ties like 1/128 = 0.0078125 and would break the full
    # DuckDB oracle this model now carries
    return [
        {
            "score_lo": lo,
            "score_hi": hi,
            "p": math.floor(pos / n * 1e6 + 0.5) / 1e6,
            "n": int(n),
        }
        for pos, n, lo, hi in stack
    ]


def isotonic_apply(
    df: DataFrame,
    model: list[dict],
    *,
    score_col: str,
    out_col: str = "calibrated",
) -> DataFrame:
    """Apply an :func:`isotonic_calibrate` step function: scores map
    to their segment's pooled rate; a score falling BETWEEN segments
    takes the next-higher (right) segment's value — the conservative
    convention for a nondecreasing calibrator — below the first
    segment its value, above the last the last segment's value. Pure
    codegen when-chain over the broadcast-literal model — no join, no
    shuffle."""
    if not model:
        raise ValueError("model must be non-empty")
    s = F.col(score_col).cast("double")
    expr = F.lit(model[-1]["p"])
    for seg in reversed(model):
        expr = F.when(s <= seg["score_hi"], F.lit(seg["p"])).otherwise(
            expr
        )
    # a NULL score has no segment — surface NULL, not the top
    # segment's rate (the otherwise-branch a bare when-chain would hit)
    return df.withColumn(
        out_col, F.when(s.isNotNull(), expr)
    )


def f1_report(
    df: DataFrame,
    *,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 plus micro and macro rows
    (round 8) — the standard classifier report card next to
    :func:`~vectordb_migrator_spark.operators.classify.nb_score`'s
    raw predictions and the chance-corrected kappa: per class,
    support, true/false positives, false negatives, P, R, F1; the
    ``__micro__`` row pools counts (equals accuracy for single-label
    classification), the ``__macro__`` row averages the per-class
    scores unweighted (the imbalance-honest summary). A class
    appearing only in predictions still gets a row (support 0,
    recall NULL).

    Scale shape: ONE (true, pred) contingency aggregate over the
    corpus — map-side combinable, classes² rows at most — then every
    metric is arithmetic over that tiny frame. NULL predictions or
    labels drop. Returns (label, support, tp, fp, fn, precision,
    recall, f1) ordered with the summary rows last."""
    t, p = F.col(true_col), F.col(pred_col)
    cm = (
        df.filter(t.isNotNull() & p.isNotNull())
        .groupBy(t.alias("__t"), p.alias("__p"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    labels = (
        cm.select(F.col("__t").alias("label"))
        .unionByName(cm.select(F.col("__p").alias("label")))
        .distinct()
    )
    tp = cm.filter(F.col("__t") == F.col("__p")).select(
        F.col("__t").alias("label"), F.col("__n").alias("tp")
    )
    support = cm.groupBy(F.col("__t").alias("label")).agg(
        F.sum("__n").cast("long").alias("support")
    )
    predicted = cm.groupBy(F.col("__p").alias("label")).agg(
        F.sum("__n").cast("long").alias("predicted")
    )
    per = (
        labels.join(tp, "label", "left")
        .join(support, "label", "left")
        .join(predicted, "label", "left")
        .select(
            "label",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("predicted", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    prec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    f1 = F.try_divide(F.lit(2) * prec * rec, prec + rec)
    per = per.select(
        "label",
        "support",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
    micro = per.agg(
        F.sum("support").cast("long").alias("support"),
        F.sum("tp").cast("long").alias("tp"),
        F.sum("fp").cast("long").alias("fp"),
        F.sum("fn").cast("long").alias("fn"),
    )
    mp = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    mr = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    micro = micro.select(
        F.lit("__micro__").alias("label"),
        "support",
        "tp",
        "fp",
        "fn",
        F.round(mp, 6).alias("precision"),
        F.round(mr, 6).alias("recall"),
        F.round(F.try_divide(F.lit(2) * mp * mr, mp + mr), 6).alias("f1"),
    )
    macro = per.agg(
        F.sum("support").cast("long").alias("support"),
        F.lit(None).cast("long").alias("tp"),
        F.lit(None).cast("long").alias("fp"),
        F.lit(None).cast("long").alias("fn"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("f1"), 6).alias("f1"),
    ).select(
        F.lit("__macro__").alias("label"),
        "support",
        "tp",
        "fp",
        "fn",
        "precision",
        "recall",
        "f1",
    )
    return per.unionByName(micro).unionByName(macro).orderBy("label")


def ece_report(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected-calibration-error reliability table (round 8): scores
    in [0, 1] bucket into ``n_bins`` equal-width bins (right-closed;
    score 0 joins the first bin); per bin, count, mean confidence,
    empirical accuracy, and the signed gap. The summary row carries
    ECE = Σ (n_b/N)·|acc_b − conf_b| (Guo et al., ICML'17) — what a
    probability-emitting quality/langid classifier must pass before
    its scores gate a corpus.

    Scale shape: one codegen bin projection + one map-side-combinable
    aggregate; confidence sums in DECIMAL so the oracle matches
    exactly. Returns (bin, n, conf, acc, gap) per non-empty bin plus
    a ``bin = -1`` ECE summary row (conf/acc NULL there, gap = ECE)."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("long")
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.ceil(s * n_bins).cast("int") - F.lit(1)
        ),
    )
    binned = df.filter(s.isNotNull() & y.isNotNull()).select(
        b.alias("bin"),
        s.cast("decimal(28,10)").alias("__s"),
        y.alias("__y"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__s").alias("__conf_sum"),
        F.sum("__y").cast("long").alias("__hits"),
    )
    conf = F.try_divide(F.col("__conf_sum").cast("double"), F.col("n"))
    acc = F.try_divide(F.col("__hits").cast("double"), F.col("n"))
    per2 = per.select(
        F.col("bin").cast("long").alias("bin"),
        "n",
        F.round(conf, 6).alias("conf"),
        F.round(acc, 6).alias("acc"),
        F.round(acc - conf, 6).alias("gap"),
        (F.abs(acc - conf) * F.col("n")).alias("__w_gap"),
    )
    from pyspark.sql import Window as W

    total = F.sum("n").over(W.partitionBy())
    ece = F.sum("__w_gap").over(W.partitionBy()) / total
    summary = (
        per2.select(F.round(ece, 6).alias("__ece"))
        .limit(1)
        .select(
            F.lit(-1).cast("long").alias("bin"),
            F.lit(None).cast("long").alias("n"),
            F.lit(None).cast("double").alias("conf"),
            F.lit(None).cast("double").alias("acc"),
            F.col("__ece").alias("gap"),
        )
    )
    return per2.drop("__w_gap").unionByName(summary).orderBy("bin")


def bradley_terry(
    contests: DataFrame,
    *,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 5,
) -> DataFrame:
    """Bradley-Terry preference-strength fit by Hunter's MM algorithm
    (Hunter 2004, "MM algorithms for generalized Bradley-Terry
    models") — the model behind preference-pair curation for reward
    modeling / RLHF data prep: given raw pairwise outcomes
    ``(winner, loser)``, estimate a strength s_i per item such that
    P(i beats j) = s_i/(s_i+s_j), via the fixed-point update

        s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j)

    (W_i = total wins, n_ij = total contests between i and j),
    renormalized to mean 1 each round. A FIXED ``iterations`` unroll
    (not convergence-tested) keeps the computation an exact dataflow
    both engines replay — the same determinism trick as the
    fixed-point Lloyd and BPE unrolls.

    Scale shape: the only corpus-sized work is the reduction of raw
    contests to ``(i, j, n)`` pair counts and ``(i, W)`` win counts —
    one map-side-combinable shuffle each. The items²-bounded
    sufficient statistic then folds to ONE row of index-aligned
    arrays, and ALL MM rounds run inside a single ``F.aggregate``
    higher-order expression over that row — zero per-iteration jobs,
    zero driver round-trips, iteration cost independent of corpus
    size (25 brands → a 625-element array fold).

    Returns ``(item, score, wins, n_contests)`` sorted by item.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = F.col(winner_col).alias("i")
    lo = F.col(loser_col).alias("j")
    directed = contests.select(w, lo).groupBy("i", "j").agg(
        F.count("*").cast("long").alias("n")
    )
    # items²-bounded sufficient statistic — materialize it ONCE. Five
    # downstream consumers (rev/matches/wins/items/m_idx) each hang
    # the full corpus-sized contest tree off a lazy `directed`
    # (measured 156 Exchange nodes in the x7_bradley_terry plan,
    # exec 4.7 s); after the checkpoint every reference reads the tiny
    # materialized pair counts (guide §3.3 plan truncation).
    directed = directed.localCheckpoint(eager=True)
    rev = directed.select(
        F.col("j").alias("i"), F.col("i").alias("j"), "n"
    )
    matches = (
        directed.unionByName(rev)
        .groupBy("i", "j")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    wins = directed.groupBy("i").agg(F.sum("n").cast("long").alias("w"))
    items = (
        matches.groupBy("i")
        .agg(F.sum("n").cast("long").alias("n_contests"))
        .join(wins, "i", "left")
        .select(
            "i",
            F.coalesce(F.col("w"), F.lit(0)).cast("double").alias("w"),
            "n_contests",
        )
    )
    # index-align: item ordinal by name (the oracle's ORDER BY i)
    idx_w = Window.orderBy("i")
    items_idx = items.select(
        "i", "w", "n_contests", (F.row_number().over(idx_w) - 1).alias("idx")
    )
    m_idx = (
        matches.join(
            items_idx.select("i", F.col("idx").alias("ia")), "i"
        )
        .join(
            items_idx.select(
                F.col("i").alias("j"), F.col("idx").alias("ja")
            ),
            "j",
        )
        .select("ia", "ja", "n")
    )
    one = (
        items_idx.agg(
            F.sort_array(
                F.collect_list(F.struct("idx", "i", "w", "n_contests"))
            ).alias("its")
        )
        .crossJoin(
            m_idx.agg(
                F.sort_array(
                    F.collect_list(F.struct("ia", "ja", "n"))
                ).alias("ms")
            )
        )
    )
    ws = F.transform(F.col("its"), lambda t: t["w"])
    s0 = F.transform(F.col("its"), lambda t: F.lit(1.0))

    def step(s):
        upd = F.transform(
            ws,
            lambda w_val, idx: w_val
            / F.aggregate(
                F.filter(F.col("ms"), lambda m: m["ia"] == idx),
                F.lit(0.0),
                lambda acc, m: acc
                + m["n"].cast("double")
                / (
                    F.element_at(s, idx + 1)
                    + F.element_at(s, m["ja"] + 1)
                ),
            ),
        )
        tot = F.aggregate(upd, F.lit(0.0), lambda a, x: a + x)
        n_it = F.size(upd).cast("double")
        return F.transform(upd, lambda x: x * n_it / tot)

    final_s = F.aggregate(
        F.sequence(F.lit(1), F.lit(iterations)),
        s0,
        lambda acc, _: step(acc),
    )
    return (
        one.select(
            F.col("its"), final_s.alias("ss")
        )
        .select(
            F.posexplode("its").alias("pos", "t"), F.col("ss")
        )
        .select(
            F.col("t.i").alias("item"),
            F.round(F.element_at("ss", F.col("pos") + 1), 6).alias(
                "score"
            ),
            F.col("t.w").cast("long").alias("wins"),
            F.col("t.n_contests").alias("n_contests"),
        )
        .orderBy("item")
    )
