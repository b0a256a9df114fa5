"""Relational extension operators Spark lacks as single built-ins:
as-of (temporal) join and gap-based sessionization.

Both are implemented as *compositions of shuffle-once DataFrame
primitives* — no UDFs, no range explosion:

- **as-of join**: union the two sides tagged by origin, ONE hash
  exchange on the join key, in-partition sort by (ts, side), then a
  running ``last(right_payload, ignorenulls)`` window carries the most
  recent right row forward to each left row. Cost = one shuffle of
  (key, ts, payload-struct) — the same shape as a groupBy, regardless
  of how many right rows precede each left row. The naive alternative
  (inequality join + max) is a per-key cross product; this is linear.
- **sessionize**: lag + running sum over the same (key, ts) window —
  one exchange, one sort, state O(1) per row.

At 100 TB both shuffle only the key, the timestamp, and the carried
payload columns; skew is bounded by the hottest single key (mitigate
upstream with key salting if one user dominates).

Reference parity note: the reference has no temporal operators at all
(SURVEY.md §2.8 "explicitly absent"); these are north-star extensions
for event/training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_micros: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward inclusive as-of join: for every left row, attach the
    most recent right row with ``right.ts <= left.ts`` and equal keys
    (NULL columns when none exists — left-outer semantics).

    ``right_cols`` limits which right columns are carried (default:
    all non-key, non-ts columns); the matched right timestamp is
    always attached as ``{right_ts}{suffix}``. ``tolerance_micros``
    drops matches older than the window (result columns become NULL).

    Ties: right rows sort before left rows at equal timestamps
    (inclusive semantics); among right rows with identical
    (key, ts) the carried payload is the last in (ts, remaining
    column) order — output any ts-level field and the result is
    deterministic regardless of which tied row wins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload_fields = [F.col(right_ts).alias(right_ts + suffix)] + [
        F.col(c).alias(c + suffix) for c in right_cols
    ]
    payload_t = right.select(F.struct(*payload_fields).alias("_p")).schema[
        0
    ].dataType

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_t).alias("_p"),
    )
    r_tagged = right.select(
        *[
            (
                F.col(c)
                if c in keys
                else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload_fields).alias("_p"),
    )

    u = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w)
    if tolerance_micros is not None:
        carried = F.when(
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(carried.getField(right_ts + suffix))
            <= F.lit(tolerance_micros),
            carried,
        )
    out = (
        u.withColumn("_match", carried)
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col("_match").getField(f.name).alias(f.name)
                for f in payload_t.fields
            ],
        )
    )
    return out


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_micros: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the
    time since the previous event of the same key exceeds ``gap``.

    Adds ``session_id`` (1-based per key, ordered by time). Session
    *boundaries* depend only on the sorted timestamp sequence, so
    session-level aggregates are deterministic even with timestamp
    ties; ``tiebreak_cols`` additionally pins per-row assignment.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = W.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = (
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev) > F.lit(gap_micros))
    ).cast("long")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(run))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_micros: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Session-level rollup: one row per (key, session) with start,
    event count, and duration — the standard sessionization product.
    Same single exchange as ``sessionize`` (the groupBy reuses the
    window's hash partitioning on the key)."""
    s = sessionize(
        df, key_col, ts_col, gap_micros=gap_micros, tiebreak_cols=tiebreak_cols
    )
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.count("*").alias("n_events"),
        # floor() on both engines — a plain double→long cast truncates
        # in Spark but rounds in DuckDB, so the oracle must floor too.
        F.floor(
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("duration_s"),
    )


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    *,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins key merge — the batch twin of the streaming
    foreachBatch idempotent upsert (streaming/incremental.py) and of
    MERGE INTO on table formats: union both sides, keep the highest
    ``version_col`` row per key (current loses ties to updates via a
    secondary source rank, matching MERGE WHEN MATCHED semantics).

    One exchange on the key columns; the window keeps O(1) state per
    key. At snapshot scale this is how CDC batches fold into a
    canonical table without a join per batch — updates ride the same
    shuffle as the snapshot.
    """
    cur = current.withColumn("_src", F.lit(0))
    upd = updates.withColumn("_src", F.lit(1))
    w = W.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    return (
        cur.unionByName(upd)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def funnel_stages(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: per user, how many of ``steps`` were
    completed IN ORDER (each step strictly later than the previous
    match) — the classic view→click→purchase product query. With
    ``within`` (e.g. ``'24 hours'``), later steps must also land
    inside the conversion window opened by the user's FIRST step-1
    event (first-touch anchoring, the standard product-analytics
    semantics — and what keeps the greedy walk equivalent to the
    successive-minima definition: both anchor at min step-1 ts).

    One exchange on the user key: events collect per user as (ts,
    type) structs, sort in-array, and a single codegen fold walks the
    funnel greedily (earliest qualifying event per step). Only (ts,
    type) pairs ride the shuffle; the fold's state is (stage, last_ts,
    deadline) per user — nothing quadratic, no self-join per step
    (the k-way-join funnel formulation reads the events table k
    times; this reads it once).

    Returns (user_col, stage) where stage ∈ [0, len(steps)].
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    steps_lit = F.lit(steps)
    far_future = F.lit("9999-01-01").cast("timestamp")
    evs = (
        df.groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                        F.col(type_col).alias("et")))
            ).alias("evs")
        )
    )
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit("1900-01-01").cast("timestamp").alias("last_ts"),
        far_future.alias("deadline"),
    )
    deadline_for = (
        (lambda ts: ts + F.expr(f"INTERVAL {within}"))
        if within is not None
        else (lambda ts: far_future)
    )
    walk = F.aggregate(
        F.col("evs"),
        init,
        lambda acc, e: F.when(
            (acc.getField("stage") < k)
            & (e.getField("et")
               == F.element_at(steps_lit, acc.getField("stage") + 1))
            & (
                (acc.getField("stage") == 0)
                | (
                    (e.getField("ts") > acc.getField("last_ts"))
                    & (e.getField("ts") <= acc.getField("deadline"))
                )
            ),
            F.struct(
                (acc.getField("stage") + 1).alias("stage"),
                e.getField("ts").alias("last_ts"),
                F.when(
                    acc.getField("stage") == 0, deadline_for(e.getField("ts"))
                ).otherwise(acc.getField("deadline")).alias("deadline"),
            ),
        ).otherwise(acc),
    )
    return evs.select(
        F.col(user_col), walk.getField("stage").alias("stage")
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each cohort × weeks-since-cohort, the count and
    fraction of the cohort active that week.

    Shape: one exchange on the user key to find first-activity weeks,
    one distinct over (user, week) — activity collapses to at most one
    row per user-week BEFORE the cohort join, so the join input is
    bounded by users × weeks, not by raw event volume. Cohort sizes
    broadcast back (one row per cohort week).

    Returns (cohort, week_n, n_active, retention), cohort formatted
    ``yyyy-MM-dd`` (Monday of the ISO week).
    """
    wk = F.date_trunc("week", F.col(ts_col))
    firsts = df.groupBy(user_col).agg(F.min(wk).alias("cohort_ts"))
    activity = df.select(F.col(user_col), wk.alias("wk_ts")).distinct()
    sizes = firsts.groupBy("cohort_ts").agg(F.count("*").alias("cohort_size"))
    return (
        activity.join(firsts, user_col)
        .groupBy(
            "cohort_ts",
            (F.datediff(F.col("wk_ts"), F.col("cohort_ts")) / 7)
            .cast("long")
            .alias("week_n"),
        )
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_ts")
        .select(
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort"),
            "week_n",
            "n_active",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
    )


def scd2_history(
    df: DataFrame,
    *,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log:
    collapse consecutive rows whose tracked attributes did not change,
    then emit one validity interval per surviving version —
    ``valid_from`` (the change's timestamp), ``valid_to`` (the next
    change's timestamp, NULL while current), ``version`` (1-based per
    key), ``is_current``.

    The warehouse-standard dimension-tracking operator the reference's
    latest-wins ``merge_upsert`` cannot express (that keeps only the
    final state; this keeps the full timeline for as-of joins).

    Scale design: both windows (the lag change-detector and the lead
    interval-closer) share one ``(key, ts, tiebreak)`` partitioning and
    sort, so Catalyst plans a single exchange; the no-op-change filter
    runs between them without re-shuffling. State per key is one row —
    no skew beyond the key's own change count.
    """
    w = W.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    is_first = F.lag(F.col(ts_col)).over(w).isNull()
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    chg = (
        df.withColumn("__keep", is_first | changed)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
    return (
        chg.select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(F.col(ts_col)).over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Interval join: each fact row pairs with every interval where
    ``lo <= value < hi`` (intervals may overlap — one fact can match
    several). Broadcast form: correct whenever the interval table is
    dim-sized; Spark plans a BroadcastNestedLoopJoin, which is fine for
    a small broadcast side but scans every interval per row — for a
    large interval table use :func:`range_join_bucketed`."""
    cond = (facts[value_col] >= intervals[lo_col]) & (
        facts[value_col] < intervals[hi_col]
    )
    return facts.join(F.broadcast(intervals), cond, how)


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    cell_width: float = 1.0,
) -> DataFrame:
    """Interval join as a hash EQUI-join — the big-table scale path.

    The number line is cut into grid cells of ``cell_width``; each
    interval explodes into the cells it touches, each fact lands in
    exactly ONE cell (``floor(value / w)``), and the join runs on the
    cell id with the exact ``lo <= value < hi`` predicate as a
    residual filter. This turns the O(facts × intervals) nested loop
    into a shuffled hash join whose cost is O(facts + intervals ×
    cells-per-interval): both sides partition by cell, skew follows
    the value distribution (tune ``cell_width`` toward the median
    interval width). No dedup is needed — a (fact, interval) pair
    meets in exactly the fact's one cell."""
    cell = F.floor(F.col(value_col) / cell_width).cast("long").alias("__cell")
    f = facts.withColumn("__cell", cell)
    i = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / cell_width).cast("long"),
                F.floor(F.col(hi_col) / cell_width).cast("long"),
            )
        ),
    )
    return (
        f.join(i, "__cell")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__cell")
    )


def transition_matrix(
    df: DataFrame,
    *,
    unit_col: str,
    state_col: str,
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-unit state
    sequences: order each unit's events, pair every state with its
    successor (lag-1), and report per (from_state, to_state) the count
    and row-normalized probability — the user-journey /
    status-lifecycle model behind "what do users do after a click"
    and anomaly screens on process flows (a transition that never
    used to happen is a bug or fraud signal).

    One window pass partitioned by unit (the partition IS the unit's
    sequence, so the sort is per-unit, never global), folding to an
    s×s count frame however large the event log. Ties in
    ``order_col`` are broken by ``tiebreak_col`` (pass a unique id
    for reproducible sequences — timestamp ties are real at event
    scale). A unit's last event has no successor and drops out."""
    from pyspark.sql import Window

    order = [F.col(order_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(unit_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(unit_col),
            F.col(state_col).alias("from_state"),
            *([F.col(order_col)] + (
                [F.col(tiebreak_col)] if tiebreak_col else []
            )),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .filter(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = Window.partitionBy("from_state")
    return (
        counts.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(tot), 6)
        )
        .orderBy("from_state", "to_state")
    )


def pareto_classes(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    bounds: tuple[float, float] = (0.8, 0.95),
    labels: tuple[str, str, str] = ("A", "B", "C"),
) -> DataFrame:
    """ABC / Pareto classification: rank keys by total value, take the
    running share of the grand total, and label the keys covering the
    first ``bounds[0]`` of value A, up to ``bounds[1]`` B, the tail C
    — the 80/20 analysis behind inventory tiers, hot-content caching
    decisions, and "which 5% of sources are 80% of tokens". A key is
    classed by the cumulative share INCLUDING itself; ties in value
    break by key for reproducibility.

    One grouped aggregate (corpus → one row per key, exact decimal
    sums), then windows over the per-key frame — the only global sort
    is over keys, not rows. Returns (key, total, cum_share, class)."""
    per = df.groupBy(F.col(key_col)).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__s")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("__s"), key_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    classed = (
        per.withColumn("__cum", F.sum("__s").over(w))
        .withColumn("__tot", F.sum("__s").over(tot))
        .select(
            key_col,
            F.col("__s").cast("double").alias("total"),
            F.round(
                F.col("__cum").cast("double")
                / F.col("__tot").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .withColumn(
            "class",
            F.when(F.col("cum_share") <= bounds[0], labels[0])
            .when(F.col("cum_share") <= bounds[1], labels[1])
            .otherwise(labels[2]),
        )
    )
    return classed.orderBy(F.desc("total"), key_col)


def attribution_credits(
    conversions: DataFrame,
    touches: DataFrame,
    *,
    unit_col: str,
    conv_ts_col: str,
    conv_id_col: str,
    touch_ts_col: str,
    touch_type_col: str,
    touch_id_col: str,
    lookback_s: int,
) -> DataFrame:
    """Multi-touch attribution: for every conversion, the unit's touch
    events inside the lookback window get credit under three standard
    models at once — last-touch (1.0 to the latest touch),
    first-touch (earliest), and linear (1/k each) — reported as
    credited conversions per (model, touch_type). The marketing/
    product-analytics question "which interaction actually drives
    purchases", answered three ways so the disagreement between
    models is itself visible (last-touch over-credits the bottom of
    the funnel; the spread is the funnel's shape).

    Scale shape: conversions and touches are two filtered projections
    of the same log; they meet in ONE equi-join on the unit key (the
    join AQE handles like any fact-fact join — salt the unit key if
    one user is pathological) with the time window as a post-join
    filter; ranks are per-conversion windows (tiny partitions); the
    three models share the ranked frame, so the join is paid once.
    Conversions with no in-window touch are excluded (count them
    upstream against the conversion total)."""
    from pyspark.sql import Window

    pairs = (
        conversions.select(
            F.col(unit_col).alias("__u"),
            F.col(conv_ts_col).alias("__cts"),
            F.col(conv_id_col).alias("__cid"),
        )
        .join(
            touches.select(
                F.col(unit_col).alias("__u"),
                F.col(touch_ts_col).alias("__tts"),
                F.col(touch_type_col).alias("touch_type"),
                F.col(touch_id_col).alias("__tid"),
            ),
            "__u",
        )
        .filter(
            (F.col("__tts") <= F.col("__cts"))
            & (
                F.col("__tts").cast("double")
                > F.col("__cts").cast("double") - lookback_s
            )
        )
    )
    w_last = Window.partitionBy("__cid").orderBy(
        F.desc("__tts"), F.desc("__tid")
    )
    w_first = Window.partitionBy("__cid").orderBy("__tts", "__tid")
    w_all = Window.partitionBy("__cid")
    ranked = (
        pairs.withColumn("__rl", F.row_number().over(w_last))
        .withColumn("__rf", F.row_number().over(w_first))
        .withColumn("__k", F.count(F.lit(1)).over(w_all))
    )
    models = [
        ("first_touch", F.when(F.col("__rf") == 1, 1.0).otherwise(0.0)),
        ("last_touch", F.when(F.col("__rl") == 1, 1.0).otherwise(0.0)),
        ("linear", F.lit(1.0) / F.col("__k")),
    ]
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("model"), c.alias("credit")
                )
                for m, c in models
            ]
        )
    ).alias("r")
    return (
        ranked.select("touch_type", rows)
        .select("touch_type", "r.model", "r.credit")
        .groupBy("model", "touch_type")
        .agg(F.round(F.sum("credit"), 6).alias("credited"))
        .orderBy("model", "touch_type")
    )


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_count: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Market-basket association rules over (basket, item) pairs:
    for every co-occurring item pair, support, both directional
    confidences, and lift = N·n_ab/(n_a·n_b) — the
    frequently-bought-together / related-content primitive, with the
    ``min_count`` support floor doing what it does in every Apriori
    descendant: killing the noise pairs before they dominate.

    Scale shape: baskets dedup to (basket, item) rows, pairs generate
    INSIDE each basket's collected item list (one groupBy shuffle;
    pair count bounded by basket size squared — baskets are small by
    nature, and a pathological mega-basket should be capped upstream),
    then one pair-count aggregate, a broadcast join against the
    (item, count) frame for the marginals, and a top-k by lift via
    TakeOrderedAndProject — never a global sort."""
    base = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_baskets = base.select("__b").distinct().count()
    items = base.groupBy(F.col("__i")).agg(
        F.count(F.lit(1)).cast("long").alias("n_i")
    )
    buckets = base.groupBy("__b").agg(
        F.array_sort(F.collect_list("__i")).alias("items")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("items"),
            lambda a: F.filter(
                F.transform(
                    F.col("items"),
                    lambda b: F.when(
                        a < b,
                        F.struct(a.alias("ia"), b.alias("ib")),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.ia").alias("item_a"), F.col("p.ib").alias("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    ia = items.select(
        F.col("__i").alias("item_a"), F.col("n_i").alias("n_a")
    )
    ib = items.select(
        F.col("__i").alias("item_b"), F.col("n_i").alias("n_b")
    )
    scored = (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(F.col("n_ab") / F.lit(float(n_baskets)), 6).alias(
                "support"
            ),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_b"),
            F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_a"),
            F.round(
                F.lit(float(n_baskets))
                * F.col("n_ab")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), "item_a", "item_b"
    ).limit(top_k)


def rfm_segments(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the
    classic lifecycle readout: per user, days since last event,
    event count, and value sum, each scored into ``n_tiles``
    quantile tiles (5 = freshest / most frequent / highest spend),
    then rolled up per (r, f, m) cell with user count and cell
    means. Marketing's "champions / at-risk / hibernating" grid is a
    relabeling of these cells.

    Determinism: every ntile orders by (metric, user) — a total
    order — so tile assignment is engine-reproducible. Scale shape:
    events fold to ONE per-user aggregate (map-side combinable);
    the ntile windows then run on the user frame, not events. The
    single-partition global sort of the user frame is the honest
    cost of exact quantile tiles at this size — at a
    billions-of-users scale swap ntile for broadcast percentile
    boundaries (the ``quality_tiers_scalable`` pattern).

    Returns (r_score, f_score, m_score, users, avg_recency_days,
    avg_frequency, avg_monetary)."""
    from pyspark.sql import Window as W

    base = df.filter(F.col(user_col).isNotNull())
    anchor = base.agg(
        F.max(F.date_trunc("day", F.col(ts_col))).alias("__mx")
    )
    per_user = (
        base.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.max(F.date_trunc("day", F.col(ts_col))).alias("__last"),
            F.count(F.lit(1)).cast("long").alias("f"),
            F.round(
                F.sum(F.round(F.col(value_col), 6).cast("decimal(18,6)")),
                6,
            ).cast("double").alias("m"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "u",
            F.datediff(F.col("__mx"), F.col("__last"))
            .cast("long")
            .alias("r"),
            "f",
            "m",
        )
    )
    scored = per_user.select(
        "u",
        "r",
        "f",
        "m",
        F.ntile(n_tiles)
        .over(W.orderBy(F.desc("r"), F.asc("u")))
        .alias("r_score"),
        F.ntile(n_tiles)
        .over(W.orderBy(F.asc("f"), F.asc("u")))
        .alias("f_score"),
        F.ntile(n_tiles)
        .over(W.orderBy(F.asc("m"), F.asc("u")))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("users"),
            F.round(F.avg("r"), 6).alias("avg_recency_days"),
            F.round(F.avg("f"), 6).alias("avg_frequency"),
            F.round(F.avg("m"), 6).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
