"""Time-series regularization: resample an event stream onto a dense
per-key hourly grid, filling silent hours with zeros.

Dashboards/feature pipelines need "no data" to be an explicit 0, not a
missing row. Shape: one tiny bounds aggregate (2 timestamps) →
``sequence()`` expands the hour axis driver-free → cross join with the
distinct key set (both sides tiny → broadcast) → left join the real
hourly aggregate. The only full-data pass is the hourly groupBy; the
grid construction is O(hours × keys), independent of event volume —
at 100 TB of events the grid is still a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_fill_hourly(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Dense (hour × key) grid with event counts, zero-filled.

    Returns columns: ``hour`` (timestamp, truncated), ``key_col``,
    ``n`` (long, 0 where the source had no events).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        df.select(hour.alias("hour"), F.col(key_col))
        .groupBy("hour", key_col)
        .agg(F.count("*").alias("n"))
    )
    bounds = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("mn"),
        F.date_trunc("hour", F.max(ts_col)).alias("mx"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hour")
    )
    keys = df.select(key_col).distinct()
    grid = hours.crossJoin(F.broadcast(keys))
    return (
        grid.join(hourly, ["hour", key_col], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
    )


def zscore_anomalies(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score outliers: flag rows whose value sits more than
    ``threshold`` sample standard deviations from their key's mean.

    Two-pass shape on purpose: a map-side-combinable
    ``groupBy(key).agg(avg, stddev)`` produces a key-cardinality-sized
    stats table that broadcasts back into the scan. The tempting
    single-pass alternative — an unbounded ``Window.partitionBy(key)``
    — funnels every row of a key through one task, which is exactly the
    skew that kills low-cardinality keys at 100 TB; two cheap scans
    with a broadcast join beat one skewed exchange.

    z is rounded before thresholding so the kept set is stable across
    engines computing the aggregates in different summation orders.
    """
    mu, sd = f"__mu_{value_col}", f"__sd_{value_col}"
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias(mu), F.stddev_samp(value_col).alias(sd)
    )
    z = F.round((F.col(value_col) - F.col(mu)) / F.col(sd), 6)
    return (
        df.join(F.broadcast(stats), key_col)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .drop(mu, sd)
    )


def rolling_correlation(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    key_a: str,
    key_b: str,
    window_hours: int = 24,
) -> DataFrame:
    """Rolling Pearson correlation between two keys' hourly series —
    the co-movement diagnostic (do purchases track clicks this day?).

    Shape: ONE hourly pre-aggregation shuffle (map-side combinable)
    collapses the raw events to (hour, a, b) rows — the rolling frame
    then slides over the TINY hourly series, never the raw events, so
    the window state is window_hours rows per partition regardless of
    event volume. ``corr`` runs as a built-in window aggregate over a
    range frame; rows with fewer than 2 paired hours yield NULL (the
    aggregate's own contract).

    Returns (hour, a, b, corr) rounded to 6.
    """
    from pyspark.sql import Window as W

    hourly = (
        df.filter(F.col(key_col).isin([key_a, key_b]))
        .groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
            F.col(key_col).alias("k"),
        )
        .agg(F.sum(value_col).alias("v"))
    )
    wide = hourly.groupBy("hour").pivot("k", [key_a, key_b]).agg(
        F.first("v")
    ).select(
        "hour",
        F.coalesce(F.col(key_a), F.lit(0.0)).alias("a"),
        F.coalesce(F.col(key_b), F.lit(0.0)).alias("b"),
    )
    frame = (
        W.orderBy(F.col("hour").cast("long"))
        .rangeBetween(-(window_hours - 1) * 3600, 0)
    )
    # corr spelled as covar/(sa*sb) with try_divide: a zero-variance
    # window yields NULL (ANSI-mode F.corr would throw DIVIDE_BY_ZERO;
    # NULL is also what SQL engines' corr returns there)
    corr = F.try_divide(
        F.covar_samp("a", "b").over(frame),
        F.stddev_samp("a").over(frame) * F.stddev_samp("b").over(frame),
    )
    return wide.select("hour", "a", "b", F.round(corr, 6).alias("corr"))


def seasonal_zscore_anomalies(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Seasonality-aware z-score outliers: the baseline is the
    (key, hour-of-day) cell, not the key's global stats — a value
    that is normal at noon but wild at 3am gets flagged, and a key's
    daily rhythm stops reading as anomalies (the failure mode of
    :func:`zscore_anomalies` on strongly diurnal series).

    Same 100 TB shape as the global version: one map-side-combinable
    ``groupBy(key, hour)`` produces a 24×keys-row stats table that
    broadcasts back into the scan — never a per-key window funnel.
    Cells with undefined deviation (a single sample, or zero
    variance) yield NULL z and are not flagged. z is rounded before
    thresholding so the kept set is engine-stable.
    """
    hour = F.hour(F.col(ts_col))
    stats = (
        df.groupBy(F.col(key_col), hour.alias("__hod"))
        .agg(
            F.avg(value_col).alias("__mu"),
            F.stddev_samp(value_col).alias("__sd"),
        )
    )
    z = F.round(
        F.try_divide(F.col(value_col) - F.col("__mu"), F.col("__sd")), 6
    )
    return (
        df.withColumn("__hod", hour)
        .join(F.broadcast(stats), [key_col, "__hod"])
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .drop("__mu", "__sd", "__hod")
    )


def cusum_changepoints(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """CUSUM mean-shift detection over the daily series: standardized
    cumulative deviation from the global mean, the classic sequential
    changepoint statistic (Page 1954) — where |CUSUM| peaks is the
    most likely single shift point, and an excursion beyond
    ``threshold`` flags that a shift happened at all.

    Shape: ONE map-side-combined daily aggregate over the log, then
    every window runs on the day-sized frame (thousands of rows
    however big the corpus — the STL/EWMA argument). The cumulative
    sum runs in day order in every engine, so rounding the daily mean
    and the statistic to 6 makes the output engine-exact.

    Returns (day string, v, cusum, is_peak, exceeds) ordered by day;
    ``is_peak`` marks exactly one row (|cusum| max, earliest day on
    ties)."""
    daily = df.groupBy(
        F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.round(F.avg(value_col), 6).alias("v"))
    return cusum_from_daily(daily, threshold=threshold)


def cusum_from_daily(
    daily: DataFrame,
    *,
    threshold: float = 3.0,
) -> DataFrame:
    """The CUSUM statistic from an already-built (day, v) frame — the
    shared read path for the batch operator and the streaming store
    (``streaming.incremental.changepoints_over`` merges per-batch
    partials into exactly this frame). Everything here runs on the
    day-sized series."""
    from pyspark.sql import Window as W

    stats = daily.agg(
        F.avg("v").alias("__mu"), F.stddev_pop("v").alias("__sd")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn(
            "cusum",
            F.round(
                F.sum(
                    F.try_divide(F.col("v") - F.col("__mu"), F.col("__sd"))
                ).over(w),
                6,
            ),
        )
        .drop("__mu", "__sd")
    )
    rk = F.row_number().over(W.orderBy(F.abs(F.col("cusum")).desc(), "day"))
    return (
        c.withColumn("is_peak", F.when(rk == 1, 1).otherwise(0).cast("long"))
        .withColumn(
            "exceeds",
            (F.abs(F.col("cusum")) > threshold).cast("long"),
        )
        .orderBy("day")
    )


def mad_outliers(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Median-absolute-deviation outliers — the ROBUST twin of
    :func:`zscore_anomalies`: a handful of extreme rows inflates a
    mean/stddev gate until it stops firing (masking), while the
    median/MAD pair is 50%-breakdown robust. Flags rows whose modified
    z-score ``0.6745·(x − med)/MAD`` (Iglewicz & Hoaglin) exceeds
    ``threshold`` (3.5 is their recommended cut).

    Shape: two grouped EXACT percentiles (median, then MAD over the
    deviations) broadcast back over the scan — the zscore two-pass
    pattern with one extra pass. Exact percentiles sort per key; at
    100 TB swap ``percentile`` for ``percentile_approx`` (same plan
    shape, bounded memory) — exact is kept here for the engine-exact
    oracle. Keys where MAD = 0 (a majority-constant key) yield NULL
    scores and are not flagged — an infinite-z convention would flag
    every non-modal row, which is never the intent of an outlier gate.
    The score is rounded to 6 BEFORE thresholding so the kept set is
    engine-stable."""
    med_c, mad_c = f"__med_{value_col}", f"__mad_{value_col}"
    med = df.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias(med_c)
    )
    with_med = df.join(F.broadcast(med), key_col)
    mad = with_med.groupBy(key_col).agg(
        F.expr(f"percentile(abs({value_col} - {med_c}), 0.5)").alias(mad_c)
    )
    # try_divide: MAD = 0 must yield NULL (not an ANSI
    # DIVIDE_BY_ZERO abort — one constant key would kill the job)
    rz = F.round(
        F.lit(0.6745)
        * F.try_divide(F.col(value_col) - F.col(med_c), F.col(mad_c)),
        6,
    )
    return (
        with_med.join(F.broadcast(mad), key_col)
        .withColumn("rz", rz)
        .filter(F.abs(F.col("rz")) >= threshold)
        .withColumn("med", F.round(F.col(med_c), 6))
        .withColumn("mad", F.round(F.col(mad_c), 6))
        .drop(med_c, mad_c)
    )


def seasonal_naive_backtest(
    daily: DataFrame,
    *,
    date_col: str = "day",
    value_col: str = "v",
    group_cols: list[str] | None = None,
    season: int = 7,
    horizon: int = 7,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (ŷ_t = y_{t−season})
    over the last ``horizon`` points of each series, scored against
    the naive-1 baseline (ŷ_t = y_{t−1}): per group, MAE / RMSE /
    sMAPE of the seasonal forecast plus the ``skill`` ratio
    mae_seasonal / mae_naive (< 1 ⇒ the seasonal pattern is real and
    worth exploiting; ≥ 1 ⇒ a dashboard "forecast" is beating nothing).
    The honest pre-model question for any per-key volume forecast —
    and the monitor that catches a series whose weekly cycle silently
    died.

    Runs on an already-aggregated daily frame (thousands of rows
    however big the raw log — aggregate first, then model), so the
    lag windows sort per-group series, never the corpus. Points whose
    lag falls before the series start are excluded from scoring;
    sMAPE terms where |f|+|a| = 0 are skipped via try_divide."""
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    w = Window.partitionBy(*gcols).orderBy(date_col)
    scored = (
        daily.withColumn("__fs", F.lag(value_col, season).over(w))
        .withColumn("__fn", F.lag(value_col, 1).over(w))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*gcols).orderBy(F.desc(date_col))
            ),
        )
        .filter(
            (F.col("__rn") <= horizon)
            & F.col("__fs").isNotNull()
            & F.col("__fn").isNotNull()
        )
    )
    a, fs, fn = F.col(value_col), F.col("__fs"), F.col("__fn")
    out = scored.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.round(F.avg(F.abs(fs - a)), 6).alias("mae"),
        F.round(F.sqrt(F.avg((fs - a) * (fs - a))), 6).alias("rmse"),
        F.round(
            F.avg(
                F.try_divide(
                    F.lit(2.0) * F.abs(fs - a), F.abs(fs) + F.abs(a)
                )
            ),
            6,
        ).alias("smape"),
        F.round(
            F.try_divide(F.avg(F.abs(fs - a)), F.avg(F.abs(fn - a))), 6
        ).alias("skill"),
    )
    return out.orderBy(*gcols) if gcols else out


def theil_sen_trend(
    daily: DataFrame,
    *,
    date_col: str = "day",
    value_col: str = "v",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Theil–Sen robust trend per series: slope = exact median of all
    pairwise slopes (v_j − v_i)/(t_j − t_i), intercept = median of
    (v_i − slope·t_i) — the estimator that shrugs off the outlier days
    a least-squares fit chases (breakdown point 29%). Time enters as
    integer days since epoch, so the slope is per-day in value units.

    O(n²) pairs per series, which is exactly why this operator takes
    the DAILY frame: model AFTER the rollup, and a year of daily
    points is ~66k pairs per key — trivial — while the raw event log
    never self-joins. The pair join is a per-group equi-join (one
    exchange on the group key); medians are exact interpolated
    percentiles, engine-reproducible."""
    gcols = list(group_cols or [])
    t = F.datediff(F.col(date_col), F.lit("1970-01-01")).cast("double")
    base = daily.select(
        *gcols, t.alias("__t"), F.col(value_col).cast("double").alias("__v")
    )
    a = base.select(
        *gcols, F.col("__t").alias("__ta"), F.col("__v").alias("__va")
    )
    b = base.select(
        *gcols, F.col("__t").alias("__tb"), F.col("__v").alias("__vb")
    )
    pairs = (
        (a.join(b, gcols) if gcols else a.crossJoin(b))
        .filter(F.col("__tb") > F.col("__ta"))
        .select(
            *gcols,
            (
                (F.col("__vb") - F.col("__va"))
                / (F.col("__tb") - F.col("__ta"))
            ).alias("__s"),
        )
    )
    slope = pairs.groupBy(*gcols).agg(
        F.expr("percentile(__s, 0.5)").alias("__slope")
    )
    withs = (
        base.join(F.broadcast(slope), gcols)
        if gcols
        else base.crossJoin(F.broadcast(slope))
    )
    out = withs.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max("__slope"), 6).alias("slope_per_day"),
        F.round(
            F.expr("percentile(__v - __slope * __t, 0.5)"), 6
        ).alias("intercept"),
    )
    return out.orderBy(*gcols) if gcols else out


def kaplan_meier(
    durations: DataFrame,
    *,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimator over a unit-level frame of
    (duration, event) rows — event=1 is an observed terminal event
    (churn, failure), event=0 a right-censored unit (still active
    when observation ended). Returns one row per distinct event time:
    n_at_risk, n_events, n_censored, and the product-limit survival
    Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) — the time-to-churn / retention curve
    computed the statistically honest way (plain "fraction still
    active after t" is biased the moment observation windows differ).

    Scale shape: the corpus folds to one row per DISTINCT duration
    (counts of events/censorings per time — map-side combinable);
    n_at_risk is a reversed cumulative sum and the product-limit runs
    as exp(Σ ln(1 − d/n)) — windows over the distinct-time frame,
    thousands of rows however many units. Times with d = n (everyone
    left) drive Ŝ to exactly 0 via a guard rather than ln(0)."""
    from pyspark.sql import Window

    d = F.col(duration_col).cast("double")
    per = durations.groupBy(d.alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("d"),
        F.sum((1 - F.col(event_col).cast("int")).cast("long")).alias(
            "c"
        ),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_fwd = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = per.withColumn(
        "n", F.sum(F.col("d") + F.col("c")).over(w_rev)
    )
    # survival: cumulative product over event times only; exact-zero
    # guard for d = n (log undefined)
    frac = 1 - F.col("d").cast("double") / F.col("n")
    lg = F.when(F.col("d") > 0, F.log(F.when(frac > 0, frac))).otherwise(
        F.lit(0.0)
    )
    km = (
        at_risk.withColumn("__lg", lg)
        .withColumn(
            "__zero",
            F.max((F.col("d") == F.col("n")).cast("int")).over(w_fwd),
        )
        .withColumn("__ls", F.sum("__lg").over(w_fwd))
        .select(
            F.col("t"),
            F.col("n").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("n_censored"),
            F.round(
                F.when(F.col("__zero") == 1, 0.0).otherwise(
                    F.exp("__ls")
                ),
                6,
            ).alias("survival"),
        )
    )
    return km.filter(F.col("n_events") > 0).orderBy("t")


def ols_trend(
    df: DataFrame,
    *,
    t_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-series ordinary-least-squares trend — slope, intercept,
    and R² from the five classic moments (n, Σt, Σv, Σt², Σtv, Σv²)
    in ONE map-side-combinable aggregate: the efficiency/exactness
    complement of :func:`theil_sen_trend` (which buys outlier
    robustness with a pairwise-slope median). Reading both is the
    diagnostic: OLS ≈ Theil–Sen → trust the trend; OLS dragged away →
    outlier days are steering it.

    Inputs round to 6dp and the moments sum as exact decimals
    (the :func:`~..scale.corr_matrix` contract), so slope/intercept/
    R² are bit-reproducible across engines and partition orders.
    Series with < 2 points or zero time-variance report NULLs.
    ``t_col`` must be numeric (e.g. integer day index)."""
    gcols = list(group_cols or [])
    proj = df.select(
        *gcols,
        F.col(t_col).cast("double").alias("__t"),
        F.round(F.col(value_col).cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("__v"),
    ).filter(F.col("__t").isNotNull() & F.col("__v").isNotNull())
    t6 = F.col("__t").cast("decimal(18,6)")
    m = proj.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(t6).cast("decimal(38,6)").alias("st"),
        F.sum("__v").cast("decimal(38,6)").alias("sv"),
        F.sum(t6 * t6).cast("decimal(38,12)").alias("stt"),
        F.sum(t6 * F.col("__v")).cast("decimal(38,12)").alias("stv"),
        F.sum(F.col("__v") * F.col("__v"))
        .cast("decimal(38,12)")
        .alias("svv"),
    )
    n = F.col("n").cast("double")
    st, sv = F.col("st").cast("double"), F.col("sv").cast("double")
    stt = F.col("stt").cast("double")
    stv = F.col("stv").cast("double")
    svv = F.col("svv").cast("double")
    var_t = n * stt - st * st
    cov = n * stv - st * sv
    var_v = n * svv - sv * sv
    slope = F.try_divide(cov, var_t)
    intercept = (sv - slope * st) / n
    r2 = F.try_divide(cov * cov, var_t * var_v)
    guard = (F.col("n") >= 2) & (var_t != 0)
    return m.select(
        *gcols,
        "n",
        F.round(F.when(guard, slope), 6).alias("slope"),
        F.round(F.when(guard, intercept), 6).alias("intercept"),
        F.round(F.when(guard, r2), 6).alias("r2"),
    ).orderBy(*gcols) if gcols else m.select(
        "n",
        F.round(F.when(guard, slope), 6).alias("slope"),
        F.round(F.when(guard, intercept), 6).alias("intercept"),
        F.round(F.when(guard, r2), 6).alias("r2"),
    )


def anomaly_ensemble(
    daily: DataFrame,
    *,
    z_threshold: float = 2.0,
    mad_threshold: float = 3.5,
    cusum_threshold: float = 3.0,
) -> DataFrame:
    """Ensemble anomaly vote over a (day, v) daily series: three
    detectors with DISJOINT blind spots — z-score (sharp spikes, but
    maskable: extreme days inflate the stddev), MAD modified-z
    (50%-breakdown robust to exactly that masking), CUSUM (sustained
    small shifts neither point detector sees) — each votes per day,
    and ``flagged`` requires >= 2 votes: single-detector noise does
    not page anyone, two independent mechanisms agreeing does. This
    is the composition rule monitoring stacks converge on, here as
    one operator with an exact oracle.

    Everything runs on the day-sized frame (the caller folds the
    corpus to daily means first — the shared pre-aggregation every
    X13 statistic uses); scores round to 6 before thresholding so
    the vote set is engine-stable; MAD = 0 and sd = 0 yield NULL
    scores (no vote), never an ANSI abort."""
    from pyspark.sql import Window as W

    stats = daily.agg(
        F.avg("v").alias("__mu"),
        F.stddev_pop("v").alias("__sd"),
        F.expr("percentile(v, 0.5)").alias("__med"),
    )
    with_stats = daily.crossJoin(F.broadcast(stats))
    mad = with_stats.agg(
        F.expr("percentile(abs(v - __med), 0.5)").alias("__mad")
    )
    base = with_stats.crossJoin(F.broadcast(mad))
    z = F.round(F.try_divide(F.col("v") - F.col("__mu"), F.col("__sd")), 6)
    rz = F.round(
        F.lit(0.6745)
        * F.try_divide(F.col("v") - F.col("__med"), F.col("__mad")),
        6,
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cusum = F.round(
        F.sum(
            F.try_divide(F.col("v") - F.col("__mu"), F.col("__sd"))
        ).over(w),
        6,
    )
    scored = base.select(
        "day",
        "v",
        (F.abs(z) > F.lit(z_threshold)).cast("long").alias("z_flag"),
        (F.abs(rz) >= F.lit(mad_threshold)).cast("long").alias("mad_flag"),
        (F.abs(cusum) > F.lit(cusum_threshold))
        .cast("long")
        .alias("cusum_flag"),
    )
    votes = (
        F.coalesce(F.col("z_flag"), F.lit(0))
        + F.coalesce(F.col("mad_flag"), F.lit(0))
        + F.coalesce(F.col("cusum_flag"), F.lit(0))
    )
    return scored.select(
        "day",
        "v",
        F.coalesce("z_flag", F.lit(0)).cast("long").alias("z_flag"),
        F.coalesce("mad_flag", F.lit(0)).cast("long").alias("mad_flag"),
        F.coalesce("cusum_flag", F.lit(0)).cast("long").alias("cusum_flag"),
        votes.cast("long").alias("votes"),
        (votes >= 2).alias("flagged"),
    ).orderBy("day")


def mix_decomposition(
    df: DataFrame,
    *,
    segment_col: str,
    period_col: str,
    value_col: str,
    period_a,
    period_b,
) -> DataFrame:
    """Period-over-period volume/rate decomposition per segment — the
    canonical FP&A "why did the total move" answer: for each segment,
    ΔT = n_b·r_b − n_a·r_a splits EXACTLY into volume effect
    (Δn)·r_a, rate effect n_a·(Δr), and interaction (Δn)·(Δr) — which
    tells you whether a metric moved because a segment GREW, because
    its per-event value shifted, or both at once; the per-segment
    rows sum to the total change, so nothing is left unattributed.
    (``attribution_credits`` answers "which touchpoint", Adtributor
    "which dimension"; this answers "volume or rate".)

    Exactness: per-period sums fold as round-6 decimals; rates and
    effects round to 6 — hash-stable. Segments absent from a period
    enter with n = 0, r = 0 (pure volume effect). ONE
    (segment, period) aggregate collapses the corpus; all algebra
    runs on the segments-sized frame."""
    per = (
        df.filter(F.col(period_col).isin([period_a, period_b]))
        .groupBy(
            F.col(segment_col).alias("segment"),
            F.col(period_col).alias("__p"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(
                F.round(F.col(value_col), 6).cast("decimal(18,6)")
            ).alias("__s"),
        )
    )
    wide = per.groupBy("segment").agg(
        F.coalesce(
            F.max(F.when(F.col("__p") == period_a, F.col("__n"))),
            F.lit(0),
        ).cast("double").alias("n_a"),
        F.coalesce(
            F.max(F.when(F.col("__p") == period_a, F.col("__s"))),
            F.lit(0).cast("decimal(18,6)"),
        ).cast("double").alias("s_a"),
        F.coalesce(
            F.max(F.when(F.col("__p") == period_b, F.col("__n"))),
            F.lit(0),
        ).cast("double").alias("n_b"),
        F.coalesce(
            F.max(F.when(F.col("__p") == period_b, F.col("__s"))),
            F.lit(0).cast("decimal(18,6)"),
        ).cast("double").alias("s_b"),
    )
    r_a = F.round(F.coalesce(F.try_divide("s_a", "n_a"), F.lit(0.0)), 6)
    r_b = F.round(F.coalesce(F.try_divide("s_b", "n_b"), F.lit(0.0)), 6)
    scored = wide.select(
        "segment",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        r_a.alias("rate_a"),
        r_b.alias("rate_b"),
    )
    dn = F.col("n_b") - F.col("n_a")
    dr = F.col("rate_b") - F.col("rate_a")
    return scored.select(
        "segment",
        "n_a",
        "n_b",
        "rate_a",
        "rate_b",
        F.round(dn * F.col("rate_a"), 6).alias("volume_effect"),
        F.round(F.col("n_a") * dr, 6).alias("rate_effect"),
        F.round(dn * dr, 6).alias("interaction"),
        F.round(
            F.col("n_b") * F.col("rate_b")
            - F.col("n_a") * F.col("rate_a"),
            6,
        ).alias("total_change"),
    ).orderBy("segment")


def interarrival_profile(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival process profile per key: mean gap, coefficient
    of variation, Goh–Barabási burstiness B = (σ−μ)/(σ+μ) (−1 =
    metronome, 0 = Poisson, →1 = bursty), and a Kolmogorov–Smirnov
    goodness-of-fit D against the fitted exponential (rate = 1/mean) —
    the diagnostic that says whether gap-based SLA alerting
    (``event_gaps``) can assume memorylessness at all: exponential
    fits license "p99 gap ≈ −ln(.01)/λ" math, bursty processes break
    it.

    Shape: one lag window per key (in-partition sort, ties broken by
    the id column), then moment sums as round-6 decimals; the KS pass
    ranks gaps per key (the distinct-value ECDF trick does not apply
    against a continuous CDF, so this IS an in-partition sort of
    gap-width rows — at extreme scale sample gaps per key first).
    F(t) rounds to 9 before the ECDF diffs and D to 6, keeping the
    report hash-stable across engines. Keys with < 2 gaps report
    NULL stats."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col, id_col)
    sec = F.col(ts_col).cast("double")
    gaps = (
        df.select(
            F.col(key_col).alias("key"),
            (sec - F.lag(sec).over(w)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .localCheckpoint(eager=True)
    )
    g6 = F.round(F.col("g"), 6).cast("decimal(18,6)")
    m = gaps.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(g6).cast("decimal(38,6)").alias("__s"),
        F.sum(g6 * g6).cast("decimal(38,12)").alias("__ss"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("__s").cast("double") / n
    var = F.col("__ss").cast("double") / n - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    stats = m.select(
        "key",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap_s"),
        F.round(F.try_divide(sd, mu), 6).alias("cv"),
        F.round(F.try_divide(sd - mu, sd + mu), 6).alias("burstiness"),
        F.when(F.col("n_gaps") >= 2, mu).alias("__mu_raw"),
    )
    wk = W.partitionBy("key").orderBy("g")
    ranked = (
        gaps.withColumn("__i", F.row_number().over(wk))
        .join(
            stats.select("key", "__mu_raw"),
            "key",
        )
        .withColumn(
            "__f",
            F.round(
                F.lit(1.0)
                - F.exp(-F.try_divide(F.col("g"), F.col("__mu_raw"))),
                9,
            ),
        )
    )
    wn = W.partitionBy("key")
    d = ranked.withColumn("__n", F.count(F.lit(1)).over(wn)).select(
        "key",
        F.greatest(
            F.abs(F.col("__i") / F.col("__n") - F.col("__f")),
            F.abs((F.col("__i") - 1) / F.col("__n") - F.col("__f")),
        ).alias("__d"),
    )
    ks = d.groupBy("key").agg(F.round(F.max("__d"), 6).alias("ks_d"))
    crit = F.round(F.lit(1.358) / F.sqrt(n), 6)
    return (
        stats.drop("__mu_raw")
        .join(ks, "key", "left")
        .select(
            "key",
            "n_gaps",
            "mean_gap_s",
            "cv",
            "burstiness",
            "ks_d",
            (F.col("ks_d") <= crit).alias("exponential_fit_ok"),
        )
        .orderBy("key")
    )


def periodogram_trig_table(
    periods: tuple[int, ...],
) -> list[tuple[int, int, float, float]]:
    """(period, residue, cos, sin) rows for every day-index residue of
    every candidate period, 9dp-rounded — the shared literal both the
    Spark plan and any SQL oracle consume, so the spectrum never
    depends on whose libm computed the transcendentals."""
    import math

    rows = []
    for p in periods:
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            rows.append(
                (int(p), int(r), round(math.cos(ang), 9), round(math.sin(ang), 9))
            )
    return rows


def periodogram_daily(
    daily: DataFrame,
    *,
    day_col: str = "day",
    value_col: str = "y",
    periods: tuple[int, ...] = (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14),
    min_day=None,
) -> DataFrame:
    """Discrete-Fourier periodogram over a pre-aggregated daily series
    — spectral power at each candidate period, the detector that tells
    you WHICH cycle a metric follows (weekly? 3-day batch cadence?)
    before you commit a seasonal model to it (``seasonal_strength``
    assumes period-7 and measures how strong; this one finds the
    period). Power at period p is the squared projection of the
    mean-centered series onto (cos, sin) at frequency 1/p, normalized
    by n — Schuster's periodogram at a fixed period grid.

    Scale shape: the input is the DAY-sized pre-aggregate (365 rows a
    year no matter the event volume); cos/sin come from a BROADCAST
    literal residue table (:func:`periodogram_trig_table` — at integer
    periods the angle only depends on ``day_index mod p``, so the trig
    is a Σp-row lookup, never a per-row transcendental whose last ulp
    differs between libms). The whole computation is a
    (days × |periods|) broadcast join plus one map-side-combinable
    fold to |periods| rows. The mean and the per-term products are
    6dp-rounded into DECIMAL sums — the spectrum is bit-reproducible
    across engines and partition orders. Output: period, power,
    share of grid power, and ``dominant`` on the argmax row (smallest
    period wins ties).
    """
    from pyspark.sql import Window as W

    spark = daily.sparkSession
    d0 = (
        F.lit(min_day)
        if min_day is not None
        else F.min(day_col).over(W.partitionBy())
    )
    base = daily.select(
        F.datediff(F.col(day_col), d0).cast("long").alias("__d"),
        F.round(F.col(value_col).cast("double"), 6).alias("__y"),
    )
    mean_row = base.agg(
        F.round(
            F.sum(F.col("__y").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("__mu"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    trig = spark.createDataFrame(
        periodogram_trig_table(periods),
        "period long, __r long, __cos double, __sin double",
    )
    x = (
        base.crossJoin(F.broadcast(mean_row))
        .crossJoin(
            F.broadcast(
                trig.select("period").distinct()
            )
        )
        .withColumn("__r", F.pmod(F.col("__d"), F.col("period")))
        .join(F.broadcast(trig), ["period", "__r"])
    )
    yc = F.col("__y") - F.col("__mu")
    ct = F.round(yc * F.col("__cos"), 6).cast("decimal(28,6)")
    st = F.round(yc * F.col("__sin"), 6).cast("decimal(28,6)")
    per_p = x.groupBy("period").agg(
        F.sum(ct).cast("double").alias("__c"),
        F.sum(st).cast("double").alias("__s"),
        F.max("__n").alias("__n"),
    )
    power = F.round(
        (F.col("__c") * F.col("__c") + F.col("__s") * F.col("__s"))
        / F.col("__n"),
        6,
    )
    scored = per_p.select("period", power.alias("power"))
    tot = F.sum(F.col("power").cast("decimal(28,6)")).over(W.partitionBy())
    best = F.row_number().over(
        W.orderBy(F.desc("power"), F.asc("period"))
    )
    return scored.select(
        "period",
        "power",
        F.round(
            F.try_divide(F.col("power"), tot.cast("double")), 6
        ).alias("power_share"),
        (best == 1).alias("dominant"),
    ).orderBy("period")


def granger_lag1(
    daily: DataFrame,
    *,
    day_col: str = "day",
    x_col: str = "x",
    y_col: str = "y",
    f_crit: float = 3.841459,
) -> DataFrame:
    """Lag-1 Granger-causality screen between two daily integer series
    — "does yesterday's X help predict today's Y beyond Y's own
    yesterday?", both directions in one report. The nested-model F:
    restricted OLS y_t ~ y_{t-1} versus unrestricted
    y_t ~ y_{t-1} + x_{t-1}, F = (RSS_r − RSS_u) / (RSS_u / (n−3)),
    solved in closed form from centered second moments (2×2 Cramer —
    no iterative fit). A significant X→Y with an insignificant Y→X is
    the lead-lag structure worth a real model; significance both ways
    usually means a shared driver.

    Scale shape: the input is the DAY-sized pre-aggregate; lags are
    one window over that tiny frame and the moments are EXACT integer
    sums (counts × counts stay in BIGINT), so every downstream double
    is bit-identical across engines — no rounding games needed.
    ``f_crit`` defaults to F(1, ∞) at α=0.05. Series shorter than 4
    points — and a PERFECT unrestricted fit (rss_u = 0, F undefined /
    infinite) — report NULL F (``try_divide``), never an abort.
    """
    from pyspark.sql import Window as W

    w = W.orderBy(day_col)
    lagged = daily.select(
        F.col(y_col).cast("long").alias("__y"),
        F.lag(F.col(y_col).cast("long")).over(w).alias("__yl"),
        F.lag(F.col(x_col).cast("long")).over(w).alias("__xl"),
        F.col(x_col).cast("long").alias("__x"),
    ).filter(F.col("__yl").isNotNull())

    def direction(tag: str, y: str, y1: str, x1: str) -> DataFrame:
        m = lagged.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).alias("sy"),
            F.sum(y1).alias("s1"),
            F.sum(x1).alias("s2"),
            F.sum(F.col(y) * F.col(y)).alias("syy"),
            F.sum(F.col(y1) * F.col(y1)).alias("s11"),
            F.sum(F.col(x1) * F.col(x1)).alias("s22"),
            F.sum(F.col(y) * F.col(y1)).alias("s1y"),
            F.sum(F.col(y) * F.col(x1)).alias("s2y"),
            F.sum(F.col(y1) * F.col(x1)).alias("s12"),
        )
        n = F.col("n").cast("double")
        # centered moments (exact integer sums -> deterministic doubles)
        cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
        c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
        c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
        c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
        c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
        c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
        rss_r = cyy - F.try_divide(c1y * c1y, c11)
        det = c11 * c22 - c12 * c12
        b1 = F.try_divide(c1y * c22 - c2y * c12, det)
        b2 = F.try_divide(c2y * c11 - c1y * c12, det)
        rss_u = cyy - b1 * c1y - b2 * c2y
        f_stat = F.round(
            F.try_divide(
                rss_r - rss_u, F.try_divide(rss_u, n - 3)
            ),
            6,
        )
        return m.select(
            F.lit(tag).alias("direction"),
            F.col("n"),
            F.round(b2, 6).alias("cross_coef"),
            F.round(rss_r, 4).alias("rss_restricted"),
            F.round(rss_u, 4).alias("rss_unrestricted"),
            f_stat.alias("f_stat"),
            (f_stat > F.lit(f_crit)).alias("significant"),
        )

    fwd = direction("x->y", "__y", "__yl", "__xl")
    rev = direction("y->x", "__x", "__xl", "__yl")
    return fwd.unionByName(rev).orderBy("direction")


def p_chart(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    flag_expr=None,
    sigma: float = 3.0,
) -> DataFrame:
    """Shewhart p-chart over a daily proportion — statistical process
    control for rates: each day's flagged share is tested against the
    binomial ±kσ limits around the PROCESS center p̄ = Σflagged/Σn,
    with per-day limits widening on low-volume days (√(p̄(1−p̄)/n_d))
    so a quiet Sunday can't false-alarm. The control-chart complement
    of the MAD/z anomaly detectors: those learn a robust location
    from the data's own spread; the p-chart tests against the
    binomial noise floor a true constant rate would produce, so it
    flags days whose deviation is statistically impossible at that
    volume, not merely unusual.

    Scale shape: ONE (day, n, flagged) map-side-combinable fold
    collapses the event log; the center is a 1-row broadcast over the
    day frame; everything downstream is day-sized arithmetic with
    exact integer counts (the doubles are single shared IEEE op
    sequences). Returns one row per day with p, center, LCL/UCL, and
    the out-of-control verdict.
    """
    flag = (
        flag_expr if flag_expr is not None else F.lit(False)
    ).cast("long")
    daily = df.groupBy(
        F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd")
        .alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(flag).cast("long").alias("flagged"),
    )
    center = daily.agg(
        (
            F.sum("flagged").cast("double") / F.sum("n").cast("double")
        ).alias("__pbar")
    )
    x = daily.crossJoin(F.broadcast(center))
    se = F.sqrt(
        F.col("__pbar") * (F.lit(1.0) - F.col("__pbar"))
        / F.col("n").cast("double")
    )
    p = F.col("flagged").cast("double") / F.col("n").cast("double")
    ucl = F.col("__pbar") + F.lit(sigma) * se
    lcl = F.greatest(F.col("__pbar") - F.lit(sigma) * se, F.lit(0.0))
    return x.select(
        "day",
        "n",
        "flagged",
        F.round(p, 6).alias("p"),
        F.round(F.col("__pbar"), 6).alias("center"),
        F.round(lcl, 6).alias("lcl"),
        F.round(ucl, 6).alias("ucl"),
        ((p > ucl) | (p < lcl)).alias("out_of_control"),
    ).orderBy("day")


def holt_winters_backtest(
    daily: DataFrame,
    *,
    group_cols: list[str],
    value_col: str = "v",
    season: int = 7,
    horizon: int = 7,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) one-step
    backtest per series — the model tier above
    :func:`seasonal_naive_backtest`: level + trend + a ``season``-slot
    seasonal state, scored on each series' last ``horizon`` days.
    Smoothing constants are fixed at α=1/2, β=γ=1/4 — exactly
    binary-representable, so every recursion step is an IEEE op
    sequence both engines replay bit-for-bit (the determinism trick
    that lets a RECURSIVE model carry a full SQL oracle via a
    recursive-CTE twin).

    Init (standard): L₀ = mean of week 1, B₀ = (mean week 2 − mean
    week 1)/7, Sᵢ = yᵢ − L₀. Update for t ≥ 8:

        f_t = L + B + S_{t−7}                     (one-step forecast)
        L'  = α(y_t − S_{t−7}) + (1−α)(L + B)
        B'  = β(L' − L) + (1−β)B
        S'  = γ(y_t − L') + (1−γ)S_{t−7}

    Series shorter than 3 seasons are dropped (init needs 2, scoring
    needs 1 more).

    Scale shape: the corpus reduces to one pre-aggregated daily frame
    (map-side combinable); each series folds to ONE array row and the
    entire recursion runs inside a single ``F.aggregate`` expression —
    no per-step jobs, no driver loop, series count is the only
    parallelism dimension (exactly how a per-key forecast fleet
    shards at 100 TB).

    Returns per group: ``n_days, mae, rmse, level, trend``.
    """
    if season != 7 or horizon != 7:
        # the SQL oracle twin hardcodes weekly shape; keep them honest
        raise ValueError("holt_winters_backtest ships season=horizon=7")
    gcols = list(group_cols)
    arr = daily.groupBy(*gcols).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", value_col))),
            lambda s: s[value_col],
        ).alias("ys")
    )
    ys = F.col("ys")
    n = F.size(ys)

    def mean7(sl):
        return (
            F.aggregate(sl, F.lit(0.0), lambda a, x: a + x) / F.lit(7.0)
        )

    l0 = mean7(F.slice(ys, 1, 7))
    b0 = (mean7(F.slice(ys, 8, 7)) - mean7(F.slice(ys, 1, 7))) / F.lit(
        7.0
    )
    s0 = F.transform(F.slice(ys, 1, 7), lambda x: x - mean7(F.slice(ys, 1, 7)))
    state0 = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        s0.alias("s"),
        F.lit(0.0).alias("sae"),
        F.lit(0.0).alias("sse"),
    )

    def upd(acc, t):
        y = F.element_at(ys, t)
        s1 = F.element_at(acc["s"], 1)
        f = acc["l"] + acc["b"] + s1
        l2 = F.lit(0.5) * (y - s1) + F.lit(0.5) * (acc["l"] + acc["b"])
        b2 = F.lit(0.25) * (l2 - acc["l"]) + F.lit(0.75) * acc["b"]
        snew = F.concat(
            F.slice(acc["s"], 2, 6),
            F.array(F.lit(0.25) * (y - l2) + F.lit(0.75) * s1),
        )
        scored = t > (n - F.lit(7))
        err = f - y
        return F.struct(
            l2.alias("l"),
            b2.alias("b"),
            snew.alias("s"),
            (
                acc["sae"]
                + F.when(scored, F.abs(err)).otherwise(F.lit(0.0))
            ).alias("sae"),
            (
                acc["sse"] + F.when(scored, err * err).otherwise(F.lit(0.0))
            ).alias("sse"),
        )

    fin = F.aggregate(
        F.sequence(F.lit(8), n), state0, upd
    )
    return (
        arr.filter(n >= 21)
        .select(
            *gcols,
            n.cast("long").alias("n_days"),
            F.round(fin["sae"] / F.lit(7.0), 6).alias("mae"),
            F.round(F.sqrt(fin["sse"] / F.lit(7.0)), 6).alias("rmse"),
            F.round(fin["l"], 6).alias("level"),
            F.round(fin["b"], 6).alias("trend"),
        )
        .orderBy(*gcols)
    )


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    *,
    time_col: str = "day",
    group_cols: list[str] | None = None,
    baseline: int = 14,
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint / drift alarm (Page 1954) — the
    control-chart gate a training pipeline puts on its daily metric
    streams: standardize each post-baseline observation against the
    first ``baseline`` points, accumulate S⁺ = max(0, S⁺ + z − k) and
    S⁻ = max(0, S⁻ − z − k), and alarm the first time either exceeds
    ``h`` — the sequential test that catches small persistent shifts
    a per-day threshold misses (k = reference value in σ units,
    ``h`` = decision interval; defaults are the classic 0.5/4).

    Determinism: series values are 6dp-rounded, the baseline mean/sd
    and the whole recursion are a fixed IEEE op sequence both engines
    replay identically (the Holt-Winters convention — k and the
    fold order are binary-exact), so the alarm day is a full-oracle
    integer. Groups shorter than ``baseline``+1 points are dropped;
    a zero-variance baseline reports NULL metrics, never a division
    error.

    Scale shape: one scan groups each series to a single array row
    (series count = the parallelism dimension), and the entire
    recursion runs inside ONE ``F.aggregate`` — zero per-step jobs.

    Returns per group: ``n_days, baseline_mean, baseline_sd,
    max_cusum_pos, max_cusum_neg, alarm_day`` (1-based index into the
    day-ordered series, NULL if no alarm) and ``alarmed``.
    """
    gcols = list(group_cols or [])
    base = df.select(
        *gcols,
        F.col(time_col).alias("__d"),
        F.round(F.col(value_col).cast("double"), 6).alias("__v"),
    )
    arr = (
        base.groupBy(*gcols)
        .agg(F.collect_list(F.struct("__d", "__v")).alias("__p"))
        .select(
            *gcols,
            F.transform(
                F.array_sort("__p"), lambda s: s["__v"]
            ).alias("ys"),
        )
        .filter(F.size("ys") >= baseline + 1)
    )
    n = F.size("ys")
    head = F.slice(F.col("ys"), 1, baseline)
    mu = F.aggregate(
        head, F.lit(0.0), lambda acc, y: acc + y
    ) / F.lit(float(baseline))
    arr = arr.select(*gcols, "ys", n.alias("n"), mu.alias("mu"))
    var = F.aggregate(
        F.slice(F.col("ys"), 1, baseline),
        F.lit(0.0),
        lambda acc, y: acc + (y - F.col("mu")) * (y - F.col("mu")),
    ) / F.lit(float(baseline))
    arr = arr.select(*gcols, "ys", "n", "mu", F.sqrt(var).alias("sd"))

    state0 = F.struct(
        F.lit(0.0).alias("sp"),
        F.lit(0.0).alias("sn"),
        F.lit(0.0).alias("mp"),
        F.lit(0.0).alias("mn"),
        F.lit(0).alias("alarm"),
    )

    def step(acc, t):
        z = (F.element_at(F.col("ys"), t) - F.col("mu")) / F.col("sd")
        sp = F.greatest(F.lit(0.0), acc["sp"] + z - F.lit(k))
        sn = F.greatest(F.lit(0.0), acc["sn"] - z - F.lit(k))
        return F.struct(
            sp.alias("sp"),
            sn.alias("sn"),
            F.greatest(acc["mp"], sp).alias("mp"),
            F.greatest(acc["mn"], sn).alias("mn"),
            F.when(acc["alarm"] > 0, acc["alarm"])
            .otherwise(
                F.when((sp > F.lit(h)) | (sn > F.lit(h)), t).otherwise(
                    F.lit(0)
                )
            )
            .alias("alarm"),
        )

    fin = F.aggregate(
        F.sequence(F.lit(baseline + 1), F.col("n")), state0, step
    )
    degen = F.col("sd") <= 0
    out = arr.select(
        *gcols,
        F.col("n").cast("long").alias("n_days"),
        F.round("mu", 6).alias("baseline_mean"),
        F.when(degen, F.lit(None).cast("double"))
        .otherwise(F.round("sd", 6))
        .alias("baseline_sd"),
        F.when(degen, F.lit(None).cast("double"))
        .otherwise(F.round(fin["mp"], 6))
        .alias("max_cusum_pos"),
        F.when(degen, F.lit(None).cast("double"))
        .otherwise(F.round(fin["mn"], 6))
        .alias("max_cusum_neg"),
        F.when(degen | (fin["alarm"] <= 0), F.lit(None).cast("int"))
        .otherwise(fin["alarm"].cast("int"))
        .alias("alarm_day"),
        F.when(degen, F.lit(None).cast("boolean"))
        .otherwise(fin["alarm"] > 0)
        .alias("alarmed"),
    )
    return out.orderBy(*gcols) if gcols else out
