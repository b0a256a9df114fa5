"""Mergeable frequency/quantile sketches (X7 family).

The HLL distinct sketches (``hll_sketch_agg``) answer "how many
distinct"; these answer the other two streaming-statistics questions —
"how often does THIS key occur" (count-min) and "what is the p99"
(log-bucket histogram) — with the same store contract: per-batch
PARTIALS are mergeable by construction (cell-wise / bucket-wise sums),
so an incremental store never rescans history and a compaction merge
answers identically to the raw partials.

Unlike Spark's built-in ``count_min_sketch`` (an opaque binary with no
SQL-side merge), the CMS here is EXPLICIT: (depth, slot, count) cell
rows hashed with md5 — cell math any engine can replay, so the suite
queries carry full DuckDB oracles, and merging is a plain
``groupBy(d, w).sum(n)``.

Error contracts (standard): CMS overestimates only, by at most
εN with probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉; the
log-histogram's quantiles carry bounded RELATIVE value error
(≤ base−1, e.g. 5% at base 1.05) because bucket edges are geometric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_slot(key: Column, d: Column, width: int) -> Column:
    """Row d's slot for a key: md5('cms:<d>:<key>') folded to a BIGINT,
    non-negative mod width — engine-reproducible (the md5 trick every
    deterministic coin in this repo uses)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cms:"), d.cast("string"), F.lit(":"), key)),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return ((h % width) + width) % width


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of ``key_col`` as SPARSE cell rows
    ``(d int, w int, n long)`` — only touched cells materialize.
    One scan: each row explodes into ``depth`` (d, slot) pairs, the
    groupBy combines map-side, and the exchange carries at most
    depth×width cells per partition regardless of row count. Merge two
    sketches (or per-batch partials) with
    ``union.groupBy("d","w").agg(sum("n"))`` — counter addition is the
    CMS merge."""
    k = F.col(key_col).cast("string")
    cells = df.select(
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
        k.alias("__k"),
    ).select(
        F.col("d").cast("int"),
        _cms_slot(F.col("__k"), F.col("d"), width).cast("int").alias("w"),
    )
    return cells.groupBy("d", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``: min over
    the depth rows of each key's cell (absent cell = 0). The probe
    side explodes to depth rows, LEFT-joins the (tiny, ≤ depth×width
    rows) cell table — broadcast by AQE — and takes the per-key min:
    the CMS guarantee est ≥ true, est ≤ true + εN w.h.p. ``depth`` and
    ``width`` MUST match the build."""
    k = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        k.alias("__k"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).select(
        key_col,
        F.col("d").cast("int"),
        _cms_slot(F.col("__k"), F.col("d"), width).cast("int").alias("w"),
    )
    return (
        probes.join(F.broadcast(cells), ["d", "w"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est"))
    )


def log_histogram(
    df: DataFrame,
    value_col: str,
    *,
    base: float = 1.05,
    group_cols: list[str] | None = None,
    nonpositive: str = "drop",
) -> DataFrame:
    """Geometric-bucket histogram of a POSITIVE value column:
    ``(bucket int, n long)`` with bucket = ⌊log_base(value)⌋. Bucket
    counts are mergeable by addition (the quantile store's partial),
    and any quantile read off the merged histogram carries relative
    value error ≤ base−1 (5% at the default) — the log-bucket analog
    of a t-digest, expressible entirely in codegen + one tiny
    exchange. ``nonpositive`` sets the policy for values ≤ 0 (which
    have no log bucket): ``'drop'`` (default) filters them scan-side —
    one bad row must never abort a 100 TB job — while ``'error'``
    raises at read time for pipelines that treat a non-positive
    latency/size/count as corruption worth failing on. With
    ``group_cols`` the histogram keeps one bucket table per group —
    per-key p99s (latency per endpoint, tokens per source) from the
    same store contract."""
    import math

    if nonpositive not in ("drop", "error"):
        raise ValueError(
            f"nonpositive must be 'drop' or 'error', got {nonpositive!r}"
        )
    v = F.col(value_col).cast("double")
    gcols = list(group_cols or [])
    if nonpositive == "drop":
        df = df.filter(v > 0)
        bucket = F.floor(F.log(v) / F.lit(math.log(base)))
    else:
        bucket = F.when(
            v > 0, F.floor(F.log(v) / F.lit(math.log(base)))
        ).otherwise(F.raise_error(F.lit("log_histogram: value <= 0")))
    return (
        df.select(*gcols, bucket.cast("int").alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: list[float],
    *,
    base: float = 1.05,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a (merged) :func:`log_histogram`:
    for each q, the UPPER EDGE ``base^(bucket+1)`` of the first bucket
    whose cumulative count reaches ⌈q·N⌉ — so the estimate is ≥ the
    true quantile and within a factor of ``base`` of it. One window
    over the (tiny) histogram; output ``(q, est)``, or
    ``(*group_cols, q, est)`` with per-group cumulative windows when
    the histogram was built grouped."""
    from pyspark.sql import Window as W

    gcols = list(group_cols or [])
    w = (
        W.partitionBy(*gcols).orderBy("bucket")
        if gcols
        else W.orderBy("bucket")
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.withColumn("cum", F.sum("n").over(w))
    if gcols:
        totals = hist.groupBy(*gcols).agg(F.sum("n").alias("__total"))
        joined = cum.join(F.broadcast(totals), gcols)
    else:
        joined = cum.crossJoin(
            F.broadcast(hist.agg(F.sum("n").alias("__total")))
        )
    out = None
    for q in qs:
        hit = (
            joined.filter(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("__total"))
            )
            .groupBy(*gcols)
            .agg(F.min("bucket").alias("__b"))
            .select(
                *gcols,
                F.lit(q).alias("q"),
                F.round(F.pow(F.lit(base), F.col("__b") + 1), 6).alias("est"),
            )
        )
        out = hit if out is None else out.unionAll(hit)
    return out


#: signed-64 powers of two (bit 63 wraps negative in two's complement)
_POW2 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _bloom_pos(key: Column, i: Column, n_bits: int) -> Column:
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("bloom:"), i.cast("string"), F.lit(":"), key)
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return ((h % n_bits) + n_bits) % n_bits


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    n_bits: int = 8192,
    k: int = 4,
) -> list[int]:
    """Build a Bloom-filter bitmask from a key column, DISTRIBUTED:
    keys explode to k md5 positions, positions dedupe and fold into
    per-word ``bit_or`` partials, and the driver collects n_bits/64
    longs — O(mask), never O(keys). The md5 position math is the same
    engine-reproducible trick as the CMS, so a SQL oracle can rebuild
    the identical mask. False-positive rate ≈ (1 − e^{−kN/n_bits})^k;
    size n_bits for ~10 bits/key at k=4 for ~2%.

    Returns the mask as a Python list of signed 64-bit words — pass it
    to :func:`bloom_mask_frame` (broadcast one-row frame, the scale
    path) or inline via :func:`bloom_might_contain`."""
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    pow2 = F.array(*[F.lit(v).cast("long") for v in _POW2])
    key = F.col(key_col).cast("string")
    pos = (
        df.select(
            F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
            key.alias("__k"),
        )
        .select(_bloom_pos(F.col("__k"), F.col("i"), n_bits).alias("pos"))
        .distinct()
    )
    rows = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.element_at(pow2, (F.col("pos") % 64).cast("int") + 1).alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("m"))
        .collect()
    )
    mask = [0] * (n_bits // 64)
    for r in rows:
        mask[r["word"]] = r["m"]
    return mask


def bloom_mask_frame(spark, mask: list[int]) -> DataFrame:
    """The mask as a one-row ``array<long>`` frame — crossJoin it
    ``F.broadcast``-ed so a corpus-sized scan tests membership without
    a join on the key (the reason to bloom at all: a 1M-bit mask is
    16 KB broadcast once; the raw key set might be gigabytes)."""
    return spark.createDataFrame([(mask,)], "__bloom array<long>")


def bloom_might_contain(
    key: Column,
    mask_col: Column,
    *,
    n_bits: int,
    k: int = 4,
) -> Column:
    """Scan-side membership test (codegen, no join): all k bits set →
    maybe present (one-sided: never a false negative). ``mask_col`` is
    the array<long> from :func:`bloom_mask_frame` (or a literal array
    for small masks); ``n_bits``/``k`` MUST match the build."""
    pow2 = F.array(*[F.lit(v).cast("long") for v in _POW2])
    test = None
    for i in range(k):
        pos = _bloom_pos(key, F.lit(i), n_bits)
        word = F.element_at(mask_col, (pos / 64).cast("int") + 1)
        bit = F.element_at(pow2, (pos % 64).cast("int") + 1)
        t = word.bitwiseAND(bit) != 0
        test = t if test is None else test & t
    return test


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    *,
    group_cols: list[str] | None = None,
    k: int = 64,
    merge_salt: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count estimate (Bar-Yossef et al.
    2002) with md5 hashes — the ENGINE-EXACT twin of the HLL rollup:
    DataSketches binaries can only be checked rows-only, while the
    KMV estimate ``(k−1)·2⁶⁰/v_k`` (v_k = k-th smallest distinct
    60-bit hash) is reproducible in any engine with md5, so the
    distinct-count family gains a full value-hash oracle.

    Scale shape — the k-min of a union is the k-min of the two
    k-mins, so the computation is a bounded-state reduce: first a
    spill-safe hash-aggregate ``distinct`` over (group, hash) — never
    an in-buffer array — then a ``row_number`` window per (group,
    salt) cell keeps only the k smallest hashes per cell (sort is
    disk-backed, so no aggregation buffer ever holds more than the
    surviving ≤ merge_salt·k longs per group), then one flatten +
    sort + slice per group. When a group has fewer than k distinct
    keys the estimate IS the exact count. Returns (group_cols…,
    n_kmin, est double)."""
    from pyspark.sql import Window as W

    gcols = list(group_cols or [])
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(*gcols, h.alias("__h")).distinct()
    salt = (F.col("__h") % merge_salt).cast("int")
    cell = W.partitionBy(*gcols, "__s").orderBy("__h")
    survivors = (
        hashed.withColumn("__s", salt)
        .withColumn("__rk", F.row_number().over(cell))
        .filter(F.col("__rk") <= k)
    )
    merged = survivors.groupBy(*gcols).agg(
        F.slice(F.sort_array(F.collect_list("__h")), 1, k).alias("__mins")
    )
    n = F.size("__mins")
    vk = F.element_at("__mins", k).cast("double")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / vk
    )
    return merged.select(
        *gcols,
        n.cast("long").alias("n_kmin"),
        F.round(est, 6).alias("est"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: list[float],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted quantiles: the smallest value whose cumulative weight
    share reaches q (left-continuous, no interpolation — the
    deterministic convention) — what "median price weighted by
    quantity" or "p90 latency weighted by request cost" actually
    means, where the unweighted percentile silently pretends every
    row matters equally.

    Scale shape: the corpus folds to one row per DISTINCT value per
    group with its EXACT decimal weight sum (map-side combinable);
    the cumulative threshold scan is a window over that small frame.
    Engine-exact: weights sum as decimals, thresholds compare as
    q·total ≤ cum on exact values. Non-positive weights are rejected
    scan-side (a zero/negative weight has no quantile meaning)."""
    gcols = list(group_cols or [])
    per = (
        df.filter(
            F.col(value_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .groupBy(*gcols, F.col(value_col).alias("__v"))
        .agg(
            F.sum(F.col(weight_col).cast("decimal(28,6)")).alias("w")
        )
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*gcols)
    c = (
        per.withColumn("__cum", F.sum("w").over(wcum))
        .withColumn("__tot", F.sum("w").over(wtot))
        # each q below filters this frame; materialize the (tiny)
        # distinct-value fold once so the corpus scans ONCE, not per q
        .localCheckpoint(eager=True)
    )
    out = None
    for q in qs:
        hit = c.filter(
            F.col("__cum").cast("double")
            >= F.lit(q) * F.col("__tot").cast("double")
        )
        row = hit.groupBy(*gcols).agg(
            F.lit(q).alias("q"),
            F.min("__v").cast("double").alias("value"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("qs must be non-empty")
    return out.orderBy(*gcols, "q")


def _hll_md5_rho(h: Column) -> Column:
    """ρ for a deterministic md5-register HLL: 1 + the number of
    leading zero BITS in the 60-bit window at hex chars 3..17 of the
    md5 (60 bits keep every intermediate inside int64). Computed from
    the hex string itself — strip leading '0' chars, then a 16-case
    map for the first nonzero digit's leading bits — so the identical
    string arithmetic replays in DuckDB."""
    s = F.substring(h, 3, 15)
    stripped = F.regexp_replace(s, "^0+", "")
    nz = F.lit(15) - F.length(stripped)
    d = F.substring(stripped, 1, 1)
    lead = (
        F.when(d == "1", 3)
        .when(d.isin("2", "3"), 2)
        .when(d.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(F.length(stripped) == 0, F.lit(61)).otherwise(
        nz * 4 + lead + 1
    ).cast("int")


def _hll_md5_estimate_agg(key_cols: list[str]):
    """The HLL estimator over a (key..., reg, m) register frame:
    S = Σ 2^{-M_j} with absent registers contributing 2⁰ = 1 (the
    2^{-M} terms are exact binary fractions via 1/(1<<M), so no pow),
    bias-corrected raw = α_m·m²/S with m = 256, and the standard
    small-range linear-counting branch m·ln(m/V)."""
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    s_term = 1.0 / F.expr("shiftleft(cast(1 as bigint), m)").cast(
        "double"
    )
    return (
        lambda regs: regs.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_regs"),
            F.sum(s_term).alias("s_present"),
        )
        .select(
            *key_cols,
            "n_regs",
            (F.lit(256) - F.col("n_regs")).cast("long").alias("v_zero"),
            (
                F.lit(alpha * 256.0 * 256.0)
                / (
                    (F.lit(256) - F.col("n_regs")).cast("double")
                    + F.col("s_present")
                )
            ).alias("raw"),
        )
        .select(
            *key_cols,
            "n_regs",
            "v_zero",
            F.when(
                (F.col("raw") <= 2.5 * 256.0) & (F.col("v_zero") > 0),
                F.lit(256.0)
                * F.log(F.lit(256.0) / F.col("v_zero").cast("double")),
            )
            .otherwise(F.col("raw"))
            .alias("est"),
        )
    )


def hll_md5_overlap_report(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
) -> DataFrame:
    """Pairwise audience overlap from DETERMINISTIC md5-register
    HyperLogLogs (round 11) — the full-oracle twin of the rows-only
    Spark-sketch ``x7_audience_overlap``, built the way the md5-MinHash
    twin upgraded the MinHash family: registers are ``md5`` bits
    (first 8 bits → register, next 60 → ρ), so the sketch, the
    register-wise MAX merge (the property HLL exists for — the union
    sketch of two audiences is elementwise max, no re-scan), the
    inclusion-exclusion estimate |A∩B| ≈ E(A)+E(B)−E(A∪B), and the
    exact truth all replay bit-for-bit in SQL.

    Scale shape: ONE pass builds all (group, register) maxima
    (map-side-combinable); pair estimates merge 256-row register
    frames, never rescanning members — at 100 TB the register table
    IS the stored sketch, exactly like the reference's audience
    workflow. Exact distincts ride along for the error columns (at
    scale you would drop them; they are the certificate here).

    Returns per unordered group pair: (g_a, g_b, exact_a, exact_b,
    exact_overlap, est_a, est_b, est_union, est_overlap, abs_err).
    """
    h = F.md5(F.col(value_col).cast("string"))
    base = df.select(
        F.col(group_col).alias("g"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("reg"),
        _hll_md5_rho(h).alias("rho"),
        F.col(value_col).cast("string").alias("v"),
    )
    regs = base.groupBy("g", "reg").agg(F.max("rho").alias("m"))
    est_one = _hll_md5_estimate_agg(["g"])(regs).select(
        "g", F.col("est")
    )
    exact_one = base.groupBy("g").agg(
        F.countDistinct("v").cast("long").alias("exact")
    )
    gs = regs.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("g_a"))
        .join(gs.select(F.col("g").alias("g_b")))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    # union sketch per pair: register-wise max over both groups
    u = (
        pairs.join(
            regs,
            (F.col("g") == F.col("g_a")) | (F.col("g") == F.col("g_b")),
        )
        .groupBy("g_a", "g_b", "reg")
        .agg(F.max("m").alias("m"))
    )
    est_u = _hll_md5_estimate_agg(["g_a", "g_b"])(u).select(
        "g_a", "g_b", F.col("est").alias("est_union")
    )
    exact_pair = (
        base.select("g", "v")
        .distinct()
        .groupBy("v")
        .agg(F.collect_set("g").alias("gs"))
        .select(F.explode("gs").alias("g_a"), F.col("gs"))
        .select("g_a", F.explode("gs").alias("g_b"))
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )
    out = (
        pairs.join(
            est_one.select(
                F.col("g").alias("g_a"), F.col("est").alias("est_a")
            ),
            "g_a",
        )
        .join(
            est_one.select(
                F.col("g").alias("g_b"), F.col("est").alias("est_b")
            ),
            "g_b",
        )
        .join(est_u, ["g_a", "g_b"])
        .join(
            exact_one.select(
                F.col("g").alias("g_a"), F.col("exact").alias("exact_a")
            ),
            "g_a",
        )
        .join(
            exact_one.select(
                F.col("g").alias("g_b"), F.col("exact").alias("exact_b")
            ),
            "g_b",
        )
        .join(exact_pair, ["g_a", "g_b"], "left")
    )
    est_overlap = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return out.select(
        "g_a",
        "g_b",
        "exact_a",
        "exact_b",
        F.coalesce("exact_overlap", F.lit(0)).cast("long").alias(
            "exact_overlap"
        ),
        F.round("est_a", 6).alias("est_a"),
        F.round("est_b", 6).alias("est_b"),
        F.round("est_union", 6).alias("est_union"),
        F.round(est_overlap, 6).alias("est_overlap"),
        F.round(
            F.abs(
                est_overlap
                - F.coalesce("exact_overlap", F.lit(0)).cast("double")
            ),
            6,
        ).alias("abs_err"),
    ).orderBy("g_a", "g_b")

def hll_md5_day_registers(
    df: DataFrame,
    value_col: str,
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """The stored DAILY md5-HLL register frame: one ``(day, reg, m)``
    row per register a day touched — m = max ρ over the day's values
    (register = first 8 md5 bits, ρ = leading-zero count of the next
    60, the round-11 deterministic-HLL convention). ONE map-side-
    combinable pass over the raw events; at 100 TB this ≤256-rows/day
    frame IS the materialized sketch store (partition-prunable on
    ``day``), and every later range rollup is a register MAX over it
    instead of a rescan + distinct shuffle of raw history."""
    h = F.md5(F.col(value_col).cast("string"))
    return (
        df.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias(
                "reg"
            ),
            _hll_md5_rho(h).alias("rho"),
        )
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("m"))
    )


def hll_md5_daily_rollup(
    regs: DataFrame, counts: DataFrame
) -> DataFrame:
    """The shared RANGE-ROLLUP tail over a ``(day, reg, m)`` register
    store (batch and streaming twins both end here): per day, the
    day's own estimate AND the prefix-union estimate of every day so
    far — the "distinct users in any date range anchored at the start"
    readout, computed ENTIRELY from the kilobyte store.

    Mechanics: a (day × 256 registers) grid (tiny — days are the only
    data-dependent axis) left-joins the store, and the prefix-union
    register is a running ``max(m)`` window per register ordered by
    day (absent days inherit the running max; NULL m rows are ignored
    by MAX, exactly the register-wise-max merge HLL exists for). The
    day/cumulative estimates then apply the round-11 bias-corrected
    estimator with the linear-counting branch. ``counts`` supplies
    per-day event totals (SUM-mergeable, so the streaming store keeps
    per-batch partials).

    Returns one row per day, ordered: (day, n_events, cum_events,
    n_regs_day, n_regs_cum, est_day, est_cum)."""
    from pyspark.sql import Window

    days = regs.select("day").distinct()
    grid = days.crossJoin(
        F.broadcast(
            regs.sparkSession.range(1)
            .select(F.explode(F.sequence(F.lit(0), F.lit(255))).alias("reg"))
        )
    )
    w_cum = (
        Window.partitionBy("reg")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(regs, ["day", "reg"], "left").select(
        "day", "reg", "m", F.max("m").over(w_cum).alias("cum_m")
    )
    est_day = _hll_md5_estimate_agg(["day"])(
        joined.filter(F.col("m").isNotNull()).select("day", "reg", "m")
    ).select(
        "day",
        F.col("n_regs").alias("n_regs_day"),
        F.col("est").alias("est_day"),
    )
    est_cum = _hll_md5_estimate_agg(["day"])(
        joined.filter(F.col("cum_m").isNotNull()).select(
            "day", "reg", F.col("cum_m").alias("m")
        )
    ).select(
        "day",
        F.col("n_regs").alias("n_regs_cum"),
        F.col("est").alias("est_cum"),
    )
    w_day = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counts.join(est_day, "day")
        .join(est_cum, "day")
        .select(
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            F.sum("n_events").over(w_day).cast("long").alias(
                "cum_events"
            ),
            "n_regs_day",
            "n_regs_cum",
            F.round("est_day", 6).alias("est_day"),
            F.round("est_cum", 6).alias("est_cum"),
        )
        .orderBy("day")
    )


def hll_md5_daily_report(
    df: DataFrame,
    value_col: str,
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Daily md5-HLL sketch store + range rollup WITH exact-truth
    certificates (round 12) — the full-oracle twin of the rows-only
    Apache-DataSketches ``x7_hll_daily_merge``, upgraded the way
    ``hll_md5_overlap_report`` upgraded ``x7_audience_overlap``: the
    register store, the MAX merges, the estimator, and the exact
    truths all replay bit-for-bit in SQL.

    On top of :func:`hll_md5_daily_rollup`'s store-only readout this
    joins, per day: ``exact_day`` (that day's true distinct count) and
    ``exact_cum`` (true distincts over the prefix — counted as users
    whose FIRST day is ≤ day, one more map-side-combinable pass, no
    day×day rescan), plus ``abs_err_cum`` as the accuracy certificate.
    At 100 TB you would drop the exact columns; they are the
    certificate here, exactly like the overlap report's.

    Returns one row per day, ordered: (day, n_events, cum_events,
    n_regs_day, n_regs_cum, est_day, est_cum, exact_day, exact_cum,
    abs_err_cum)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("string")
    day = F.to_date(F.col(ts_col))
    regs = hll_md5_day_registers(df, value_col, ts_col=ts_col)
    counts = df.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    roll = hll_md5_daily_rollup(regs, counts)
    exact_day = (
        df.select(day.alias("day"), v.alias("v"))
        .groupBy("day")
        .agg(F.countDistinct("v").cast("long").alias("exact_day"))
    )
    w_day = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exact_cum = (
        df.select(day.alias("day"), v.alias("v"))
        .groupBy("v")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("new_users"))
        .select(
            "day", F.sum("new_users").over(w_day).alias("exact_cum")
        )
    )
    # a day can host events yet introduce no first-seen user only if
    # every user already appeared — the running max fills the gap
    w_fill = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        roll.join(exact_day, "day")
        .join(exact_cum, "day", "left")
        .select(
            "*",
            F.max("exact_cum").over(w_fill).alias("__ec"),
        )
        .drop("exact_cum")
        .withColumnRenamed("__ec", "exact_cum")
        .select(
            "day",
            "n_events",
            "cum_events",
            "n_regs_day",
            "n_regs_cum",
            "est_day",
            "est_cum",
            "exact_day",
            F.col("exact_cum").cast("long").alias("exact_cum"),
            F.round(
                F.abs(
                    F.col("est_cum")
                    - F.col("exact_cum").cast("double")
                ),
                6,
            ).alias("abs_err_cum"),
        )
        .orderBy("day")
    )

def hll_md5_distinct_report(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
) -> DataFrame:
    """Per-group approximate DISTINCT COUNT from the deterministic
    md5-register HLL (round 12) — the same-SHAPE full-oracle twin of
    the rows-only Spark ``approx_count_distinct``
    (``x7_approx_distinct``), completing the md5-HLL trilogy
    (overlap r11, daily rollup r12, plain per-group distinct here):
    register = first 8 md5 bits, ρ from the next 60, bias-corrected
    estimator with the linear-counting branch — every step replays
    bit-for-bit in SQL. Exact distincts ride along as the accuracy
    certificate (at 100 TB you would drop them — the whole point of
    the sketch is avoiding that exact-distinct shuffle).

    ONE map-side-combinable pass builds all (group, register) maxima;
    estimates reduce 256-row register frames. Returns per group:
    (group, n_events, exact, est, rel_err), ordered."""
    h = F.md5(F.col(value_col).cast("string"))
    base = df.select(
        F.col(group_col).alias("g"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("reg"),
        _hll_md5_rho(h).alias("rho"),
        F.col(value_col).cast("string").alias("v"),
    )
    regs = base.groupBy("g", "reg").agg(F.max("rho").alias("m"))
    est = _hll_md5_estimate_agg(["g"])(regs).select("g", "est")
    exact = base.groupBy("g").agg(
        F.countDistinct("v").cast("long").alias("exact"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        exact.join(est, "g")
        .select(
            F.col("g").alias(group_col),
            "n_events",
            "exact",
            F.round("est", 6).alias("est"),
            F.round(
                F.abs(F.col("est") - F.col("exact").cast("double"))
                / F.col("exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
        .orderBy(group_col)
    )
