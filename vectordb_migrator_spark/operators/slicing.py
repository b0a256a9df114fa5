"""Limit / offset / pagination (L1-L3 in SURVEY.md §2.4).

The reference pushes ``LIMIT``/``OFFSET`` into each backend query
(``adapters/pgvector.py:103-106``, ``adapters/qdrant.py:101-102``,
``adapters/milvus.py:104-105``) but inherits whatever row order the
backend happens to return — offset pagination without a total order is
non-deterministic. Here a slice is always anchored to an explicit sort
key, and Catalyst still plans it as a TakeOrderedAndProject (top-k per
partition, merge on one reducer) rather than a global sort, so it is
scale-safe for the small-k case. For scan *parallelization* at 100 TB,
do NOT paginate with offset at all — use key-range partition planning
(see sources/pgvector.py partitioned reads).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def limit_offset(
    df: DataFrame,
    *,
    limit: int | None = None,
    offset: int = 0,
    order_by: str | Column | list[str | Column] | None = None,
) -> DataFrame:
    """Deterministic LIMIT/OFFSET slice.

    With no ``order_by`` the slice is whatever-order ``df.limit`` /
    ``df.offset`` give (matching the reference's semantics); with an
    order key it is a stable top-k.
    """
    if limit is None and not offset:
        return df
    if order_by is None:
        if offset:
            df = df.offset(offset)
        return df.limit(limit) if limit is not None else df

    keys = order_by if isinstance(order_by, list) else [order_by]
    if limit is not None:
        # row_number over a global sort would single-thread; instead
        # take (offset+limit) with TakeOrderedAndProject then drop the
        # leading offset rows — k is small, the scan stays parallel.
        sliced = df.orderBy(*keys).limit(offset + limit)
        if offset:
            w = W.orderBy(*keys)
            sliced = (
                sliced.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") > offset)
                .drop("__rn")
            )
        return sliced
    out = df.orderBy(*keys)
    return out.offset(offset) if offset else out


def hash_split(
    df: DataFrame,
    *,
    id_col: str,
    train_frac: float = 0.9,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic train/test split: bucket = xxhash64(id) mod
    buckets; rows with bucket < train_frac*buckets are 'train'.

    Hash-based (not ``df.sample``) so the assignment is a pure
    function of the id — stable across runs, partitionings, engines,
    and incremental re-runs (new rows don't reshuffle old ones), which
    is the property a training pipeline actually needs.
    """
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
    return df.withColumn(
        "split",
        F.when(bucket < int(train_frac * buckets), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def per_group_head(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    n: int,
) -> DataFrame:
    """Balanced per-group sampling: the first ``n`` rows of each group
    in ``order_col`` order (window row_number — one exchange on the
    group key, in-partition sort only). Deterministic counterpart of
    stratified sampling for building class-balanced subsets."""
    w = W.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    frac: float,
    order_col: str,
    hash_order: bool = False,
) -> DataFrame:
    """Exact stratified sampling: the first ``ceil(frac · n_s)`` rows
    of every stratum — each stratum is represented by exactly its
    proportional share (``df.sampleBy`` is Bernoulli per row: stratum
    sizes fluctuate and tiny strata can vanish entirely, the thing a
    class-balanced training subset can't afford).

    One exchange on the stratum key serves both the stratum-size
    window and the rank window (same partitioning, in-partition sort
    only). Deterministic given ``order_col``; set ``hash_order=True``
    to rank by ``xxhash64(order_col)`` instead — a pseudo-random but
    stable shuffle within each stratum, so the selection isn't biased
    by id assignment order while remaining reproducible across runs
    and engines that share the hash.
    """
    rank_key = (
        F.xxhash64(F.col(order_col)) if hash_order else F.col(order_col)
    )
    w_rank = W.partitionBy(strata_col).orderBy(rank_key, F.col(order_col))
    w_size = W.partitionBy(strata_col)
    return (
        df.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_n", F.count("*").over(w_size))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(frac)))
        .drop("_rn", "_n")
    )


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
    coin: str = "xxhash64",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): rank every row by ``u^(1/w)`` with ``u`` derived from a
    hash of the id, keep the top k — inclusion probability is
    proportional to weight, in ONE scan with a heap top-k
    (TakeOrderedAndProject), no shuffle of the data.

    The uniform ``u`` comes from a hash of (id, seed), not ``rand()``
    — the sample is a pure function of (id, weight, seed): stable
    across runs, partitionings, task retries, and incremental re-runs
    (the property that matters when the sample feeds a training set
    you need to reproduce). ``coin="xxhash64"`` (default) is the fast
    JVM path; ``coin="md5"`` is bit-identical across engines (the
    value-hash-oracle path — see ``apply_source_mixture``), with the
    A-ES key rounded to 9 decimals so a sub-ulp ``pow`` difference
    between engines can never flip the ordering (ties break by id).
    Rows with weight <= 0 or NULL are never selected.
    """
    if coin == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
        w = F.col(weight_col).cast("double")
        key = F.when(w > 0, F.round(F.pow(u, F.lit(1.0) / w), 9))
    else:
        m = F.lit(1_000_000_007)
        u = (
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), m).cast("double")
            + F.lit(0.5)
        ) / m.cast("double")
        w = F.col(weight_col).cast("double")
        key = F.when(w > 0, F.pow(u, F.lit(1.0) / w))
    return (
        df.withColumn("_aes_key", key)
        .filter(F.col("_aes_key").isNotNull())
        .orderBy(F.desc("_aes_key"), F.col(id_col))
        .limit(k)
        .drop("_aes_key")
    )


def equal_frequency_bins(
    df: DataFrame,
    *,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    bin_col: str = "bin",
) -> DataFrame:
    """Quantile (equal-frequency) binning: rows land in bin ``i`` when
    their value is <= the ``i``-th exact-percentile boundary (1-based;
    the last bin catches the rest).

    The obvious ``ntile(n) OVER (ORDER BY value)`` needs a GLOBAL sort
    — every row through one ordering, the classic scale cliff. Here
    the boundaries reduce to ONE aggregate row (exact interpolated
    percentile, map-side combinable) broadcast back into the scan, so
    the data itself never sorts and never shuffles. Ties and
    boundary-equal values bin deterministically (<= comparison).
    Unlike ntile, bin populations can deviate when many rows tie at a
    boundary — the price of not sorting; at training-data scale that
    is the correct trade.

    NULL values stay unbinned (NULL bin): every boundary comparison is
    NULL for them, and without the explicit guard the ``otherwise``
    branch would silently claim them for the top bin.
    """
    bounds = df.agg(
        F.percentile(value_col, F.array(*[F.lit(p) for p in probs])).alias("__b")
    )
    expr = F.when(F.col(value_col).isNull(), F.lit(None).cast("int"))
    expr = expr.when(F.col(value_col) <= F.col("__b")[0], 1)
    for i in range(1, len(probs)):
        expr = expr.when(F.col(value_col) <= F.col("__b")[i], i + 1)
    expr = expr.otherwise(len(probs) + 1)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(bin_col, expr)
        .drop("__b")
    )


def source_mixture(
    df: DataFrame,
    *,
    source_col: str = "source",
    size_col: str | Column | None = None,
    alpha: float = 0.5,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source mixing for a training-data run — the
    multinomial-sampling recipe from multilingual LM training (e.g.
    mBERT/XLM-R's exponent-smoothed sampling, alpha≈0.3-0.7): a
    source's sampling weight is ``n_s^alpha / sum(n_t^alpha)``, which
    up-weights small sources relative to proportional sampling
    (alpha=1) without flattening to uniform (alpha=0).

    ``size_col`` measures a source's size (defaults to row count; pass
    a token-count column/expression for token-budget planning). The
    per-source aggregate is map-side combinable (ONE shuffle of
    (source, partial-sum)); the global normalizer is derived from that
    tiny per-source frame and broadcast back — the corpus is scanned
    exactly once and nothing corpus-sized shuffles.

    Returns one row per source: ``size`` (n_s), ``weight`` (the
    multinomial probability), ``target`` (weight × budget, the rows or
    tokens to draw), and ``epochs`` (target / n_s — how many passes
    over the source the draw implies; >1 means up-sampling).
    """
    size = (
        F.count(F.lit(1))
        if size_col is None
        else F.sum(F.col(size_col) if isinstance(size_col, str) else size_col)
    )
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        size.cast("double").alias("size")
    )
    denom = per.agg(F.sum(F.pow("size", F.lit(alpha))).alias("__denom"))
    return (
        per.crossJoin(F.broadcast(denom))
        .withColumn("weight", F.round(F.pow("size", F.lit(alpha)) / F.col("__denom"), 6))
        .withColumn("target", F.round(F.col("weight") * F.lit(float(budget)), 2))
        .withColumn("epochs", F.round(F.col("target") / F.col("size"), 6))
        .drop("__denom")
    )


def apply_source_mixture(
    df: DataFrame,
    mixture: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Materialize a :func:`source_mixture` plan over the corpus:
    every row of source *s* appears ``floor(epochs_s)`` times plus one
    more copy with probability ``frac(epochs_s)`` — so expected output
    rows per source equal the mixture's ``target`` exactly, covering
    both up-sampling (epochs > 1: row replication, the multilingual-LM
    oversampling recipe) and down-sampling (epochs < 1: deterministic
    subsample) in one rule.

    The per-copy coin is a *deterministic* md5-derived uniform on
    ``(id, copy, seed)`` — reproducible across runs, engines, and
    partitionings (md5 and base-16 conv are bit-identical in Spark
    and DuckDB, so the full materialization carries a value-hash
    oracle; ``rand()`` would not). The tiny mixture frame broadcasts;
    the replication is a narrow ``explode(sequence(...))`` — NO
    shuffle, and the blow-up factor per row is ``ceil(epochs)``, known
    at plan time to be small for any sane temperature.
    """
    # the mixture frame always names its group column "source"
    # (source_mixture aliases it); rebind to the caller's source_col so
    # any mixture axis (source, predicted language, domain) joins back
    mix_key = "source" if "source" in mixture.columns else source_col
    m = F.broadcast(
        mixture.select(
            F.col(mix_key).alias(source_col), "epochs"
        ).filter(F.col("epochs") > 0)
    )
    n_copies = F.greatest(F.lit(1), F.ceil("epochs")).cast("int")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col), F.col("copy"), F.lit(seed))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    frac = F.col("epochs") - F.floor("epochs")
    return (
        df.join(m, source_col)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), n_copies)))
        .filter((F.col("copy") <= F.floor("epochs")) | (u < frac))
        .drop("epochs")
    )


def stratified_weighted_sample(
    df: DataFrame,
    *,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Per-group weighted sampling without replacement: within every
    group, the A-ES rule (rank by ``u^(1/w)``, keep top k) with the
    md5-derived uniform — the per-stratum quota version of
    :func:`weighted_sample` (draw k high-quality docs per language,
    per source, per topic...).

    One exchange on the group key, a per-group window top-k over the
    rounded key (engine-stable ordering, ties to the lower id), and
    the draw is a pure function of (id, weight, seed): reproducible
    across runs, partitionings, and engines — the whole sample
    carries a value-hash oracle. Rows with weight <= 0 or NULL never
    select. Group skew is bounded: the window state per group is the
    running top-k, not the group.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.round(F.pow(u, F.lit(1.0) / w), 9))
    win = W.partitionBy(group_col).orderBy(
        F.desc("_aes_key"), F.col(id_col)
    )
    return (
        df.withColumn("_aes_key", key)
        .filter(F.col("_aes_key").isNotNull())
        .withColumn("_aes_rank", F.row_number().over(win))
        .filter(F.col("_aes_rank") <= k)
        .drop("_aes_key", "_aes_rank")
    )
