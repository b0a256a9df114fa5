"""Skew & co-location toolkit — the knobs that keep shuffles healthy
at 100 TB when AQE alone isn't enough.

- **salted_join**: for a join where one side has a few pathologically
  hot keys (one user with 10^8 events), append a random salt ∈ [0, S)
  to the hot side and replicate the other side S× — the hot key's rows
  spread over S reducers instead of one straggler. Cost: S× row
  replication of the replicated side, so pick S ≈ (hot-key rows /
  healthy-partition rows), and salt ONLY when AQE's skew-join split
  (enabled in session.py) can't help — e.g. aggregations after the
  join, or sort-merge paths AQE won't split.
- **bucketed writes**: pre-shuffle the data ONCE at write time
  (``bucketBy`` on the join/agg key); every later join or groupBy on
  that key is exchange-free. This is the amortization play for fact
  tables joined repeatedly on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def key_skew_stats(
    frames: list[tuple[str, DataFrame, str]],
    *,
    skew_threshold: float = 4.0,
    max_salt: int = 64,
) -> DataFrame:
    """Per-key distribution audit for prospective join/agg keys — the
    measurement that decides whether :func:`salted_join` (and what
    salt factor) is warranted BEFORE a 100 TB shuffle straggles.

    ``frames`` is a list of (label, df, key_col). For each key: exact
    NDV, total rows, hottest-key row count, exact p99 of the per-key
    count distribution, and ``skew_ratio = max / p99`` — the
    straggler signal AQE's stats also react to, surfaced as a table
    so the decision is explicit and reviewable. ``salt`` is the
    recommended factor, ``ceil(max / p99)`` clamped to
    [1, ``max_salt``], emitted only when ``skew_ratio`` crosses
    ``skew_threshold`` (otherwise 1 = don't salt: salting has a
    replication cost).

    One grouped count per frame (map-side partial combine), then a
    per-label rollup over key-count rows — no payload columns ever
    shuffle."""
    if not frames:
        raise ValueError("frames must be non-empty")
    per = None
    for label, df, key in frames:
        p = df.select(
            F.lit(label).alias("key_col"),
            F.col(key).cast("string").alias("k"),
        )
        per = p if per is None else per.unionAll(p)
    counts = per.groupBy("key_col", "k").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    stats = counts.groupBy("key_col").agg(
        F.count(F.lit(1)).cast("long").alias("ndv"),
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("max_n"),
        F.expr("percentile(n, 0.99)").alias("p99_n"),
    )
    skew = F.col("max_n") / F.col("p99_n")
    return stats.select(
        "key_col",
        "ndv",
        "total",
        "max_n",
        F.round("p99_n", 6).alias("p99_n"),
        F.round(skew, 6).alias("skew_ratio"),
        F.when(
            skew > skew_threshold,
            F.least(
                F.lit(max_salt).cast("long"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(F.col("max_n") / F.col("p99_n")),
                ),
            ),
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("salt"),
    ).orderBy("key_col")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left side salted and the right side
    replicated ``salt``×. Semantically identical to
    ``left.join(right, on, how)`` for inner/left joins on equi-keys.

    ``F.rand(seed)`` is per-partition deterministic, so task retries
    reproduce the same salt assignment (no duplicate/lost rows under
    speculative execution).
    """
    keys = [on] if isinstance(on, str) else list(on)
    l_salted = left.withColumn(
        "_salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_salted.join(r_replicated, [*keys, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by the given key(s) (and
    optionally sorted within buckets). Joins and aggregations between
    tables bucketed by the same key with the same bucket count run
    with NO exchange — the shuffle was paid once, at write time
    (asserted in tests/test_scale.py).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        # external table: bucket METADATA lives in the (in-memory)
        # catalog, bytes at the caller's path — no warehouse-dir writes
        w = w.option("path", path)
    w.saveAsTable(table_name)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str] | str,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hive-partitioned by the given column(s) — the
    data-layout play for predicate-heavy corpora: a downstream read
    filtering on a partition column scans ONLY the matching
    directories (partition pruning — `PartitionFilters` at the scan,
    asserted in tests/test_scale.py), so a per-language or per-date
    training job reads 1/N of a 100 TB corpus instead of all of it.

    Pick low-cardinality columns (language, date, split) — thousands
    of partitions, not millions: the listing itself becomes the
    bottleneck past that, and tiny files kill scan throughput.
    ``max_records_per_file`` caps file size where partitions are
    skewed (one giant language), letting AQE-coalesced tasks write
    multiple files instead of one huge one.
    """
    cols = (
        [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    )
    w = df.write.format("parquet").mode(mode).partitionBy(*cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)


def zorder_value(cols: list[str], *, bits: int = 16) -> "F.Column":
    """Morton/Z-curve interleaving of N non-negative integer rank
    columns into one clustering key, pure codegen: bit i of column j
    lands at position ``i*N + j``. Columns must already be bounded
    ranks (``< 2^bits``) — compose with ``F.ntile`` / dictionary codes
    for raw values."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write parquet clustered along a Z-curve over ``cols`` — the
    data-skipping play for MULTI-column predicates, where a plain sort
    helps only its leading column: range-partition + sort by the
    interleaved key and every file covers a small hyper-rectangle, so
    parquet row-group min/max stats prune scans on ANY of the curve's
    columns (the Delta/Iceberg OPTIMIZE ZORDER technique, expressed
    with stock Spark: one range exchange, one in-partition sort,
    codegen-only key math)."""
    z = zorder_value(cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training
    reproducibility: every row gets a pseudo-random but REPRODUCIBLE
    order key (md5 of ``seed:id``), a shard (key mod n_shards), and a
    position within its shard. The same corpus with the same seed
    yields byte-identical shard layouts on every run, engine, and
    partitioning — which is what makes a training run resumable and a
    data-ablation comparable (``rand()`` would give neither), and what
    lets two teams agree on "epoch 3, shard 17, position 40122".

    Scale shape: key and shard are pure codegen; the only exchange is
    the per-shard window (partition by shard — n_shards-way, balanced
    by construction since md5 is uniform). Write the result with
    ``partitionBy("shard")`` for shard-pruned training reads.
    """
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"shuffle:{seed}:"), F.col(id_col))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    from pyspark.sql import Window as W

    out = df.withColumn("__key", key).withColumn(
        "shard", F.pmod(F.col("__key"), F.lit(n_shards)).cast("int")
    )
    w = W.partitionBy("shard").orderBy("__key", id_col)
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__key")
    )


def export_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Materialize a :func:`deterministic_shuffle` as shard-partitioned
    parquet (``path/shard=K/``) and return the 1-row-per-shard manifest
    (rows, and token count when an ``n_tok`` column exists) — the
    WebDataset-style export a trainer consumes shard-by-shard with
    directory pruning. The manifest is written next to the corpus at
    ``{path}__manifest``."""
    sharded = deterministic_shuffle(
        df, id_col=id_col, n_shards=n_shards, seed=seed
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    if "n_tok" in sharded.columns:
        aggs.append(F.sum("n_tok").cast("long").alias("n_tok"))
    manifest = sharded.groupBy("shard").agg(*aggs).orderBy("shard")
    manifest.write.mode("overwrite").parquet(f"{path}__manifest")
    return manifest


def rendezvous_assign(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "hrw",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each row
    goes to ``argmax_i md5(seed:id:i)`` — the hashing scheme whose
    RESHARD cost is provably minimal: growing from N to N+1 shards
    moves exactly the rows whose new-shard score wins (expected
    1/(N+1) of the data), and every mover goes TO the new shard;
    nothing reshuffles between survivors (vs mod-N hashing, which
    moves ~half the corpus). That is the property that makes a 100 TB
    shard layout EXPANDABLE without a full rewrite.

    Pure codegen — n_shards md5 scores per row, first-argmax
    tie-break (md5 collisions aside, ties are impossible), no shuffle,
    engine-exact (the md5/conv contract)."""
    idc = F.col(id_col).cast("string")
    scores = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(seed), idc, F.lit(str(i)))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            for i in range(n_shards)
        ]
    )
    shard = (F.array_position(scores, F.array_max(scores)) - 1).cast("long")
    return df.withColumn(out_col, shard)


def jackknife_ci(
    df: DataFrame,
    value_col: str,
    *,
    unit_col: str,
    buckets: int = 50,
    group_cols: list[str] | None = None,
    z: float = 1.96,
    seed: int = 7,
) -> DataFrame:
    """Delete-one-bucket jackknife confidence interval for the MEAN of
    ``value_col`` — the variance estimator big A/B pipelines actually
    use at scale: rows hash by ``unit_col`` into ``buckets`` cohorts
    (all of one unit's rows leave together, so within-unit correlation
    is respected — a plain per-row bootstrap would understate the
    variance), each leave-one-bucket-out mean is recomputed from the
    bucket aggregates in closed form, and
    var = (B−1)/B · Σ (θ₍ᵢ₎ − θ̄₍.₎)².

    Scale shape: ONE aggregate reduces the corpus to ≤ groups×B rows
    of exact decimal (sum, count) partials (map-side combinable, the
    only exchange); every leave-one-out estimate is then arithmetic on
    that tiny frame — no resampled rescans, no per-replica shuffles
    (the reason jackknife beats bootstrap at 100 TB: B re-scans
    become 0). The md5 bucket coin is engine-reproducible, so the
    whole CI carries a full SQL oracle. A group whose rows all land in
    ONE bucket has no leave-one-out estimate and reports NULL se/ci
    (document upstream; raise ``buckets`` or check unit cardinality).
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    gcols = list(group_cols or [])
    bkt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(unit_col).cast("string"),
                        F.lit(f":{seed}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % buckets
    )
    per = (
        df.select(*gcols, bkt.alias("__b"), F.col(value_col).alias("__v"))
        .groupBy(*gcols, "__b")
        .agg(
            F.sum(F.col("__v").cast("decimal(28,6)")).alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        # the bucket frame (≤ groups×B rows) feeds BOTH the
        # leave-one-out branch and the θ̄ branch; materialize it so
        # the corpus scans ONCE, not once per branch
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    # NOTE: names must differ case-insensitively — Spark resolves
    # columns case-insensitively by default, so "S" would REPLACE "s".
    tot = (
        per.withColumn("__St", F.sum("s").over(w))
        .withColumn("__Nt", F.sum("n").over(w))
        .withColumn("nb", F.count(F.lit(1)).over(w))
    )
    loo = tot.withColumn(
        "m",
        (F.col("__St") - F.col("s")).cast("double")
        / F.nullif(F.col("__Nt") - F.col("n"), F.lit(0)).cast("double"),
    )
    # the centered squared sum needs θ̄₍.₎ first; both passes run on
    # the tiny (groups × B) bucket frame, not the corpus
    mbar = loo.groupBy(*gcols).agg(
        F.avg("m").alias("__mbar"),
        F.max("nb").alias("__nb"),
        F.max("__Nt").cast("long").alias("__n_total"),
        # divide as doubles (not decimal/long) so the oracle's double
        # division reproduces the value bit-for-bit
        F.round(
            F.max("__St").cast("double") / F.max("__Nt").cast("double"),
            6,
        ).alias("__mean"),
    )
    joined = (
        loo.select(*gcols, "m").join(F.broadcast(mbar), gcols)
        if gcols
        else loo.select("m").crossJoin(F.broadcast(mbar))
    )
    var = joined.groupBy(*gcols).agg(
        F.max("__n_total").alias("n"),
        F.max("__mean").alias("mean"),
        F.max("__nb").alias("__nb"),
        F.sum(
            (F.col("m") - F.col("__mbar"))
            * (F.col("m") - F.col("__mbar"))
        ).alias("__ss"),
    )
    se = F.sqrt(
        (F.col("__nb") - 1).cast("double") / F.col("__nb") * F.col("__ss")
    )
    out = var.select(
        *gcols,
        "n",
        "mean",
        F.col("__nb").cast("long").alias("n_buckets"),
        F.round(se, 6).alias("se"),
        F.round(F.col("mean") - F.lit(z) * se, 6).alias("ci_lo"),
        F.round(F.col("mean") + F.lit(z) * se, 6).alias("ci_hi"),
    )
    return out.orderBy(*gcols) if gcols else out


def zonemap_prune_report(
    df: DataFrame,
    *,
    value_col: str,
    lo: float,
    hi: float,
    layouts: list[tuple[str, str]],
    tiebreak_col: str,
    n_chunks: int = 64,
) -> DataFrame:
    """Zone-map (min/max data-skipping) WHAT-IF simulator: for each
    candidate layout — "cluster the table by column X" — chunk the
    rows into ``n_chunks`` equal row-groups in that order, compute
    each chunk's min/max of ``value_col`` (exactly the stats parquet
    keeps per row group and Delta/Iceberg keep per file), and report
    how many chunks a ``BETWEEN lo AND hi`` predicate could skip.
    This quantifies, BEFORE rewriting 100 TB, what
    ``zorder_write``/``write_partitioned`` would buy a given
    predicate: clustering by the predicate column typically prunes
    ~(1 − selectivity) of chunks; an uncorrelated layout prunes ~0.

    Per layout: one 3-column projection (order key, value, tiebreak)
    through an ntile window — a sort of id-width rows, never the
    payload — folding straight to ``n_chunks`` stat cells. The
    tiebreak column MUST be unique (ntile on a non-unique order is
    partition-order nondeterministic — chunk stats wouldn't be
    reproducible run to run). At warehouse scale run it on a uniform
    sample; skip-rate estimates converge fast and the chunk count,
    not the row count, sets the report's resolution."""
    out = None
    for label, order_col in layouts:
        from pyspark.sql import Window

        chunked = df.select(
            F.col(value_col).cast("double").alias("__v"),
            F.col(order_col).alias("__o"),
            F.col(tiebreak_col).alias("__tb"),
        ).withColumn(
            "__chunk",
            F.ntile(n_chunks).over(Window.orderBy("__o", "__tb")),
        )
        stats = chunked.groupBy("__chunk").agg(
            F.min("__v").alias("mn"),
            F.max("__v").alias("mx"),
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(
                F.col("__v").between(lo, hi).cast("long")
            ).cast("long").alias("matching"),
        )
        hit = (F.col("mx") >= lo) & (F.col("mn") <= hi)
        row = stats.agg(
            F.lit(label).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(hit.cast("long")).cast("long").alias("chunks_hit"),
            F.round(
                1 - F.sum(hit.cast("long")) / F.count(F.lit(1)), 6
            ).alias("prune_rate"),
            F.sum(F.when(hit, F.col("rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("matching").cast("long").alias("rows_matching"),
        ).select(
            "layout",
            "n_chunks",
            "chunks_hit",
            "prune_rate",
            "rows_scanned",
            "rows_matching",
            F.round(
                F.try_divide(
                    F.col("rows_matching"), F.col("rows_scanned")
                ),
                6,
            ).alias("scan_efficiency"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("layouts must be non-empty")
    return out.orderBy("layout")


def cuped_adjust(
    units: DataFrame,
    *,
    metric_col: str,
    covariate_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13) over a
    UNIT-level frame (one row per user/experiment unit with the
    experiment-period metric Y and a pre-period covariate X):
    θ = cov(X,Y)/var(X), Y_adj = Y − θ(X − E[X]), and
    var(Y_adj) = var(Y)·(1 − ρ²) — the standard trick that makes A/B
    metrics readable days earlier, reported as
    (n, mean, theta, var, var_adjusted, var_reduction, se_naive,
    se_cuped) per group. ``var_reduction`` IS ρ²: the share of metric
    variance the pre-period already explains.

    Scale shape: ONE aggregate pass over the unit frame computing the
    five moment sums — no second scan, no per-unit adjustment
    materialized (the adjusted MEAN equals the raw mean identically;
    what changes is the variance, and that is closed-form from the
    moments). Unit values are rounded to 6dp and summed as exact
    decimals, so the moments — and every statistic derived from them —
    are bit-reproducible across engines and partitionings (a naive
    double Σxy drifts with partition order at 100 TB). Degenerate
    groups (var(X) = 0 or var(Y) = 0) report NULL theta/ρ² via
    try_divide instead of aborting."""
    gcols = list(group_cols or [])
    x = F.round(F.col(covariate_col).cast("double"), 6).cast(
        "decimal(18,6)"
    )
    y = F.round(F.col(metric_col).cast("double"), 6).cast(
        "decimal(18,6)"
    )
    agg = units.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    varx = sxx / n - (sx / n) * (sx / n)
    vary = syy / n - (sy / n) * (sy / n)
    cov = sxy / n - (sx / n) * (sy / n)
    theta = F.try_divide(cov, varx)
    rho2 = F.try_divide(cov * cov, varx * vary)
    # fp double rounding of exact moments can push ρ² an ulp past 1;
    # clamp so var_adjusted (and its sqrt) never goes negative/NaN
    var_adj = F.greatest(vary * (1 - rho2), F.lit(0.0))
    out = agg.select(
        *gcols,
        "n",
        F.round(sy / n, 6).alias("mean"),
        F.round(theta, 6).alias("theta"),
        F.round(vary, 6).alias("var"),
        F.round(var_adj, 6).alias("var_adjusted"),
        F.round(rho2, 6).alias("var_reduction"),
        F.round(F.sqrt(vary / n), 6).alias("se_naive"),
        F.round(F.sqrt(var_adj / n), 6).alias("se_cuped"),
    )
    return out.orderBy(*gcols) if gcols else out


def join_cardinality(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Pre-join cardinality audit: for each prospective equi-join
    ``(name, left, left_key, right, right_key)``, the EXACT output
    size Σₖ c_left(k)·c_right(k) plus the expansion factor and the
    hottest key's contribution — the numbers that say, before a
    100 TB join is submitted, whether it's 1:1, a benign fan-out, or
    a many-to-many explosion one hot key will turn into a straggler
    (then: :func:`salted_join`, or fix the key). Catalyst estimates
    this from sampled stats; this is the measured answer, at id-width
    cost.

    Scale shape, per relation: each side folds to a (key, count)
    frame — the ONLY exchanges are id-width — joined on the key and
    reduced to one row. Nothing about the payload or the actual join
    output is materialized; cost ~ two distinct-key aggregations,
    orders of magnitude below running the join to count it."""
    out = None
    for name, left, lk, right, rk in relations:
        ca = left.groupBy(F.col(lk).alias("__k")).agg(
            F.count(F.lit(1)).cast("long").alias("na")
        )
        cb = right.groupBy(F.col(rk).alias("__k")).agg(
            F.count(F.lit(1)).cast("long").alias("nb")
        )
        j = ca.join(cb, "__k")
        row = (
            j.agg(
                F.count(F.lit(1)).cast("long").alias("matched_keys"),
                F.sum(F.col("na") * F.col("nb"))
                .cast("long")
                .alias("join_rows"),
                F.max(F.col("na") * F.col("nb"))
                .cast("long")
                .alias("max_key_rows"),
            )
            .crossJoin(
                ca.agg(F.sum("na").cast("long").alias("left_rows"))
            )
            .crossJoin(
                cb.agg(F.sum("nb").cast("long").alias("right_rows"))
            )
            .select(
                F.lit(name).alias("relation"),
                "left_rows",
                "right_rows",
                F.coalesce("matched_keys", F.lit(0)).alias(
                    "matched_keys"
                ),
                F.coalesce("join_rows", F.lit(0)).alias("join_rows"),
                F.coalesce("max_key_rows", F.lit(0)).alias(
                    "max_key_rows"
                ),
                F.round(
                    F.coalesce("join_rows", F.lit(0))
                    / F.greatest("left_rows", "right_rows"),
                    6,
                ).alias("expansion"),
                F.round(
                    F.try_divide(
                        F.col("max_key_rows"), F.col("join_rows")
                    ),
                    6,
                ).alias("top_key_share"),
            )
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("relations must be non-empty")
    return out.orderBy("relation")


def mann_whitney(
    df: DataFrame,
    value_col: str,
    *,
    side_col: str,
    side_a,
    group_cols: list[str] | None = None,
    z_crit: float = 1.96,
) -> DataFrame:
    """Mann–Whitney U test (two-sided, normal approximation with tie
    correction) between the ``side_a`` rows and the rest — the
    nonparametric "did the distribution shift" test that stays valid
    when values are skewed or heavy-tailed (where the t-test behind
    :func:`jackknife_ci`'s CI leans on means). Reports per group:
    n_a, n_b, U (for side A), the tie-corrected z, and
    ``significant`` at |z| > ``z_crit``.

    Scale shape — no ranks, no global sort of rows: U only depends on
    per-DISTINCT-VALUE counts per side, so the corpus folds to one
    (group, value, count_a, count_b) aggregate first (map-side
    combinable); the rank arithmetic
    U = Σᵥ c_a(v)·(cumB(<v) + ½·c_b(v)) then runs as a window over
    the distinct-value frame — thousands of rows, not the 100 TB of
    events a textbook rank() would sort. Tie correction uses the
    standard Σ(t³−t) term. NULL values drop; a group with one side
    empty reports NULL z."""
    gcols = list(group_cols or [])
    is_a = F.col(side_col) == F.lit(side_a)
    c = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, F.col(value_col).alias("__v"))
        .agg(
            F.sum(is_a.cast("long")).alias("ca"),
            F.sum((~is_a).cast("long")).alias("cb"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = c.withColumn(
        "__cum_b", F.coalesce(F.sum("cb").over(w), F.lit(0))
    )
    t = (F.col("ca") + F.col("cb")).cast("double")
    agg = c.groupBy(*gcols).agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(
            F.col("ca")
            * (F.col("__cum_b") + F.lit(0.5) * F.col("cb"))
        ).alias("__u"),
        F.sum(t * t * t - t).alias("__ties"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    var = (
        na
        * nb
        / 12.0
        * ((n + 1) - F.try_divide(F.col("__ties"), n * (n - 1)))
    )
    z = F.try_divide(F.col("__u") - na * nb / 2.0, F.sqrt(var))
    out = agg.select(
        *gcols,
        "n_a",
        "n_b",
        F.round("__u", 6).alias("u"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > z_crit).alias("significant"),
    )
    return out.orderBy(*gcols) if gcols else out


def ks_test(
    df: DataFrame,
    value_col: str,
    *,
    side_col: str,
    side_a,
    group_cols: list[str] | None = None,
    alpha_c: float = 1.358,  # c(α) for α = 0.05
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: D = max |ECDF_a − ECDF_b|
    per group, with the asymptotic α=0.05 rejection threshold
    c(α)·√((n_a+n_b)/(n_a·n_b)) — the distribution-shift test that is
    sensitive everywhere on the CDF (Mann–Whitney concentrates on
    location; PSI needs bins). Same scalable shape as
    :func:`mann_whitney`: ECDFs only change at distinct values, so
    the corpus folds to one (group, value, count_a, count_b)
    aggregate and D is a running-max window over that small frame —
    no global row sort, no rank over raw events. D is exact rational
    arithmetic on counts (engine-exact). NULL values drop; a group
    with an empty side reports NULL D."""
    gcols = list(group_cols or [])
    is_a = F.col(side_col) == F.lit(side_a)
    c = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, F.col(value_col).alias("__v"))
        .agg(
            F.sum(is_a.cast("long")).alias("ca"),
            F.sum((~is_a).cast("long")).alias("cb"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*gcols)
    c = (
        c.withColumn("__cum_a", F.sum("ca").over(w))
        .withColumn("__cum_b", F.sum("cb").over(w))
        .withColumn("__na", F.sum("ca").over(wtot))
        .withColumn("__nb", F.sum("cb").over(wtot))
    )
    agg = c.groupBy(*gcols).agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.max(
            F.abs(
                F.try_divide(
                    F.col("__cum_a").cast("double"), F.col("__na")
                )
                - F.try_divide(
                    F.col("__cum_b").cast("double"), F.col("__nb")
                )
            )
        ).alias("__d"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    crit = F.lit(alpha_c) * F.sqrt(F.try_divide(na + nb, na * nb))
    d = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("__d"))
    out = agg.select(
        *gcols,
        "n_a",
        "n_b",
        F.round(d, 6).alias("d"),
        F.round(crit, 6).alias("d_crit"),
        (F.round(d, 6) > F.round(crit, 6)).alias("significant"),
    )
    return out.orderBy(*gcols) if gcols else out


def corr_matrix(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Pearson correlation for every pair of the given numeric columns
    in ONE scan: a single aggregate computes n plus per-column sums,
    squares, and all C(k,2) cross-product sums, and the pairwise
    correlations unpivot from that one report row — the profiling
    query behind feature-redundancy screens and "which measures move
    together" dashboards, at the cost of one pass however many
    columns (the naive ``df.stat.corr`` per pair rescans k²/2 times).

    Inputs are rounded to 6dp and summed as exact decimals, so every
    correlation is bit-reproducible across engines and partition
    orders (raw double Σxy drifts with reduction order at scale).
    Rows where either column of a pair is NULL are excluded from that
    pair (pairwise deletion), handled per-pair in the same single
    scan. Degenerate pairs (zero variance) report NULL."""
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]

    # Project each rounded decimal ONCE; the 6·C(k,2) aggregate
    # expressions then reference the projected columns instead of
    # re-expanding the round/cast tree per term (the de-inline that
    # took x9_pq_perm_error from 11.6s to 2.4s applies here too).
    proj = df.select(
        *[
            F.round(F.col(c).cast("double"), 6)
            .cast("decimal(18,6)")
            .alias(f"__d6_{c}")
            for c in cols
        ]
    )
    aggs = []
    for a, b in pairs:
        da, db = F.col(f"__d6_{a}"), F.col(f"__d6_{b}")
        both = da.isNotNull() & db.isNotNull()
        xa, xb = F.when(both, da), F.when(both, db)
        p = f"{a}__{b}"
        aggs += [
            F.sum(both.cast("long")).alias(f"n_{p}"),
            F.sum(xa).alias(f"sx_{p}"),
            F.sum(xb).alias(f"sy_{p}"),
            F.sum(xa * xa).alias(f"sxx_{p}"),
            F.sum(xb * xb).alias(f"syy_{p}"),
            F.sum(xa * xb).alias(f"sxy_{p}"),
        ]
    rep = proj.agg(*aggs)

    def corr_col(a: str, b: str):
        p = f"{a}__{b}"
        n = F.col(f"n_{p}").cast("double")
        sx = F.col(f"sx_{p}").cast("double")
        sy = F.col(f"sy_{p}").cast("double")
        sxx = F.col(f"sxx_{p}").cast("double")
        syy = F.col(f"syy_{p}").cast("double")
        sxy = F.col(f"sxy_{p}").cast("double")
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) * (sx / n)
        vy = syy / n - (sy / n) * (sy / n)
        return F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"n_{p}").alias("n"),
            F.round(
                F.try_divide(cov, F.sqrt(vx * vy)), 6
            ).alias("corr"),
        )

    rows = F.array(*[corr_col(a, b) for a, b in pairs])
    return (
        rep.select(F.explode(rows).alias("r"))
        .select("r.col_a", "r.col_b", "r.n", "r.corr")
        .orderBy("col_a", "col_b")
    )


def auc_score(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC AUC from the rank statistic — AUC =
    P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) = U/(n⁺·n⁻) — for a
    boolean/0-1 ``label_col`` against any numeric score: the
    classifier/retrieval separability readout, computed WITHOUT
    materializing the ROC curve or ranking raw rows.

    Same scalable fold as :func:`mann_whitney` (AUC is the
    Mann–Whitney U, normalized): the corpus reduces to per-DISTINCT-
    SCORE (positive, negative) counts — map-side combinable — and U
    is a cumulative window over that small frame. Counts and halves
    are exact doubles, so AUC is engine-exact. Groups with one class
    missing report NULL."""
    gcols = list(group_cols or [])
    pos = F.col(label_col).cast("int") == 1
    c = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(*gcols, F.col(score_col).alias("__s"))
        .agg(
            F.sum(pos.cast("long")).alias("cp"),
            F.sum((~pos).cast("long")).alias("cn"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*gcols)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = c.withColumn(
        "__cum_n", F.coalesce(F.sum("cn").over(w), F.lit(0))
    )
    agg = c.groupBy(*gcols).agg(
        F.sum("cp").cast("long").alias("n_pos"),
        F.sum("cn").cast("long").alias("n_neg"),
        F.sum(
            F.col("cp")
            * (F.col("__cum_n") + F.lit(0.5) * F.col("cn"))
        ).alias("__u"),
    )
    auc = F.try_divide(
        F.col("__u"),
        F.col("n_pos").cast("double") * F.col("n_neg"),
    )
    out = agg.select(
        *gcols, "n_pos", "n_neg", F.round(auc, 6).alias("auc")
    )
    return out.orderBy(*gcols) if gcols else out


def srm_check(
    df: DataFrame,
    *,
    unit_col: str,
    variant_col: str,
    expected: list[tuple[str, float]],
    group_cols: list[str] | None = None,
    chi2_crit: float = 3.841459,
) -> DataFrame:
    """Sample-ratio mismatch check (round 8) — the first gate every
    experiment readout must pass: if the DISTINCT-unit split across
    variants deviates from the designed allocation, randomization is
    broken and every downstream metric is suspect (Fabijan et al.,
    KDD'19 diagnoses SRM as the most common A/B pipeline bug).
    Pearson chi-square over per-variant distinct-unit counts against
    the ``expected`` shares; ``srm`` flags chi2 above ``chi2_crit``
    (default: p<0.05 at df=1 — pass the right critical value for more
    variants).

    Scale shape: ONE distinct on (group, variant, unit) — map-side
    combinable hash aggregate, spill-safe — then counts fold to a
    variants-sized frame per group; the chi-square is a codegen
    expression over that tiny frame. Variants missing from a group
    count zero (the worst SRM there is). Returns one row per group:
    group_cols…, per-variant counts folded to (variant, n) pairs is
    deliberately NOT the shape — the chi-square needs all variants in
    one row, so counts pivot to n_total plus chi2/srm."""
    gcols = list(group_cols or [])
    units = df.select(
        *gcols, F.col(variant_col).alias("__v"), F.col(unit_col).alias("__u")
    ).distinct()
    counts = units.groupBy(*gcols).pivot(
        "__v", [v for v, _ in expected]
    ).agg(F.count(F.lit(1)))
    total = None
    for v, _ in expected:
        c = F.coalesce(F.col(f"`{v}`"), F.lit(0))
        total = c if total is None else total + c
    chi2 = None
    for v, share in expected:
        o = F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("double")
        e = total.cast("double") * F.lit(float(share))
        term = F.try_divide((o - e) * (o - e), e)
        chi2 = term if chi2 is None else chi2 + term
    out = counts.select(
        *gcols,
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0))
            .cast("long")
            .alias(f"n_{v}")
            for v, _ in expected
        ],
        total.cast("long").alias("n_total"),
        F.round(chi2, 6).alias("chi2"),
        (F.round(chi2, 6) > chi2_crit).alias("srm"),
    )
    return out.orderBy(*gcols) if gcols else out


def diff_in_diff(
    df: DataFrame,
    *,
    outcome_col: str,
    treat_col: str,
    post_col: str,
) -> DataFrame:
    """Difference-in-differences estimator (round 8): the 2×2
    pre/post × treatment/control design — effect = (post_T − pre_T)
    − (post_C − pre_C), the workhorse causal readout when treatment
    was NOT randomized over time (feature launches, infra rollouts).
    Cell means in exact DECIMAL (associativity-independent), the
    large-sample SE from per-cell variances
    (sqrt Σ s²_g/n_g), two-sided z at 1.96.

    Scale shape: ONE aggregate over the corpus computes all four
    cells' n/Σ/Σ² via conditional sums (map-side combinable, no
    shuffle beyond the single global fold); every derived quantity is
    closed-form arithmetic on that 1-row frame. Returns one row:
    cell means, did, se, z, significant."""
    t = F.col(treat_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    y = F.col(outcome_col).cast("decimal(28,10)")
    yd = F.col(outcome_col).cast("double")
    # squares sum in DECIMAL too: one deterministic product per row,
    # exact addition — the SE is then order-independent across engines
    y2 = (yd * yd).cast("decimal(38,10)")
    cells = {}
    agg_exprs = []
    for name, cond in [
        ("pre_c", ~t & ~p),
        ("post_c", ~t & p),
        ("pre_t", t & ~p),
        ("post_t", t & p),
    ]:
        agg_exprs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__n_{name}"),
            F.sum(F.when(cond, y)).alias(f"__s_{name}"),
            F.sum(F.when(cond, y2)).alias(f"__q_{name}"),
        ]
        cells[name] = cond
    a = df.filter(F.col(outcome_col).isNotNull()).agg(*agg_exprs)
    mean = {}
    var_over_n = {}
    for name in cells:
        n = F.col(f"__n_{name}").cast("double")
        s = F.col(f"__s_{name}").cast("double")
        q = F.col(f"__q_{name}").cast("double")
        mean[name] = F.try_divide(s, n)
        # s²/n with the unbiased (n-1) denominator
        var_over_n[name] = F.try_divide(
            F.try_divide(q - n * mean[name] * mean[name], n - 1), n
        )
    did = (mean["post_t"] - mean["pre_t"]) - (mean["post_c"] - mean["pre_c"])
    se = F.sqrt(
        var_over_n["pre_c"]
        + var_over_n["post_c"]
        + var_over_n["pre_t"]
        + var_over_n["post_t"]
    )
    z = F.try_divide(did, se)
    return a.select(
        *[F.col(f"__n_{c}").alias(f"n_{c}") for c in cells],
        *[F.round(mean[c], 6).alias(f"mean_{c}") for c in cells],
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("significant"),
    )


def sprt_trace(
    trials: DataFrame,
    *,
    period_col: str,
    variant_col: str,
    success_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (1945) over a
    Bernoulli trial stream, traced per period — the always-valid
    early-stopping readout a fixed-horizon t-test can't give: peek
    every day, stop the moment the cumulative log-likelihood ratio
    leaves (B, A), with type-I/II error still controlled at
    (alpha, beta). H0: p = ``p0`` vs H1: p = ``p1``; per
    (variant, period) the trace reports cumulative trials n,
    successes k, llr = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)),
    the boundary decision, and whether a decision had been reached
    by that period (`stopped` — everything after the first crossing
    is moot, Wald says ignore it).

    Exactness: the two log-weights and both boundaries are computed
    ONCE in Python, rounded to 12, and inlined as literals, so Spark
    and any SQL oracle multiply the SAME doubles — no cross-engine
    ln() ulp drift; llr rounds to 6 per row.

    Scale shape: one (variant, period) count/sum aggregate collapses
    the trial stream (map-side combinable), then every window runs on
    the periods×variants-sized frame — the 100 TB of raw trials never
    meets a window. Returns one row per (variant, period)."""
    day = (
        trials.select(
            F.col(variant_col).alias("variant"),
            F.col(period_col).alias("period"),
            F.col(success_col).cast("long").alias("__s"),
        )
        .groupBy("variant", "period")
        .agg(
            F.count(F.lit(1)).alias("n_p"),
            F.sum("__s").alias("k_p"),
        )
    )
    return sprt_from_daily(
        day, p0=p0, p1=p1, alpha=alpha, beta=beta
    )


def sprt_from_daily(
    day: DataFrame,
    *,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """The day-grain SPRT kernel shared by :func:`sprt_trace` and the
    streaming store readout (``streaming.incremental.sprt_over``):
    input is the pre-aggregated (variant, period, n_p, k_p) frame —
    per-period trial/success counts, the mergeable sufficient
    statistic — so every window here runs on a periods×variants-sized
    frame. Same literal-inlining exactness contract as
    :func:`sprt_trace`."""
    import math

    from pyspark.sql import Window as W

    w1 = round(math.log(p1 / p0), 12)
    w0 = round(math.log((1.0 - p1) / (1.0 - p0)), 12)
    ub = round(math.log((1.0 - beta) / alpha), 6)
    lb = round(math.log(beta / (1.0 - alpha)), 6)

    cum = W.partitionBy("variant").orderBy("period").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    n = F.sum("n_p").over(cum).cast("long")
    k = F.sum("k_p").over(cum).cast("long")
    llr = F.round(
        k.cast("double") * F.lit(w1)
        + (n - k).cast("double") * F.lit(w0),
        6,
    )
    decision = (
        F.when(llr >= F.lit(ub), F.lit("accept_h1"))
        .when(llr <= F.lit(lb), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    out = day.select(
        "variant",
        "period",
        n.alias("n"),
        k.alias("k"),
        llr.alias("llr"),
        decision.alias("decision"),
    )
    return out.withColumn(
        "stopped",
        F.max((F.col("decision") != "continue").cast("int")).over(cum) == 1,
    ).orderBy("variant", "period")


def ks_p_value(d: Column, n_a: Column, n_b: Column) -> Column:
    """Asymptotic two-sample Kolmogorov p-value from the KS statistic
    and side sizes: λ = D·√(n_a·n_b/(n_a+n_b)), p ≈ 2·Σ_{k=1..5}
    (−1)^{k−1} e^{−2k²λ²} (the Kolmogorov series, truncated — terms
    decay like e^{−2k²} so five are far below round-6), clamped to
    [0, 1] and rounded to 6. D is exact rational on counts and sqrt
    is correctly rounded, so cross-engine drift is confined to exp's
    last ulp — orders below the rounding."""
    lam2 = (
        d * d * (n_a.cast("double") * n_b.cast("double"))
        / (n_a.cast("double") + n_b.cast("double"))
    )
    series = None
    for k in range(1, 6):
        term = F.exp(F.lit(-2.0 * k * k) * lam2)
        term = term if k % 2 == 1 else -term
        series = term if series is None else series + term
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.lit(2.0) * series))
    return F.round(p, 6)


def bh_fdr(
    tests: DataFrame,
    *,
    p_col: str = "p",
    key_cols: list[str] | None = None,
    q: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control over a battery of
    hypothesis tests — run one test per slice (event type, segment,
    feature) and this decides WHICH rejections survive multiplicity:
    sort p ascending, find the largest rank k with p_(k) ≤ q·k/m,
    reject ranks 1..k. The difference between "5 of 100 slices moved"
    and "5 slices crossed α by chance" — every per-slice monitoring
    battery needs this step before paging anyone.

    Ranking uses the ROUNDED p (round-6) with the key columns as the
    tie-break, so rank order — and therefore the discovery set — is
    engine-reproducible even when two tests land on the same p.

    Scale shape: the input IS the battery (one row per already-
    aggregated test — model-sized by construction), so the global
    rank window is over m rows, never raw data. Returns the input
    keys + p, rank, bh_threshold, and the discovery flag."""
    from pyspark.sql import Window as W

    kcols = list(key_cols or [])
    m = F.count(F.lit(1)).over(W.partitionBy())
    rnk = F.row_number().over(
        W.partitionBy().orderBy(F.round(F.col(p_col), 6), *kcols)
    )
    base = tests.select(
        *kcols,
        F.round(F.col(p_col), 6).alias("p"),
        rnk.alias("rank"),
        F.round(
            F.lit(q) * rnk.cast("double") / m.cast("double"), 6
        ).alias("bh_threshold"),
    )
    kstar = F.max(
        F.when(F.col("p") <= F.col("bh_threshold"), F.col("rank")).otherwise(
            F.lit(0)
        )
    ).over(W.partitionBy())
    return base.withColumn(
        "discovery", F.col("rank") <= kstar
    ).orderBy("rank")


def cmh_test(
    df: DataFrame,
    *,
    strata_col: str,
    exposure_col: str,
    exposed,
    outcome_col: str,
    chi2_crit: float = 3.841459,
) -> DataFrame:
    """Cochran–Mantel–Haenszel stratified 2×2 test — the Simpson's-
    paradox guard the experiment battery needs: a pooled conversion
    comparison can reverse sign when exposure is unevenly distributed
    across strata (weekday, country, surface); CMH tests the common
    effect ACROSS the per-stratum 2×2 tables instead, plus the
    Mantel–Haenszel common odds ratio Σ(a·d/n)/Σ(b·c/n), reported
    next to the naive pooled odds ratio so the paradox is visible in
    one row. Continuity-corrected: (|Σa − ΣE| − ½)² / ΣVar with
    E = (a+b)(a+c)/n and Var = (a+b)(c+d)(a+c)(b+d)/(n²(n−1)).

    Exactness: every per-stratum term (E, Var, ad/n, bc/n) rounds to
    9 and sums as DECIMAL(28,9) — associativity-independent, so the
    single report row carries a value-hash oracle. Scale shape: ONE
    (stratum, exposure, outcome) count aggregate collapses the
    corpus; all the algebra runs on the strata-sized frame.
    Single-row strata (n = 1) contribute NULL Var terms and drop via
    the DECIMAL sum's NULL-skipping — no ANSI aborts."""
    is_exp = F.col(exposure_col) == F.lit(exposed)
    is_out = F.col(outcome_col).cast("boolean")
    cells = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.sum((is_exp & is_out).cast("long")).alias("a"),
        F.sum((is_exp & ~is_out).cast("long")).alias("b"),
        F.sum((~is_exp & is_out).cast("long")).alias("c"),
        F.sum((~is_exp & ~is_out).cast("long")).alias("d"),
    )
    a, b, c, d = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    n = a + b + c + d
    e = F.round(F.try_divide((a + b) * (a + c), n), 9)
    var = F.round(
        F.try_divide(
            (a + b) * (c + d) * (a + c) * (b + d), n * n * (n - 1)
        ),
        9,
    )
    ad = F.round(F.try_divide(a * d, n), 9)
    bc = F.round(F.try_divide(b * c, n), 9)

    def dsum(col):
        return F.sum(col.cast("decimal(28,9)")).cast("double")

    agg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        dsum(e).alias("__e"),
        dsum(var).alias("__v"),
        dsum(ad).alias("__ad"),
        dsum(bc).alias("__bc"),
        F.sum("a").alias("__ta"),
        F.sum("b").alias("__tb"),
        F.sum("c").alias("__tc"),
        F.sum("d").alias("__td"),
    )
    dev = F.abs(F.col("sum_a").cast("double") - F.col("__e")) - F.lit(0.5)
    cmh = F.try_divide(dev * dev, F.col("__v"))
    pooled_or = F.try_divide(
        F.col("__ta").cast("double") * F.col("__td"),
        F.col("__tb").cast("double") * F.col("__tc"),
    )
    return agg.select(
        "n_strata",
        "sum_a",
        F.round(F.col("__e"), 6).alias("expected_a"),
        F.round(F.col("__v"), 6).alias("variance"),
        F.round(cmh, 6).alias("cmh_chi2"),
        F.round(F.try_divide(F.col("__ad"), F.col("__bc")), 6).alias(
            "or_mh"
        ),
        F.round(pooled_or, 6).alias("or_pooled"),
        (F.round(cmh, 6) > F.lit(chi2_crit)).alias("significant"),
    )


def ratio_metric_ci(
    df: DataFrame,
    *,
    unit_col: str,
    variant_col: str,
    numerator_col: str,
    denominator_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (CTR,
    conversions-per-session, revenue-per-order) — the A/B readout a
    per-row mean gets WRONG: the unit of randomization is the user,
    so the metric is Σx/Σy over user-level pairs and its variance
    must account for the x–y covariance within users
    (Var(r) ≈ (s_xx − 2·r·s_xy + r²·s_yy) / (n·ȳ²), Deng et al.
    KDD'18's standard practice). Reports per variant: units, sums,
    the ratio, its delta-method SE, and the z-interval.

    Exactness: per-unit numerators/denominators fold to ONE
    (variant, unit) aggregate; x and y are typically counts, so the
    moment sums (Σx, Σy, Σx², Σy², Σxy) are exact integer arithmetic
    — the report is bit-identical across engines with no rounding
    tricks needed; outputs round to 6. Degenerate variants (n < 2 or
    Σy = 0) report NULL se/CI."""
    per_unit = df.groupBy(
        F.col(variant_col).alias("variant"),
        F.col(unit_col).alias("__u"),
    ).agg(
        F.sum(F.col(numerator_col).cast("long")).alias("__x"),
        F.sum(F.col(denominator_col).cast("long")).alias("__y"),
    )
    m = per_unit.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__x").cast("long").alias("sum_x"),
        F.sum("__y").cast("long").alias("sum_y"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
    )
    n = F.col("n_units").cast("double")
    sx, sy = F.col("sum_x").cast("double"), F.col("sum_y").cast("double")
    xbar, ybar = sx / n, sy / n
    r = F.try_divide(sx, sy)
    # sample covariances (n-1 denominator)
    cxx = F.try_divide(F.col("__sxx") - n * xbar * xbar, n - 1)
    cyy = F.try_divide(F.col("__syy") - n * ybar * ybar, n - 1)
    cxy = F.try_divide(F.col("__sxy") - n * xbar * ybar, n - 1)
    var_r = F.try_divide(
        cxx - F.lit(2.0) * r * cxy + r * r * cyy, n * ybar * ybar
    )
    se = F.when(
        (F.col("n_units") >= 2) & (F.col("sum_y") > 0),
        F.sqrt(F.greatest(var_r, F.lit(0.0))),
    )
    return m.select(
        "variant",
        "n_units",
        "sum_x",
        "sum_y",
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - F.lit(z) * se, 6).alias("ci_lo"),
        F.round(r + F.lit(z) * se, 6).alias("ci_hi"),
    ).orderBy("variant")


def eb_shrink_rates(
    df: DataFrame,
    *,
    unit_col: str,
    success_col: str,
    trial_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-unit rates (beta-binomial
    moment matching): a unit with 2/2 successes must not outrank one
    with 95/100 — shrinking every rate toward the corpus prior,
    weighted by its own evidence, is the standard fix (the
    baseball-batting-average construction): method-of-moments
    α = m·(m(1−m)/v − 1), β = (1−m)·(…) from the mean/variance of
    the raw unit rates, then shrunk = (x + α)/(n + α + β). Returns
    the top ``top_k`` units by shrunken rate with both raw and shrunk
    columns — the fair leaderboard.

    Exactness: raw rates are exact rationals; the prior moments
    round to 9 before α/β so both engines shrink with identical
    doubles; ranking uses (round-6 shrunk DESC, unit) so the
    leaderboard is engine-reproducible. One (unit) aggregate
    collapses the corpus; the prior is a 1-row broadcast. Degenerate
    priors (v = 0 or non-positive α/β) fall back to no shrinkage
    (α = β = 0), reported via the alpha/beta columns."""
    per = df.groupBy(F.col(unit_col).alias("unit")).agg(
        F.sum(F.col(success_col).cast("long")).alias("x"),
        F.sum(F.col(trial_col).cast("long")).alias("n"),
    ).filter(F.col("n") > 0)
    rate = F.col("x").cast("double") / F.col("n").cast("double")
    rated = per.withColumn("raw_rate", rate)
    mom = rated.agg(
        F.round(F.avg("raw_rate"), 9).alias("__m"),
        F.round(F.var_pop("raw_rate"), 9).alias("__v"),
    )
    k = F.try_divide(
        F.col("__m") * (F.lit(1.0) - F.col("__m")), F.col("__v")
    ) - F.lit(1.0)
    prior = mom.select(
        F.round(
            F.when(k > 0, F.col("__m") * k).otherwise(F.lit(0.0)), 9
        ).alias("alpha"),
        F.round(
            F.when(k > 0, (F.lit(1.0) - F.col("__m")) * k).otherwise(
                F.lit(0.0)
            ),
            9,
        ).alias("beta"),
    )
    out = rated.crossJoin(F.broadcast(prior))
    shrunk = F.round(
        (F.col("x").cast("double") + F.col("alpha"))
        / (
            F.col("n").cast("double")
            + F.col("alpha")
            + F.col("beta")
        ),
        6,
    )
    return (
        out.select(
            "unit",
            "x",
            "n",
            F.round("raw_rate", 6).alias("raw_rate"),
            "alpha",
            "beta",
            shrunk.alias("shrunk_rate"),
        )
        .orderBy(F.desc("shrunk_rate"), "unit")
        .limit(top_k)
    )


def post_stratify(
    sample: DataFrame,
    population: DataFrame,
    *,
    stratum_col: str,
    value_col: str,
) -> DataFrame:
    """Post-stratification estimator: reweight a (possibly biased)
    sample so each stratum counts in proportion to its POPULATION
    share — w_s = pop_share_s / sample_share_s — then report the
    weighted mean next to the naive one and the Kish effective sample
    size n_eff = (Σw)²/Σw² (how much precision the weighting cost).
    The survey-sampling repair every convenience sample (a skewed
    crawl, an early-adopter cohort) needs before its mean is quoted
    as a population number.

    Exactness: shares are exact count rationals; per-row weights and
    weighted sums fold as round-9 decimals, so the one-row report is
    hash-stable. Two (stratum) count aggregates + one value fold —
    the population frame contributes counts only, never values.
    Sample strata absent from the population get weight 0 (they
    represent nobody); population strata absent from the sample are
    reported via ``uncovered_pop_share`` — the honest coverage gap
    the estimator cannot fix."""
    pop = population.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("__np")
    )
    smp = sample.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("__ns")
    )
    n_pop = pop.agg(F.sum("__np").alias("t")).first()["t"]
    n_smp = smp.agg(F.sum("__ns").alias("t")).first()["t"]
    if not n_pop or not n_smp:
        raise ValueError("population and sample must be non-empty")
    joined = smp.join(pop, "__s", "left")
    w = F.round(
        F.coalesce(
            (F.col("__np").cast("double") / F.lit(float(n_pop)))
            / (F.col("__ns").cast("double") / F.lit(float(n_smp))),
            F.lit(0.0),
        ),
        9,
    )
    weights = joined.select("__s", w.alias("__w"))
    rows = sample.select(
        F.col(stratum_col).alias("__s"),
        F.col(value_col).cast("double").alias("__v"),
    ).join(F.broadcast(weights), "__s")
    uncovered = (
        pop.join(smp, "__s", "left_anti")
        .agg(F.coalesce(F.sum("__np"), F.lit(0)).alias("t"))
        .first()["t"]
    )

    def d9(col):
        return F.sum(F.round(col, 9).cast("decimal(28,9)")).cast("double")

    return rows.agg(
        F.lit(n_smp).cast("long").alias("n_sample"),
        F.round(F.avg("__v"), 6).alias("naive_mean"),
        F.round(
            F.try_divide(
                d9(F.col("__w") * F.col("__v")), d9(F.col("__w"))
            ),
            6,
        ).alias("weighted_mean"),
        F.round(
            F.try_divide(
                d9(F.col("__w")) * d9(F.col("__w")),
                d9(F.col("__w") * F.col("__w")),
            ),
            6,
        ).alias("n_eff"),
        F.round(F.lit(uncovered / n_pop), 6).alias("uncovered_pop_share"),
    )


def anova_oneway(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    f_crit: float = 2.372,
) -> DataFrame:
    """One-way ANOVA F-test across the ``group_col`` levels — "do the
    group means differ anywhere", the k-sample generalization of the
    two-sample mean gates (:func:`jackknife_ci` CIs answer pairwise;
    ANOVA answers the family in one statistic without k² comparisons).
    Reports SS_between / SS_within, F, and eta² (the share of variance
    the grouping explains — the effect size that tells a 100 TB
    pipeline whether a "significant" F is also a *material* one).

    Scale shape: ONE map-side-combinable aggregate folds the corpus to
    a k-row (group, n, Σv, Σv²) moment frame; every downstream formula
    runs on those k rows. Inputs are 6dp-rounded and moment sums are
    exact DECIMAL, so the statistic is bit-reproducible across engines
    and partition orders. Per-group between/within terms are rounded
    to 6dp before the final decimal fold for the same reason. NULL
    values drop; a single-group or empty input reports NULL F
    (``try_divide``), never an ANSI divide-by-zero abort.

    ``f_crit`` defaults to F(4, ∞) at α=0.05 — override per dof.
    """
    v6 = F.round(F.col(value_col).cast("double"), 6)
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(v6.cast("decimal(18,6)")).alias("__sx"),
            F.sum(
                (v6.cast("decimal(19,6)") * v6.cast("decimal(19,6)"))
            ).alias("__sxx"),
        )
    )
    # per-group double terms, 6dp-rounded so the k-row fold is exact
    mean_g = F.col("__sx").cast("double") / F.col("__n")
    within_g = F.round(
        F.col("__sxx").cast("double") - F.col("__n") * mean_g * mean_g, 6
    )
    terms = g.select(
        "__n",
        "__sx",
        within_g.cast("decimal(28,6)").alias("__ssw"),
        F.round(
            F.col("__sx").cast("double") * F.col("__sx").cast("double")
            / F.col("__n"),
            6,
        ).cast("decimal(28,6)").alias("__bsq"),
    )
    agg = terms.agg(
        F.sum("__n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__sx").alias("__gsum"),
        F.sum("__ssw").cast("double").alias("__ssw"),
        F.sum("__bsq").cast("double").alias("__bsq"),
    )
    grand = F.col("__gsum").cast("double")
    ssb = F.col("__bsq") - grand * grand / F.col("n_total")
    msb = F.try_divide(ssb, (F.col("k_groups") - 1).cast("double"))
    msw = F.try_divide(
        F.col("__ssw"), (F.col("n_total") - F.col("k_groups")).cast("double")
    )
    f_stat = F.round(F.try_divide(msb, msw), 6)
    return agg.select(
        "n_total",
        "k_groups",
        (F.col("k_groups") - 1).cast("long").alias("dof_between"),
        (F.col("n_total") - F.col("k_groups")).cast("long").alias(
            "dof_within"
        ),
        F.round(ssb, 4).alias("ss_between"),
        F.round(F.col("__ssw"), 4).alias("ss_within"),
        f_stat.alias("f_stat"),
        F.round(F.try_divide(ssb, ssb + F.col("__ssw")), 6).alias("eta_sq"),
        (f_stat > F.lit(f_crit)).alias("significant"),
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation between two (already unit-level)
    metric columns — Pearson on average-ranks, the monotone-association
    measure that survives outliers and nonlinearity (Pearson on raw
    heavy-tailed usage metrics is dominated by whales; on ranks every
    unit votes once). Ties get textbook average ranks.

    Scale shape: the input is expected to be a PRE-AGGREGATED unit
    frame (per-user, per-day — orders of magnitude below the event
    log); ranks are ``rank() + (t-1)/2`` window expressions over that
    frame (one exchange per axis), and the Pearson fold on ranks uses
    exact DECIMAL moments (ranks are exact multiples of ½, so
    DECIMAL(19,1) carries them losslessly — the correlation is
    engine-exact, no float-order term). NULLs in either column drop.
    Output: n, rho, and the t-approximation significance at |t|>1.96.
    """
    from pyspark.sql import Window as W

    rows = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )

    def avg_rank(col: str) -> F.Column:
        r = F.rank().over(W.orderBy(F.col(col)))
        t = F.count(F.lit(1)).over(W.partitionBy(F.col(col)))
        return (
            r.cast("double") + (t.cast("double") - 1) / 2
        ).cast("decimal(19,1)")

    ranked = rows.select(
        avg_rank("__x").alias("__rx"), avg_rank("__y").alias("__ry")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("__sxy").cast("double") / n - (
        F.col("__sx").cast("double") / n
    ) * (F.col("__sy").cast("double") / n)
    vx = F.col("__sxx").cast("double") / n - (
        F.col("__sx").cast("double") / n
    ) * (F.col("__sx").cast("double") / n)
    vy = F.col("__syy").cast("double") / n - (
        F.col("__sy").cast("double") / n
    ) * (F.col("__sy").cast("double") / n)
    rho = F.round(F.try_divide(cov, F.sqrt(vx * vy)), 6)
    t_stat = F.round(
        rho * F.sqrt(
            F.try_divide((n - 2), (F.lit(1.0) - rho * rho))
        ),
        6,
    )
    return agg.select(
        "n",
        rho.alias("rho"),
        t_stat.alias("t_stat"),
        (F.abs(t_stat) > F.lit(1.959964)).alias("significant"),
    )


def permutation_test_md5(
    df: DataFrame,
    *,
    unit_col: str,
    value_col: str,
    variant_expr,
    n_perms: int = 200,
) -> DataFrame:
    """Unit-level permutation test of a mean difference — the
    assumption-free significance gate (no normality, no variance
    model: under H₀ labels are exchangeable, so the observed diff is
    compared against the label-reshuffle null distribution).
    Permutations are DETERMINISTIC: permutation b reassigns unit u to
    side A iff the first hex digit of ``md5(u || ':' || b)`` < '8' —
    a seeded coin that is identical in Spark and any SQL engine, so
    the whole null distribution (and therefore the p-value) is
    engine-exact, not Monte-Carlo-flaky.

    Scale shape: the corpus folds ONCE to a per-unit (unit, value,
    observed side) frame; only that pre-aggregate is replicated
    ``n_perms``× (explode of a literal range — units × B rows of 3
    columns, map-side combinable straight into the per-permutation
    means). The event log is never multiplied. p-value uses the
    standard +1 correction: (1 + #{b : |diff_b| ≥ |diff_obs|})/(B+1).
    A permutation that lands every unit on one side has an undefined
    diff and counts as extreme — the conservative convention, so tiny
    unit counts can only over-state p, never under-state it.
    """
    unit = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(unit_col).alias("__u"))
        .agg(
            F.sum(
                F.round(F.col(value_col).cast("double"), 6).cast(
                    "decimal(18,6)"
                )
            ).alias("__v"),
            F.max(variant_expr.cast("boolean")).alias("__obs_a"),
        )
        .select(
            "__u",
            F.round(F.col("__v").cast("double"), 6).alias("__v"),
            "__obs_a",
        )
    )

    def mean_diff(side_a: F.Column, frame: DataFrame, keys: list[str]):
        va = F.round(F.col("__v"), 6).cast("decimal(28,6)")
        return frame.groupBy(*[F.col(k) for k in keys]).agg(
            F.try_divide(
                F.sum(F.when(side_a, va)).cast("double"),
                F.sum(side_a.cast("long")).cast("double"),
            ).alias("__ma"),
            F.try_divide(
                F.sum(F.when(~side_a, va)).cast("double"),
                F.sum((~side_a).cast("long")).cast("double"),
            ).alias("__mb"),
        )

    obs = mean_diff(F.col("__obs_a"), unit.withColumn("__k", F.lit(1)), ["__k"])
    obs_diff = obs.select(
        F.round(F.col("__ma") - F.col("__mb"), 6).alias("__obs_diff")
    )

    b_frame = obs_diff.crossJoin(
        obs_diff.sparkSession.range(n_perms).select(F.col("id").alias("__b"))
    ).select("__b", "__obs_diff")
    perms = unit.crossJoin(F.broadcast(b_frame))
    coin = F.substring(
        F.md5(
            F.concat(
                F.col("__u").cast("string"),
                F.lit(":"),
                F.col("__b").cast("string"),
            )
        ),
        1,
        1,
    ) < F.lit("8")
    per_b = mean_diff(coin, perms, ["__b", "__obs_diff"]).select(
        "__b",
        "__obs_diff",
        F.round(F.col("__ma") - F.col("__mb"), 6).alias("__d"),
    )
    # A degenerate permutation (every unit on one side) makes one mean
    # NULL, so __d is NULL; count it as extreme (conservative) rather
    # than letting it drop out of the sum and bias p anti-conservative
    # on tiny unit counts (round-9 advice fix).
    extreme = F.coalesce(
        (F.abs(F.col("__d")) >= F.abs(F.col("__obs_diff"))).cast("long"),
        F.lit(1).cast("long"),
    )
    out = per_b.agg(
        F.lit(n_perms).cast("long").alias("n_perms"),
        F.max("__obs_diff").alias("observed_diff"),
        F.sum(extreme).cast("long").alias("n_extreme"),
        F.round(
            (F.sum(extreme) + 1) / F.lit(float(n_perms + 1)), 6
        ).alias("p_value"),
    )
    return out.select(
        "n_perms",
        "observed_diff",
        "n_extreme",
        "p_value",
        (F.col("p_value") < F.lit(0.05)).alias("significant"),
    )


def tost_equivalence(
    df: DataFrame,
    value_col: str,
    *,
    variant_expr,
    rel_margin: float = 0.02,
    z_crit: float = 1.644854,
) -> DataFrame:
    """Two-one-sided-tests (TOST) equivalence gate — the test that can
    POSITIVELY conclude "the variants are the same within ±margin",
    which a non-significant difference test never does (absence of
    evidence ≠ evidence of absence — the ship/no-ship question for
    refactors, infra swaps, and holdback checks). Margin is
    ``rel_margin`` × the control mean; equivalence holds iff BOTH
    one-sided z's clear ``z_crit`` (α=0.05 per side).

    Scale shape: one map-side-combinable moment fold (n, Σv, Σv² per
    side from 6dp-rounded DECIMAL sums) collapses the corpus; every
    statistic derives from those six numbers, engine-exact. Welch
    (unpooled) SE. A side with <2 rows reports NULL z's
    (``try_divide``), never an ANSI abort.
    """
    is_a = variant_expr
    v6 = F.round(F.col(value_col).cast("double"), 6)
    m = df.filter(F.col(value_col).isNotNull()).agg(
        F.sum(is_a.cast("long")).cast("long").alias("n_a"),
        F.sum((~is_a).cast("long")).cast("long").alias("n_b"),
        F.sum(F.when(is_a, v6.cast("decimal(18,6)"))).alias("sa"),
        F.sum(F.when(~is_a, v6.cast("decimal(18,6)"))).alias("sb"),
        F.sum(
            F.when(
                is_a, v6.cast("decimal(19,6)") * v6.cast("decimal(19,6)")
            )
        ).alias("qa"),
        F.sum(
            F.when(
                ~is_a, v6.cast("decimal(19,6)") * v6.cast("decimal(19,6)")
            )
        ).alias("qb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    va = F.try_divide(
        F.col("qa").cast("double") - na * ma * ma, na - 1
    )
    vb = F.try_divide(
        F.col("qb").cast("double") - nb * mb * mb, nb - 1
    )
    se = F.sqrt(F.try_divide(va, na) + F.try_divide(vb, nb))
    diff = ma - mb
    margin = F.abs(mb) * rel_margin
    z_lower = F.round(F.try_divide(diff + margin, se), 6)
    z_upper = F.round(F.try_divide(margin - diff, se), 6)
    equivalent = (z_lower > F.lit(z_crit)) & (z_upper > F.lit(z_crit))
    return m.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(diff, 6).alias("diff"),
        F.round(se, 6).alias("se"),
        F.round(margin, 6).alias("margin"),
        z_lower.alias("z_lower"),
        z_upper.alias("z_upper"),
        equivalent.alias("equivalent"),
    )


# Poisson(1) inverse-CDF thresholds (cumulative e^{-1}/k! partial
# sums), written as literals so Spark and the SQL oracle compare u
# against bit-identical constants.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    *,
    unit_col: str,
    replicates: int = 39,
    group_cols: list[str] | None = None,
    seed: int = 7,
) -> DataFrame:
    """One-pass Poisson bootstrap CI for the mean of ``value_col`` —
    the resampling scheme streaming A/B systems use at corpus scale:
    a with-replacement resample of n rows is ~Multinomial(n, 1/n),
    which factorizes into independent Poisson(1) weights per unit, so
    ONE scan with a deterministic per-(unit, replicate) weight
    replaces B full resample rescans. Weights are drawn per UNIT
    (``unit_col``), not per row — all of a unit's rows enter or leave
    a replicate together, respecting within-unit correlation exactly
    like ``jackknife_ci``'s cohorts (the per-row bootstrap understates
    variance under correlated rows).

    Where the delete-one jackknife gives a symmetric ±z·se interval,
    the bootstrap gives a PERCENTILE interval that follows the
    statistic's actual skew. With the default ``replicates=39`` the
    min/max replicate means are the 2.5%/97.5% percentile estimates
    under the k = α(B+1) order-statistic rule (0.025·40 = 1) — so the
    CI is exactly min/max over the replicate frame, engine-portable
    with no interpolation convention to match.

    Scale shape: explode ×B (constant fan-out, no skew), then one
    map-side-combinable aggregate to groups×B rows of exact-decimal
    partials; everything after is arithmetic on that tiny frame. The
    md5 weight coin is engine-reproducible → full SQL oracle.
    """
    if replicates < 2:
        raise ValueError("replicates must be >= 2")
    gcols = list(group_cols or [])
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("__unit").cast("string"),
                        F.lit(":"),
                        F.col("__r").cast("string"),
                        F.lit(f":{seed}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = F.when(u < F.lit(_POISSON1_CDF[0]), F.lit(0))
    for k, c in enumerate(_POISSON1_CDF[1:], start=1):
        w = w.when(u < F.lit(c), F.lit(k))
    w = w.otherwise(F.lit(len(_POISSON1_CDF))).cast("long")
    from vectordb_migrator_spark.operators.util import fan_out

    rep = (
        fan_out(
            df.filter(F.col(value_col).isNotNull()).select(
                *gcols,
                F.col(unit_col).alias("__unit"),
                F.col(value_col).alias("__v"),
            )
        )
        # the xB explode and the per-row md5 coins are CPU-bound —
        # fan out a single-file local scan first (cluster no-op)
        .withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(replicates - 1)))
        )
        .withColumn("__w", w)
        .groupBy(*gcols, "__r")
        .agg(
            F.sum(
                F.col("__w") * F.col("__v").cast("decimal(28,6)")
            ).alias("ws"),
            F.sum("__w").cast("long").alias("ww"),
            # the raw (sum, count) partials are identical for every
            # replicate (the explode copies each row into each r), so
            # the point estimate rides the same single scan for free
            F.sum(F.col("__v").cast("decimal(28,6)")).alias("sv"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    m = F.try_divide(
        F.col("ws").cast("double"), F.col("ww").cast("double")
    ).alias("__m")
    reps = rep.select(*gcols, "sv", "n", m)
    sum_m = F.sum("__m")
    sum_m2 = F.sum(F.col("__m") * F.col("__m"))
    # replicates whose resample drew zero total weight have NULL
    # means and drop out; the variance uses the surviving count
    cnt = F.count("__m").cast("double")
    return (
        reps.groupBy(*gcols)
        .agg(
            F.max("n").alias("n"),
            F.round(
                F.max("sv").cast("double") / F.max("n").cast("double"), 6
            ).alias("mean"),
            F.round(
                F.sqrt(
                    (sum_m2 - sum_m * sum_m / cnt)
                    / (cnt - F.lit(1.0))
                ),
                6,
            ).alias("boot_se"),
            F.round(F.min("__m"), 6).alias("ci_lo"),
            F.round(F.max("__m"), 6).alias("ci_hi"),
        )
        .orderBy(*gcols)
        if gcols
        else reps.groupBy()
        .agg(
            F.max("n").alias("n"),
            F.round(
                F.max("sv").cast("double") / F.max("n").cast("double"), 6
            ).alias("mean"),
            F.round(
                F.sqrt(
                    (sum_m2 - sum_m * sum_m / cnt)
                    / (cnt - F.lit(1.0))
                ),
                6,
            ).alias("boot_se"),
            F.round(F.min("__m"), 6).alias("ci_lo"),
            F.round(F.max("__m"), 6).alias("ci_hi"),
        )
    )


def mmd_two_sample(
    df: DataFrame,
    *,
    group_expr,
    vec_col: str = "embedding",
    d: int = 64,
) -> DataFrame:
    """Kernel two-sample test statistic (MMD², Gretton et al. 2012)
    between the two vector populations split by boolean
    ``group_expr``, for the QUADRATIC kernel k(x,y) = (1 + ⟨x,y⟩/d)²
    — the kernel choice that makes the O(n²)-pair statistic collapse
    to a CLOSED FORM over first and second moments:

        MMD²  =  2·‖μ_A − μ_B‖²/d  +  ‖S_A − S_B‖²_F / d²

    (μ = mean vector, S = E[xxᵀ] second-moment matrix; the V-statistic
    over the expanded kernel telescopes — means catch location drift,
    the Frobenius term catches covariance/shape drift that
    ``x9_embedding_drift``-style mean-only monitors miss).

    Scale shape: ONE corpus scan emits (group, i, partial-μ) and
    (group, i·d+j, partial-S) exact-decimal partials with map-side
    combine; everything after is arithmetic on 2·(d + d²) model rows.
    No pairwise joins, no sampling — the exact statistic at any
    corpus size, which is the entire point of choosing a polynomial
    kernel at 100 TB.

    Returns one row: ``n_a, n_b, mean_term, cov_term, mmd2``.
    """
    from vectordb_migrator_spark.operators.util import fan_out

    v = F.col(vec_col).cast("array<double>")
    # the pair expansion is d(d+1)/2 cells per row — CPU-heavy enough
    # that a single-file local scan must fan out first (no-op on a
    # partition-parallel cluster scan)
    base = fan_out(
        df.select(
            F.when(group_expr, F.lit("a")).otherwise(F.lit("b")).alias("g"),
            v.alias("__v"),
        )
    )
    mu = (
        base.select("g", F.posexplode("__v").alias("i", "x"))
        .groupBy("g", "i")
        .agg(
            F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "g",
            "i",
            (F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "m"
            ),
            "n",
        )
    )
    # S is symmetric: build only the upper triangle (d(d+1)/2 cells
    # instead of d²) and weight off-diagonal cells 2× in the Frobenius
    # fold — halves the explode width AND the aggregate state
    pairs = F.flatten(
        F.transform(
            F.col("__v"),
            lambda xi, i: F.transform(
                F.slice(F.col("__v"), i + 1, F.lit(d) - i),
                lambda xj, jo: F.struct(
                    (i * F.lit(d) + i + jo).alias("ij"),
                    (xi * xj).alias("p"),
                ),
            ),
        )
    )
    smom = (
        base.select("g", F.explode(pairs).alias("e"))
        .select("g", F.col("e.ij").alias("ij"), F.col("e.p").alias("p"))
        .groupBy("g", "ij")
        .agg(
            F.sum(F.col("p").cast("decimal(28,12)")).alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "g",
            "ij",
            (F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "sm"
            ),
        )
    )
    mua = mu.filter(F.col("g") == "a").select(
        "i", F.col("m").alias("ma"), F.col("n").alias("na")
    )
    mub = mu.filter(F.col("g") == "b").select(
        "i", F.col("m").alias("mb"), F.col("n").alias("nb")
    )
    mean_term = (
        mua.join(mub, "i")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            (
                F.lit(2.0)
                * F.sum(
                    (F.col("ma") - F.col("mb"))
                    * (F.col("ma") - F.col("mb"))
                )
                / F.lit(float(d))
            ).alias("mean_term"),
        )
    )
    sa = smom.filter(F.col("g") == "a").select(
        "ij", F.col("sm").alias("sa")
    )
    sb = smom.filter(F.col("g") == "b").select(
        "ij", F.col("sm").alias("sb")
    )
    wgt = F.when(
        (F.col("ij") % F.lit(d)) == F.floor(F.col("ij") / F.lit(d)),
        F.lit(1.0),
    ).otherwise(F.lit(2.0))
    cov_term = sa.join(sb, "ij").agg(
        (
            F.sum(
                wgt
                * (F.col("sa") - F.col("sb"))
                * (F.col("sa") - F.col("sb"))
            )
            / F.lit(float(d) * d)
        ).alias("cov_term")
    )
    return mean_term.crossJoin(cov_term).select(
        "n_a",
        "n_b",
        F.round("mean_term", 9).alias("mean_term"),
        F.round("cov_term", 9).alias("cov_term"),
        F.round(F.col("mean_term") + F.col("cov_term"), 9).alias("mmd2"),
    )


def split_conformal_report(
    df: DataFrame,
    value_col: str,
    *,
    unit_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.1,
    seed: int = 7,
) -> DataFrame:
    """Split conformal prediction interval with finite-sample coverage
    (Vovk; Lei et al. 2018) — the distribution-free guarantee layer a
    serving pipeline wraps around ANY point predictor: fit on a train
    split, take q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest absolute
    residual on a held-out calibration split, and the interval
    prediction ± q̂ covers new points with probability ≥ 1−α,
    whatever the data distribution. Here the point predictor is the
    per-group train-split mean (the simplest member of the family —
    the wrapper, not the model, is the operator), splits are md5
    coins on ``unit_col`` (train < 0.4 ≤ cal < 0.7 ≤ test), and the
    report certifies the guarantee empirically on the test split.

    Scale shape: ONE scan computes split tags + exact-decimal train
    means; residual ranking runs per group on the calibration rows
    only (a per-group sort of the held-out slice — the one documented
    sort, bounded by calibration size, never the corpus); coverage is
    a map-side-combinable fold. md5 splits + identical IEEE residual
    arithmetic → full SQL oracle.

    Returns per group: ``n_train, n_cal, n_test, qhat, coverage,
    avg_width`` (width = 2·q̂, constant per group here).  When the
    calibration split is so small that ⌈(n_cal+1)(1−α)⌉ > n_cal the
    group is still emitted, with ``qhat``/``coverage``/``avg_width``
    NULL — the conformal convention for "no finite interval at this
    α" — so release gates see the missing guarantee explicitly.
    """
    gcols = list(group_cols or [])
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(unit_col).cast("string"),
                        F.lit(f":conf:{seed}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *gcols,
        F.col(value_col).cast("double").alias("__y"),
        F.when(u < 0.4, F.lit("train"))
        .when(u < 0.7, F.lit("cal"))
        .otherwise(F.lit("test"))
        .alias("__s"),
    )
    mu = (
        base.filter(F.col("__s") == "train")
        .groupBy(*gcols)
        .agg(
            (
                F.sum(F.col("__y").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("__mu"),
            F.count(F.lit(1)).cast("long").alias("n_train"),
        )
    )
    resid = base.join(mu, gcols) if gcols else base.crossJoin(mu)
    resid = resid.select(
        *gcols,
        "__s",
        "n_train",
        F.abs(F.col("__y") - F.col("__mu")).alias("__r"),
    )
    cal = resid.filter(F.col("__s") == "cal")
    rk = F.row_number().over(
        Window.partitionBy(*gcols).orderBy("__r")
        if gcols
        else Window.partitionBy().orderBy("__r")
    )
    ncal = F.count(F.lit(1)).over(
        Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    )
    # Aggregate (not filter) so a group whose conformal rank
    # ⌈(n_cal+1)(1−α)⌉ exceeds n_cal still appears — with qhat NULL
    # (the convention for "no finite guarantee at this α") instead of
    # silently vanishing from the report.
    qhat = (
        cal.select(*gcols, "n_train", "__r", rk.alias("__k"),
                   ncal.alias("n_cal"))
        .groupBy(*gcols)
        .agg(
            F.max("n_train").alias("n_train"),
            F.max("n_cal").cast("long").alias("n_cal"),
            F.max(
                F.when(
                    F.col("__k")
                    == F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - alpha)),
                    F.col("__r"),
                )
            ).alias("__q"),
        )
    )
    test = resid.filter(F.col("__s") == "test").select(*gcols, "__r")
    joined = qhat.join(test, gcols, "left") if gcols else test.crossJoin(qhat)
    out = joined.groupBy(*gcols).agg(
        F.max("n_train").alias("n_train"),
        F.max("n_cal").alias("n_cal"),
        F.count("__r").cast("long").alias("n_test"),
        F.round(F.max("__q"), 6).alias("qhat"),
        F.round(
            F.sum((F.col("__r") <= F.col("__q")).cast("long"))
            / F.count("__r").cast("double"),
            6,
        ).alias("coverage"),
        F.round(F.lit(2.0) * F.max("__q"), 6).alias("avg_width"),
    )
    return out.orderBy(*gcols) if gcols else out


def mann_whitney_report(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    split_expr=None,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Mann–Whitney U rank-sum test (Wilcoxon two-sample) — the
    distribution-free "did the values shift" gate that complements
    the mean-based family (t-interval/TOST/ANOVA compare means; U
    compares the whole distribution and survives heavy tails and
    outliers, which is why release pipelines lean on it for latency
    and score drift). Sample A = rows where ``split_expr`` is true,
    B = the rest; one report row per ``group_cols`` group.

    Exactness by construction: average ranks for ties are kept as the
    INTEGER ``2·rank`` (2·avg = 2·minrank + t − 1 for a tie run of
    size t), so the rank sum, U, the tie-correction term Σ(t³−t) and
    every count are exact int64; only the final μ/σ/z divisions run
    in IEEE doubles (rounded 6dp) — fully SQL-replicable.

    Scale shape: one per-group sort for the rank window (the one
    documented sort, the same shape every rank statistic needs), one
    (group, value) tie aggregate that reuses the ranked exchange, and
    a map-side-combinable fold to one row per group. Degenerate
    groups (either sample empty, or all values tied so σ = 0) report
    NULL z — never a divide-by-zero.

    Returns per group: ``n1, n2, u1, z, significant`` (|z| > z_crit
    at the default two-sided α = 0.05).
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols or [])
    if split_expr is None:
        raise ValueError("split_expr (the sample-A membership) is required")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *gcols,
        F.col(value_col).cast("double").alias("__v"),
        F.when(split_expr, F.lit(1)).otherwise(F.lit(0)).alias("__a"),
    )
    w_rank = (
        W.partitionBy(*gcols).orderBy("__v")
        if gcols
        else W.partitionBy().orderBy("__v")
    )
    w_tie = (
        W.partitionBy(*gcols, "__v") if gcols else W.partitionBy("__v")
    )
    ranked = base.select(
        *gcols,
        "__a",
        # 2·average-rank = 2·min-rank + (tie size − 1): exact int64
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - F.lit(1)
        ).cast("long").alias("__r2"),
        F.count(F.lit(1)).over(w_tie).cast("long").alias("__t"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__a").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("__a")).cast("long").alias("n2"),
        F.sum(F.when(F.col("__a") == 1, F.col("__r2"))).cast("long").alias(
            "__r2a"
        ),
        # each tie run of size t contributes t·(t³−t) summed per ROW,
        # i.e. Σ_runs (t³−t) = Σ_rows (t²−1)  — exact int64
        F.sum(F.col("__t") * F.col("__t") - F.lit(1)).cast("long").alias(
            "__ties"
        ),
    )
    n = F.col("n1") + F.col("n2")
    u1 = (
        F.col("__r2a").cast("double") - F.col("n1") * (F.col("n1") + 1)
    ) / F.lit(2.0)
    mu = F.col("n1").cast("double") * F.col("n2") / F.lit(2.0)
    var = (
        F.col("n1").cast("double")
        * F.col("n2")
        / F.lit(12.0)
        * (
            (n + 1).cast("double")
            - F.col("__ties").cast("double") / (n * (n - 1)).cast("double")
        )
    )
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0),
        F.round((u1 - mu) / F.sqrt(var), 6),
    )
    out = agg.select(
        *gcols,
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(z_crit)).alias(
            "significant"
        ),
    )
    return out.orderBy(*gcols) if gcols else out


def ks_two_sample_report(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    split_expr=None,
    alpha: float = 0.05,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test — the shape-sensitive
    companion to :func:`mann_whitney_report`: U detects location
    shifts; D = sup|F₁−F₂| detects ANY distributional difference
    (variance, tails, bimodality), which is what a training pipeline
    wants when "the metric moved" is not yet a hypothesis. Sample A =
    rows where ``split_expr`` is true, B = the rest; one report row
    per ``group_cols`` group.

    Exactness by construction: the supremum is taken over the pooled
    ORDER STATISTICS as the integer ``|n₂·cum₁(v) − n₁·cum₂(v)|``
    (cross-multiplied ECDFs — no division inside the max), evaluated
    AFTER each distinct pooled value (the right-continuous ECDF
    convention, correct under ties), so D's numerator and every count
    are exact int64; only the final D = num/(n₁·n₂) and the
    asymptotic two-sided p-bound λ = D·√(n₁n₂/(n₁+n₂)) run in IEEE
    doubles (rounded 6dp) — fully SQL-replicable. ``significant``
    uses the classic large-sample rejection λ > c(α) with
    c(0.05) = 1.358102 (Smirnov); pass another ``alpha``-matched
    critical value via the constant if needed.

    Scale shape: one per-group sort for the cumulative window (the
    same exchange every rank statistic pays), a per-(group, value)
    tie-collapse that reuses it, and a map-side-combinable max fold.
    Degenerate groups (either sample empty) report NULL D.

    Returns per group: ``n1, n2, d_num, d, lambda, significant``.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols or [])
    if split_expr is None:
        raise ValueError("split_expr (the sample-A membership) is required")
    crit = {0.05: 1.358102, 0.01: 1.627624, 0.1: 1.223848}.get(alpha)
    if crit is None:
        raise ValueError("alpha must be one of 0.1, 0.05, 0.01")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *gcols,
        F.col(value_col).cast("double").alias("__v"),
        F.when(split_expr, F.lit(1)).otherwise(F.lit(0)).alias("__a"),
    )
    # collapse ties first: per (group, value), how many rows from each
    # sample — the ECDF only changes at distinct values
    tie = base.groupBy(*gcols, "__v").agg(
        F.sum("__a").cast("long").alias("__ca"),
        F.sum(F.lit(1) - F.col("__a")).cast("long").alias("__cb"),
    )
    w_cum = (
        W.partitionBy(*gcols).orderBy("__v")
        if gcols
        else W.partitionBy().orderBy("__v")
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy(*gcols) if gcols else W.partitionBy()
    stepped = tie.select(
        *gcols,
        F.sum("__ca").over(w_cum).alias("__cum_a"),
        F.sum("__cb").over(w_cum).alias("__cum_b"),
        F.sum("__ca").over(w_all).alias("n1"),
        F.sum("__cb").over(w_all).alias("n2"),
    )
    agg = stepped.groupBy(*gcols).agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(
            F.abs(
                F.col("n2") * F.col("__cum_a")
                - F.col("n1") * F.col("__cum_b")
            )
        ).cast("long").alias("d_num"),
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    d = F.col("d_num").cast("double") / (
        F.col("n1").cast("double") * F.col("n2").cast("double")
    )
    lam = d * F.sqrt(
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / (F.col("n1") + F.col("n2")).cast("double")
    )
    out = agg.select(
        *gcols,
        "n1",
        "n2",
        F.when(ok, F.col("d_num")).alias("d_num"),
        F.when(ok, F.round(d, 6)).alias("d"),
        F.when(ok, F.round(lam, 6)).alias("lambda"),
        F.when(ok, F.round(lam, 6) > F.lit(crit)).alias("significant"),
    )
    return out.orderBy(*gcols) if gcols else out


def ks_bin_expr(value_col: str, edges: list[float]):
    """The shared binning rule of the binned-KS family: bin i+1 for
    the first edge with v <= edges[i], else len(edges)+1. One
    definition so the batch operator and the streaming ingest can
    never disagree on a boundary."""
    v = F.col(value_col).cast("double")
    bin_expr = F.when(v <= edges[0], 1)
    for i in range(1, len(edges)):
        bin_expr = bin_expr.when(v <= edges[i], i + 1)
    return bin_expr.otherwise(len(edges) + 1)


def ks_binned_report(
    df: DataFrame,
    value_col: str,
    *,
    edges: list[float],
    group_cols: list[str] | None = None,
    split_expr=None,
    alpha: float = 0.05,
) -> DataFrame:
    """Binned-ECDF two-sample Kolmogorov–Smirnov — the KS variant a
    STREAMING pipeline can actually run: the exact test
    (:func:`ks_two_sample_report`) needs the pooled order statistics
    (a per-group sort over all history), but with fixed bin ``edges``
    the sufficient statistic collapses to per-(group, bin) counts —
    mergeable by pure addition, so micro-batch partials reproduce the
    batch answer bit for bit (see ``streaming/incremental.py:
    ks_binned_ingest`` / ``ks_over``, this operator's streaming twin).
    D is evaluated on the binned ECDFs: ``max_bins |n₂·cum_a −
    n₁·cum_b|`` in exact int64 (cross-multiplied, no division inside
    the max). Binned D lower-bounds the exact D (coarsening can only
    hide crossings), so ``significant`` fires conservatively; edges
    come from the frozen reference window exactly like
    ``psi_bin_ingest``'s.

    Returns per group: ``n1, n2, n_bins, d_num, d, lambda,
    significant`` — the exact-test schema plus the bin count.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols or [])
    if split_expr is None:
        raise ValueError("split_expr (the sample-A membership) is required")
    if not edges:
        raise ValueError("edges must be non-empty")
    crit = {0.05: 1.358102, 0.01: 1.627624, 0.1: 1.223848}.get(alpha)
    if crit is None:
        raise ValueError("alpha must be one of 0.1, 0.05, 0.01")
    n_bins = len(edges) + 1
    base = df.filter(F.col(value_col).isNotNull()).select(
        *gcols,
        ks_bin_expr(value_col, edges).alias("__bin"),
        F.when(split_expr, F.lit(1)).otherwise(F.lit(0)).alias("__a"),
    )
    cnt = base.groupBy(*gcols, "__bin").agg(
        F.sum("__a").cast("long").alias("__ca"),
        F.sum(F.lit(1) - F.col("__a")).cast("long").alias("__cb"),
    )
    w_cum = (
        W.partitionBy(*gcols).orderBy("__bin")
        if gcols
        else W.partitionBy().orderBy("__bin")
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy(*gcols) if gcols else W.partitionBy()
    stepped = cnt.select(
        *gcols,
        F.sum("__ca").over(w_cum).alias("__cum_a"),
        F.sum("__cb").over(w_cum).alias("__cum_b"),
        F.sum("__ca").over(w_all).alias("n1"),
        F.sum("__cb").over(w_all).alias("n2"),
    )
    agg = stepped.groupBy(*gcols).agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(
            F.abs(
                F.col("n2") * F.col("__cum_a")
                - F.col("n1") * F.col("__cum_b")
            )
        ).cast("long").alias("d_num"),
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    d = F.col("d_num").cast("double") / (
        F.col("n1").cast("double") * F.col("n2").cast("double")
    )
    lam = d * F.sqrt(
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / (F.col("n1") + F.col("n2")).cast("double")
    )
    out = agg.select(
        *gcols,
        "n1",
        "n2",
        F.lit(n_bins).cast("int").alias("n_bins"),
        F.when(ok, F.col("d_num")).alias("d_num"),
        F.when(ok, F.round(d, 6)).alias("d"),
        F.when(ok, F.round(lam, 6)).alias("lambda"),
        F.when(ok, F.round(lam, 6) > F.lit(crit)).alias("significant"),
    )
    return out.orderBy(*gcols) if gcols else out


def neyman_allocation(
    df: DataFrame,
    value_col: str,
    *,
    stratum_col: str,
    budget: int = 1000,
    scale: int = 100,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation with Hamilton
    largest-remainder rounding (round 11) — the budget-split primitive
    behind every "sample K rows per source, weighted by how noisy the
    source is" curation step: the variance-minimizing allocation puts
    ``n_h ∝ N_h·S_h`` (stratum size × stratum std — big uniform strata
    need FEWER samples than small noisy ones), and Hamilton rounding
    turns the real-valued quotas into integers that sum EXACTLY to the
    budget (floor every quota, hand the leftovers to the largest
    fractional remainders).

    Determinism by construction: values quantize to int64 at
    ``scale`` (half-away), the weight is ``floor(sqrt(n·Σq² − (Σq)²))``
    — algebraically N_h·S_h·scale, computed from exact integer
    sufficient statistics with the one IEEE sqrt both engines round
    identically (sqrt is correctly rounded by IEEE 754; the int→double
    cast is the same on both) — quota floors use exact integer
    division (``(a − a%T)/T`` inside 2⁵³), and leftover distribution
    ranks by (remainder desc, stratum asc). All-constant strata weigh
    0; if EVERY stratum is constant the allocation is NULL (no
    variance signal), never a division error.

    int64 headroom: ``n_h·Σq²`` must stay under 2⁶³ — with the
    default ``scale`` that is ~10⁵ rows per stratum at |v| ≤ 500;
    lower ``scale`` for bigger strata.

    Scale shape: one partial-aggregable pass for the sufficient
    statistics (n, Σq, Σq² per stratum — map-side combinable), then
    window ranks over the STRATA frame (groups, not rows). Returns
    per stratum: ``(stratum, n_rows, weight, alloc, share)`` with
    Σalloc = budget exactly (property-tested).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    v = F.col(value_col).cast("double")
    q = F.when(
        v >= 0, F.floor(v * scale + F.lit(0.5))
    ).otherwise(-F.floor(-v * scale + F.lit(0.5))).cast("long")
    stats = (
        df.filter(v.isNotNull())
        .select(F.col(stratum_col).alias("stratum"), q.alias("q"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("q").cast("long").alias("sx"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("sxx"),
        )
    )
    svar = F.col("n_rows") * F.col("sxx") - F.col("sx") * F.col("sx")
    w = F.floor(F.sqrt(svar.cast("double"))).cast("long")
    stats = stats.select("stratum", "n_rows", w.alias("weight"))
    out = hamilton_apportion(
        stats, key_col="stratum", weight_col="weight", budget=budget
    )
    return out.select(
        "stratum", "n_rows", "weight", "alloc",
        F.round(
            F.col("alloc").cast("double") / F.lit(float(budget)), 6
        ).alias("share"),
    ).orderBy("stratum")


def hamilton_apportion(
    df: DataFrame,
    *,
    key_col: str,
    weight_col: str,
    budget: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Largest-remainder (Hamilton) integer apportionment: split an
    integer ``budget`` across rows ∝ their int64 ``weight_col`` so the
    allocations sum EXACTLY to the budget — floor every quota with
    exact integer division (``(a − a%T)/T`` inside 2⁵³), then hand the
    leftover units to the largest remainders (ties toward the smaller
    key). The shared tail of :func:`neyman_allocation` and
    ``temperature_mixing``; with ``group_cols`` each group apportions
    its own budget independently (windows partition by group).
    Zero/NULL total weight → NULL allocs, never a division error.
    Appends an ``alloc`` column; all input columns pass through."""
    gcols = list(group_cols or [])
    w_all = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    )
    tot = F.sum(weight_col).over(w_all)
    bw = F.col(weight_col) * F.lit(int(budget)).cast("long")

    def idiv(a, t):
        return ((a - a % t) / t).cast("long")

    quotas = df.select(
        "*",
        tot.alias("__t"),
        F.when(tot > 0, idiv(bw, tot)).alias("__base"),
        F.when(tot > 0, bw % tot).alias("__rem"),
    )
    spent = F.sum("__base").over(w_all)
    rk = F.row_number().over(
        w_all.orderBy(F.col("__rem").desc(), key_col)
    )
    alloc = F.col("__base") + F.when(
        rk <= (F.lit(int(budget)) - spent), F.lit(1)
    ).otherwise(F.lit(0))
    return quotas.select(
        *df.columns,
        F.when(F.col("__t") > 0, alloc).cast("long").alias("alloc"),
    )


def temperature_mixing(
    df: DataFrame,
    *,
    domain_col: str,
    roots: tuple = (1, 2, 4),
    budget: int = 10_000,
    wscale: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled domain mixing (round 11) — the sampling
    table every multilingual / multi-domain LLM run publishes (mT5's
    p_i ∝ n_i^(1/τ)): raw proportional sampling starves small domains,
    uniform drowns big ones in repetition, and the temperature knob
    interpolates. One output row per (root, domain) with the domain's
    document count, its quantized weight n^(1/root), the
    Hamilton-apportioned integer token/sample budget (Σ = ``budget``
    exactly per root), and the share.

    Determinism: ``roots`` are restricted to powers of two so the
    weight chain is identity / sqrt / sqrt∘sqrt — IEEE sqrt is
    correctly rounded, so ``floor(n^(1/root)·wscale)`` is bit-equal on
    any engine (no transcendental pow); the apportionment is the
    exact-integer :func:`hamilton_apportion` partitioned per root.
    int64 headroom: budget·wscale·n must stay inside 2⁵³ for the
    exact quota floors — with the defaults that is n ≤ ~9·10⁵ docs per
    domain; lower ``wscale`` for bigger corpora.

    Scale shape: one map-side-combinable count per domain, then
    window ranks over the (roots × domains) frame — group-sized, not
    row-sized.
    """
    for r in roots:
        if r not in (1, 2, 4):
            raise ValueError(
                "roots must come from (1, 2, 4) — identity/sqrt/"
                "sqrt∘sqrt keep the weight chain correctly rounded"
            )
    counts = df.groupBy(
        F.col(domain_col).alias("domain")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    frames = []
    for r in roots:
        nd = F.col("n_docs").cast("double")
        if r == 1:
            w = nd
        elif r == 2:
            w = F.sqrt(nd)
        else:
            w = F.sqrt(F.sqrt(nd))
        frames.append(
            counts.select(
                F.lit(int(r)).cast("int").alias("root"),
                "domain",
                "n_docs",
                F.floor(w * F.lit(float(wscale))).cast("long").alias(
                    "weight_q"
                ),
            )
        )
    allw = frames[0]
    for f in frames[1:]:
        allw = allw.unionByName(f)
    out = hamilton_apportion(
        allw, key_col="domain", weight_col="weight_q",
        budget=budget, group_cols=["root"],
    )
    return out.select(
        "root", "domain", "n_docs", "weight_q", "alloc",
        F.round(
            F.col("alloc").cast("double") / F.lit(float(budget)), 6
        ).alias("share"),
    ).orderBy("root", "domain")
