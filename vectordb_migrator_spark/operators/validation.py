"""Declarative data-quality constraints — the deequ/Great-Expectations
niche, Spark-first: every constraint compiles to an aggregate
expression over ONE corpus scan (no per-constraint passes, no Python
in the row path), and the result is a tiny verdict frame a pipeline
can gate on before publishing to a sink.

At 100 TB this matters because the naive approach — one action per
check — re-reads the corpus N times; here N constraints cost exactly
one scan with map-side-combinable aggregates, the same shape as any
other report query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One named check: ``metric`` aggregates the scan (any aggregate
    Column), ``ok`` turns the metric value into pass/fail."""

    name: str
    metric: Column
    threshold: float
    op: str = ">="  # metric op threshold => pass

    def verdict(self, value: Column) -> Column:
        return {
            ">=": value >= self.threshold,
            "<=": value <= self.threshold,
            "==": value == self.threshold,
        }[self.op]


def not_null(col: str, min_fraction: float = 1.0) -> Constraint:
    """Fraction of non-null values in ``col`` must reach ``min_fraction``."""
    return Constraint(
        name=f"not_null_{col}",
        metric=(
            F.count(F.col(col)).cast("double") / F.count(F.lit(1))
        ),
        threshold=min_fraction,
    )


def unique(col: str, min_fraction: float = 1.0) -> Constraint:
    """Fraction of distinct (non-null) values over non-null rows must
    reach ``min_fraction`` — 1.0 means a true key."""
    return Constraint(
        name=f"unique_{col}",
        metric=(
            F.countDistinct(F.col(col)).cast("double")
            / F.count(F.col(col)).cast("double")
        ),
        threshold=min_fraction,
    )


def in_range(col: str, lo: float, hi: float, min_fraction: float = 1.0) -> Constraint:
    """Fraction of non-null values inside [lo, hi] must reach
    ``min_fraction``."""
    inside = F.when(
        F.col(col).isNotNull() & F.col(col).between(lo, hi), 1
    ).otherwise(0)
    return Constraint(
        name=f"in_range_{col}",
        metric=F.sum(inside).cast("double") / F.count(F.col(col)).cast("double"),
        threshold=min_fraction,
    )


def matches(col: str, pattern: str, min_fraction: float = 1.0) -> Constraint:
    """Fraction of non-null values matching the regex must reach
    ``min_fraction``."""
    hit = F.when(F.col(col).rlike(pattern), 1).otherwise(0)
    return Constraint(
        name=f"matches_{col}",
        metric=F.sum(hit).cast("double") / F.count(F.col(col)).cast("double"),
        threshold=min_fraction,
    )


def satisfies(name: str, predicate: Column, min_fraction: float = 1.0) -> Constraint:
    """Fraction of rows satisfying an arbitrary boolean expression —
    the cross-column escape hatch (e.g.
    ``satisfies("chars_consistent", F.col("n_chars") == F.length("text"))``).
    NULL predicate results count as failures (three-valued logic made
    strict, the conservative reading for a gate)."""
    hit = F.when(predicate, 1).otherwise(0)
    return Constraint(
        name=f"satisfies_{name}",
        metric=F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double"),
        threshold=min_fraction,
    )


def min_rows(n: int) -> Constraint:
    """Row count must reach ``n`` (an empty-input guard)."""
    return Constraint(
        name="min_rows", metric=F.count(F.lit(1)).cast("double"), threshold=float(n)
    )


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate every constraint in ONE aggregate over one scan.
    Returns one row per constraint: (check_name, value, threshold,
    passed) — unpivoted from the single report row via a plan-time
    stack, so the scan count stays 1 regardless of len(constraints)."""
    report = df.agg(
        *[F.round(c.metric, 6).alias(c.name) for c in constraints]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(c.name).alias("value"),
                F.lit(float(c.threshold)).alias("threshold"),
                c.verdict(F.col(c.name)).alias("passed"),
            )
            for c in constraints
        ]
    )
    return (
        report.select(F.explode(rows).alias("r"))
        .select("r.check_name", "r.value", "r.threshold", "r.passed")
    )


def constraints_from_config(cfg: dict) -> list[Constraint]:
    """Build constraints from the JSON-config shorthand — the shape a
    pipeline config's optional ``validate`` section uses:

    ``{"min_rows": 10, "not_null": ["id"], "unique": ["id"],
    "in_range": [{"col": "x", "lo": 0, "hi": 1}],
    "matches": [{"col": "id", "pattern": "^[0-9]+$"}],
    "satisfies": [{"name": "len_ok", "expr": "n_chars = length(text)"}]}``

    Every list entry may set ``min_fraction`` (default 1.0).
    """
    out: list[Constraint] = []
    if "min_rows" in cfg:
        out.append(min_rows(int(cfg["min_rows"])))
    for col in cfg.get("not_null", []):
        out.append(not_null(col))
    for col in cfg.get("unique", []):
        out.append(unique(col))
    for spec in cfg.get("in_range", []):
        out.append(
            in_range(
                spec["col"], spec["lo"], spec["hi"],
                spec.get("min_fraction", 1.0),
            )
        )
    for spec in cfg.get("matches", []):
        out.append(
            matches(spec["col"], spec["pattern"], spec.get("min_fraction", 1.0))
        )
    for spec in cfg.get("satisfies", []):
        # the expression is a SQL string in config form — parsed by
        # Spark, evaluated like any other codegen predicate
        out.append(
            satisfies(
                spec["name"], F.expr(spec["expr"]), spec.get("min_fraction", 1.0)
            )
        )
    return out


def dataset_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    *,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Release-to-release snapshot diff — the dataset-versioning
    counterpart of ``check_constraints``: one row with added / removed
    / changed / unchanged counts and churn rates between two corpus
    snapshots. "Changed" compares an md5 over ``content_cols``
    (default: every non-id column common to both frames, in sorted
    name order — schema-stable).

    Scale shape: each side reduces to (id, fingerprint) — an id-sized
    projection, not the payload — then ONE full outer join on the id
    and a single aggregate; the join keys are ids, AQE handles skew,
    and the corpus text crosses no exchange. The report a release
    pipeline logs next to its dataset card before publishing."""
    if content_cols is None:
        shared = set(old_df.columns) & set(new_df.columns)
        content_cols = sorted(c for c in shared if c != id_col)
    if not content_cols:
        raise ValueError("dataset_diff needs at least one content column")

    def fp(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                        for c in content_cols])).alias(tag),
        )

    j = fp(old_df, "__old_fp").join(
        fp(new_df, "__new_fp"), id_col, "full_outer"
    )
    agg = j.agg(
        F.sum(F.when(F.col("__old_fp").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("added"),
        F.sum(F.when(F.col("__new_fp").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("removed"),
        F.sum(
            F.when(
                F.col("__old_fp").isNotNull()
                & F.col("__new_fp").isNotNull()
                & (F.col("__old_fp") != F.col("__new_fp")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("changed"),
        F.sum(
            F.when(F.col("__old_fp") == F.col("__new_fp"), 1).otherwise(0)
        )
        .cast("long")
        .alias("unchanged"),
    )
    return agg.select(
        "added",
        "removed",
        "changed",
        "unchanged",
        F.round(
            (F.col("added") + F.col("removed") + F.col("changed"))
            / F.greatest(
                F.col("removed") + F.col("changed") + F.col("unchanged"),
                F.lit(1),
            ),
            6,
        ).alias("churn_vs_old"),
    )


def enforce_rules(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    *,
    violations_col: str = "violations",
) -> DataFrame:
    """Row-level contract gate — the quarantine half of the deequ
    niche that :func:`check_constraints` (aggregate verdicts) doesn't
    cover: every row gains an array of the rule names it VIOLATES
    (empty = conforming), the lakehouse "expectations" pattern where
    bad rows are routed to a quarantine table with machine-readable
    reasons instead of failing the job.

    ``rules`` are (name, boolean Column) pairs; a NULL predicate
    result counts as a violation (a null price is not "in range").
    Pure codegen — one projection, no shuffle, no scan duplication:
    route with ``.filter(F.size(violations_col) == 0)`` /
    ``> 0`` and both branches reuse the same gated scan."""
    if not rules:
        raise ValueError("rules must be non-empty")
    marks = [
        F.when(pred, F.lit(None).cast("string")).otherwise(F.lit(name))
        for name, pred in rules
    ]
    return df.withColumn(
        violations_col, F.array_compact(F.array(*marks))
    )


def quarantine_summary(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    *,
    violations_col: str = "violations",
) -> DataFrame:
    """Violation-combination counts from :func:`enforce_rules`: one
    row per distinct set of failed rules (the empty string = clean),
    with count and share — the triage table that says whether bad rows
    share one root cause or are scattered. One gate projection + one
    map-side-combinable count; share is computed from a window over
    the combo-sized result, never a rescan."""
    from pyspark.sql import Window as W

    gated = enforce_rules(df, rules, violations_col=violations_col)
    combos = gated.groupBy(
        F.array_join(F.sort_array(F.col(violations_col)), ",").alias("combo")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = F.sum("n").over(W.partitionBy())
    return combos.select(
        "combo",
        "n",
        F.round(F.col("n") / total, 6).alias("share"),
    ).orderBy(F.desc("n"), "combo")


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key integrity audit across a set of parent/child
    relations — the cross-TABLE twin of :func:`check_constraints`'s
    row-level rules: each entry ``(name, child, child_key, parent,
    parent_key)`` yields one report row with the child cardinality,
    NULL-key count (SQL FK semantics: a NULL reference is not an
    orphan, but it IS worth surfacing), orphan count (non-null child
    keys with no matching parent), and orphan rate over non-null
    keys. A green report is the artifact: pipelines assert
    ``orphans == 0`` before publishing a snapshot, and a nonzero row
    names exactly which join in every downstream query will silently
    drop rows.

    Scale shape, per relation: ONE scan of the child, folded to a
    (key, count) aggregate first (map-side combinable — the NULL-key
    group rides along), then an id-width left join of that
    distinct-key frame against the distinct parent key (broadcast
    when the parent is a dim table, shuffle otherwise; Catalyst
    decides from stats), and ONE final aggregate derives all four
    stats. The join input is distinct-key-sized, not child-row-sized
    — at 100 TB the lineitem→orders audit joins ~|orders| rows, not
    ~|lineitem|. Relations audit independently — no cross-relation
    state — and the result is a union of one-row frames, so the whole
    audit is as parallel as the cluster allows."""
    out = None
    for name, child, ck, parent, pk in relations:
        folded = child.groupBy(F.col(ck).alias("__k")).agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
        pkeys = (
            parent.select(F.col(pk).alias("__k"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        row = (
            folded.join(pkeys, "__k", "left")
            .agg(
                F.coalesce(F.sum("__n"), F.lit(0))
                .cast("long")
                .alias("child_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__k").isNull(), F.col("__n"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("null_keys"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("__k").isNotNull()
                            & F.col("__hit").isNull(),
                            F.col("__n"),
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("orphans"),
            )
            .select(
                F.lit(name).alias("relation"),
                "child_rows",
                "null_keys",
                "orphans",
                F.round(
                    F.try_divide(
                        F.col("orphans"),
                        F.col("child_rows") - F.col("null_keys"),
                    ),
                    6,
                ).alias("orphan_rate"),
            )
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("relations must be non-empty")
    return out.orderBy("relation")


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    probs: tuple[float, ...] = (
        0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
    ),
    eps: float = 1e-6,
    threshold: float = 0.2,
    detail: bool = False,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and a
    current one: bin BOTH by the reference's exact-percentile edges
    (deciles by default) and report Σ (p_cur − p_ref)·ln(p_cur/p_ref)
    per group — the standard model-monitoring drift score
    (psi < 0.1 stable, 0.1–0.2 moderate, > 0.2 drifted; ``threshold``
    sets the flag). Complements :func:`x12_source_profile_drift`-style
    mean ratios: PSI sees SHAPE changes (variance blowup, bimodality)
    a mean can't.

    Scale shape: edges reduce the reference to one interpolated-
    percentile row per group (map-side combinable, no global sort —
    the :func:`equal_frequency_bins` trick); both snapshots then union
    into ONE tagged scan, bin via a broadcast-joined when-chain, and
    aggregate to (group × side × bins) counts — the only exchange is
    that tiny frame. Shares are clamped at ``eps`` so an empty bin
    contributes a finite penalty instead of ±inf. NULL values are
    dropped (they have no bin; profile NULL rates separately with
    ``check_constraints``).

    ``detail=True`` returns the per-bin decomposition
    (group, bin, ref_share, cur_share, contrib) instead of the
    per-group verdict (group, n_ref, n_cur, psi, drifted)."""
    gcols = list(group_cols or [])
    v = F.col(value_col)
    edges = (
        ref.filter(v.isNotNull())
        .groupBy(*gcols)
        .agg(
            F.percentile(
                value_col, F.array(*[F.lit(p) for p in probs])
            ).alias("__e")
        )
    )
    tagged = (
        ref.filter(v.isNotNull())
        .select(*gcols, value_col)
        .withColumn("__side", F.lit("ref"))
        .unionByName(
            cur.filter(v.isNotNull())
            .select(*gcols, value_col)
            .withColumn("__side", F.lit("cur"))
        )
    )
    joined = (
        tagged.join(F.broadcast(edges), gcols)
        if gcols
        else tagged.crossJoin(F.broadcast(edges))
    )
    bin_expr = F.when(v <= F.col("__e")[0], 1)
    for i in range(1, len(probs)):
        bin_expr = bin_expr.when(v <= F.col("__e")[i], i + 1)
    bin_expr = bin_expr.otherwise(len(probs) + 1)
    counts = (
        joined.select(*gcols, "__side", bin_expr.alias("bin"))
        .groupBy(*gcols, "__side", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*gcols, "__side")
    shares = counts.withColumn(
        "share", F.col("n") / F.sum("n").over(w)
    )
    rs = shares.filter(F.col("__side") == "ref").select(
        *gcols,
        "bin",
        F.col("share").alias("ref_share"),
        F.col("n").alias("ref_n"),
    )
    cs = shares.filter(F.col("__side") == "cur").select(
        *gcols,
        "bin",
        F.col("share").alias("cur_share"),
        F.col("n").alias("cur_n"),
    )
    both = rs.join(cs, [*gcols, "bin"], "full_outer").select(
        *gcols,
        "bin",
        F.coalesce("ref_share", F.lit(0.0)).alias("ref_share"),
        F.coalesce("cur_share", F.lit(0.0)).alias("cur_share"),
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    pr = F.greatest(F.col("ref_share"), F.lit(eps))
    pc = F.greatest(F.col("cur_share"), F.lit(eps))
    both = both.withColumn("contrib", (pc - pr) * F.log(pc / pr))
    if detail:
        return both.select(
            *gcols,
            "bin",
            F.round("ref_share", 6).alias("ref_share"),
            F.round("cur_share", 6).alias("cur_share"),
            F.round("contrib", 6).alias("contrib"),
        ).orderBy(*gcols, "bin")
    out = (
        both.groupBy(*gcols)
        .agg(
            F.sum("ref_n").cast("long").alias("n_ref"),
            F.sum("cur_n").cast("long").alias("n_cur"),
            F.round(F.sum("contrib"), 6).alias("psi"),
        )
        .withColumn("drifted", F.col("psi") > threshold)
    )
    return out.orderBy(*gcols) if gcols else out


def benford_audit(
    df: DataFrame,
    value_col: str,
    *,
    min_value: float = 0.01,
    summary: bool = False,
) -> DataFrame:
    """Benford first-significant-digit audit of a positive amount
    column — the fraud/corruption screen for financial-ish magnitudes
    (prices, revenues, populations): naturally-occurring multi-scale
    amounts follow P(d) = log10(1 + 1/d); fabricated or truncated
    feeds don't. Returns the 9-row digit table (digit, n, obs_share,
    exp_share, dev) or, with ``summary=True``, one row of
    (n, chi2, mad, conforms) — Nigrini's mean-absolute-deviation with
    the 0.015 "acceptable conformity" bar.

    The first digit comes from the STRING of the value in integer
    cents — ``substr(cast(round(v·100) as bigint), 1, 1)`` — not from
    ``floor(log10(v))``: the log path flips digits when an engine's
    log10 lands an ULP under an integer (1000.0 → 2.999…6 → digit 9),
    while round-to-cents is engine-exact for money-like doubles.
    Values below ``min_value`` (and non-positive) are excluded — they
    have no stable first digit at cent precision.

    Scale shape: one filtered scan folding to ≤ 9 count cells
    (map-side combinable); every share/χ²/MAD step is arithmetic on
    that 9-row frame."""
    import math

    v = F.col(value_col).cast("double")
    digit = F.substring(
        F.round(v * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(v >= min_value)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    exp_map = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(math.log10(1 + 1 / d)))
        ]
    )
    from pyspark.sql import Window

    total = F.sum("n").over(Window.partitionBy())
    detail = counts.select(
        "digit",
        "n",
        F.round(F.col("n") / total, 6).alias("obs_share"),
        F.round(exp_map[F.col("digit")], 6).alias("exp_share"),
        F.round(
            F.col("n") / total - exp_map[F.col("digit")], 6
        ).alias("dev"),
    )
    if not summary:
        return detail.orderBy("digit")
    dev = F.col("n") / total - exp_map[F.col("digit")]
    per = counts.select(
        F.col("n"),
        (dev * dev / exp_map[F.col("digit")]).alias("__c2"),
        F.abs(dev).alias("__ad"),
        total.alias("__t"),
    )
    return per.agg(
        F.max("__t").cast("long").alias("n"),
        F.round(F.max("__t") * F.sum("__c2"), 6).alias("chi2"),
        F.round(F.avg("__ad"), 6).alias("mad"),
        (F.avg("__ad") <= 0.015).alias("conforms"),
    )


# keys are DataType.simpleString() names (int/bigint, not
# integer/long)
_SAFE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("int", "double"), ("bigint", "double"),
    ("date", "timestamp"),
}


def schema_evolution_report(old_schema, new_schema) -> list[dict]:
    """Schema-contract diff between two Spark schemas (StructType):
    classify every column change as ``safe`` (added nullable column,
    numeric/date widening, nullable relaxation alone) or ``breaking``
    (dropped column, type narrowing or change, added NON-nullable
    column, nullable→required tightening) — the check a publishing
    pipeline runs against the previous release's schema before a new
    snapshot goes out, because a reader compiled against the old
    contract will silently mis-join or hard-fail on a breaking change.

    Pure metadata (no data scan); nested structs compare by their
    simpleString. Returns a list of dicts (column, change, severity,
    detail) — empty means identical contracts."""
    old = {f.name: f for f in old_schema.fields}
    new = {f.name: f for f in new_schema.fields}
    report: list[dict] = []
    for name in sorted(set(old) | set(new)):
        if name not in new:
            report.append({
                "column": name, "change": "dropped",
                "severity": "breaking",
                "detail": f"was {old[name].dataType.simpleString()}",
            })
            continue
        if name not in old:
            f = new[name]
            report.append({
                "column": name, "change": "added",
                "severity": "safe" if f.nullable else "breaking",
                "detail": (
                    f"{f.dataType.simpleString()}"
                    + ("" if f.nullable else " (non-nullable: old rows"
                       " have no value a strict reader can supply)")
                ),
            })
            continue
        fo, fn = old[name], new[name]
        to, tn = fo.dataType.simpleString(), fn.dataType.simpleString()
        if to != tn:
            severity = (
                "safe" if (to, tn) in _SAFE_WIDENINGS else "breaking"
            )
            report.append({
                "column": name, "change": "type",
                "severity": severity, "detail": f"{to} -> {tn}",
            })
        if fo.nullable != fn.nullable:
            report.append({
                "column": name, "change": "nullability",
                "severity": "safe" if fn.nullable else "breaking",
                "detail": (
                    "required -> nullable" if fn.nullable
                    else "nullable -> required (existing NULLs break)"
                ),
            })
    return report


def root_cause_report(
    ref: DataFrame,
    cur: DataFrame,
    dims: list[str],
    *,
    eps: float = 1e-9,
    top_k: int = 5,
) -> DataFrame:
    """Adtributor-style root-cause attribution (Bhagwan et al.,
    NSDI'14): a metric moved between two periods — WHICH dimension
    value explains it? For every value of every candidate dimension:
    ``explanatory_power`` = its share of the total row-count delta,
    and ``surprise`` = its Jensen–Shannon divergence term between the
    periods' composition shares (the signal that a value's MIX shifted
    even when the total didn't). The top-``top_k`` values per
    dimension, surprise-ranked, is the incident-drilldown table that
    replaces eyeballing N group-bys.

    Scale shape: ONE tagged union scan per dimension list — each
    dimension folds to its (value, side) counts via a plan-side
    unpivot (the ``x12_layout_advisor`` stack pattern), so k
    dimensions cost one pass, not k; all divergence math runs on the
    tiny count frame. Shares are eps-clamped so absent-in-one-period
    values stay finite."""
    if not dims:
        raise ValueError("dims must be non-empty")
    from pyspark.sql import Window

    def stacked(df: DataFrame, side: str) -> DataFrame:
        rows = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        F.col(d).cast("string").alias("value"),
                    )
                    for d in dims
                ]
            )
        ).alias("r")
        return df.select(rows).select(
            "r.dim", "r.value", F.lit(side).alias("side")
        )

    counts = (
        stacked(ref, "ref")
        .unionByName(stacked(cur, "cur"))
        .groupBy("dim", "value", "side")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("dim", "side")
    shares = counts.withColumn("tot", F.sum("n").over(w))
    r = shares.filter(F.col("side") == "ref").select(
        "dim", "value",
        F.col("n").alias("ref_n"), F.col("tot").alias("ref_tot"),
    )
    c = shares.filter(F.col("side") == "cur").select(
        "dim", "value",
        F.col("n").alias("cur_n"), F.col("tot").alias("cur_tot"),
    )
    both = (
        r.join(c, ["dim", "value"], "full_outer")
        .withColumn("ref_n", F.coalesce("ref_n", F.lit(0)))
        .withColumn("cur_n", F.coalesce("cur_n", F.lit(0)))
    )
    w2 = Window.partitionBy("dim")
    both = both.withColumn(
        "ref_tot", F.max("ref_tot").over(w2)
    ).withColumn("cur_tot", F.max("cur_tot").over(w2))
    p = F.greatest(F.col("ref_n") / F.col("ref_tot"), F.lit(eps))
    q = F.greatest(F.col("cur_n") / F.col("cur_tot"), F.lit(eps))
    surprise = 0.5 * (
        p * F.log(2 * p / (p + q)) + q * F.log(2 * q / (p + q))
    )
    ep = F.try_divide(
        F.col("cur_n") - F.col("ref_n"),
        F.col("cur_tot") - F.col("ref_tot"),
    )
    scored = both.select(
        "dim",
        "value",
        "ref_n",
        "cur_n",
        F.round(ep, 6).alias("explanatory_power"),
        F.round(surprise, 6).alias("surprise"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("dim").orderBy(
                F.desc("surprise"), "value"
            )
        ),
    )
    return (
        scored.filter(F.col("rank") <= top_k)
        .select(
            "dim", "rank", "value", "ref_n", "cur_n",
            "explanatory_power", "surprise",
        )
        .orderBy("dim", "rank")
    )


def pk_uniqueness(
    tables: list[tuple[str, DataFrame, list[str]]],
) -> DataFrame:
    """Primary-key uniqueness audit (round 8) — the third leg of the
    warehouse integrity stool next to :func:`check_constraints` (row
    rules) and :func:`referential_audit` (cross-table FKs): per
    declared key, total rows, distinct keys, keys appearing more than
    once, surplus rows those duplicates contribute, NULL-key rows
    (a NULL key can't be a PK — surfaced separately), and the
    duplication rate. Release gates assert ``dup_keys == 0`` before
    a snapshot publishes; a nonzero row names exactly which merge or
    ingest double-applied.

    Scale shape, per table: ONE scan folded to a (key…, count)
    aggregate — map-side combinable, spill-safe — then the stats fold
    that distinct-key frame to one row. Composite keys group on all
    parts; the NULL bucket is any-part-NULL (SQL PK semantics).
    Independent per table, unioned one-row frames."""
    out = None
    for name, df, keys in tables:
        if not keys:
            raise ValueError(f"table {name!r} declares no key columns")
        null_any = None
        for k in keys:
            c = F.col(k).isNull()
            null_any = c if null_any is None else null_any | c
        folded = (
            df.select(
                *[F.col(k) for k in keys], null_any.alias("__null")
            )
            .groupBy(*keys, "__null")
            .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        )
        nn = F.col("__null") == F.lit(False)
        row = folded.agg(
            F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.when(nn, 1)), F.lit(0))
            .cast("long")
            .alias("distinct_keys"),
            F.coalesce(F.sum(F.when(nn & (F.col("__n") > 1), 1)), F.lit(0))
            .cast("long")
            .alias("dup_keys"),
            F.coalesce(
                F.sum(F.when(nn & (F.col("__n") > 1), F.col("__n") - 1)),
                F.lit(0),
            )
            .cast("long")
            .alias("dup_rows"),
            F.coalesce(F.sum(F.when(~nn, F.col("__n"))), F.lit(0))
            .cast("long")
            .alias("null_rows"),
        ).select(
            F.lit(name).alias("tbl"),
            "n_rows",
            "distinct_keys",
            "dup_keys",
            "dup_rows",
            "null_rows",
            F.round(
                F.try_divide(F.col("dup_rows"), F.col("n_rows")), 6
            ).alias("dup_rate"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("tables must be non-empty")
    return out.orderBy("tbl")


def fd_audit(
    df: DataFrame,
    dependencies: list[tuple[str, str]],
    *,
    max_examples: int = 3,
) -> DataFrame:
    """Functional-dependency audit: for each claimed FD "X determines
    Y", count the X values that map to MORE than one distinct Y — the
    schema-design / merge-bug detector (a violated customer→nation or
    sku→brand dependency is how silent join fan-out and bad
    dimensional models get caught). Reports, per dependency: distinct
    X count, violating-X count, violation rate, and up to
    ``max_examples`` offending X values (smallest first, so the
    example list is deterministic and the row hash-stable).

    Scale shape: ONE (X, Y)-distinct aggregate per dependency — the
    same map-side-combinable dedup every profiler row costs — folded
    to per-X distinct-Y counts, then to one report row; example
    collection is a bounded sort of the violating keys only. NULL X
    rows are excluded (an FD is a statement about present keys); a
    NULL Y counts as a value (two rows NULL/non-NULL under one X ARE
    a violation)."""
    out = None
    for lhs, rhs in dependencies:
        per_x = (
            df.filter(F.col(lhs).isNotNull())
            .select(
                F.col(lhs).cast("string").alias("__x"),
                F.col(rhs).cast("string").alias("__y"),
            )
            .distinct()
            .groupBy("__x")
            .agg(F.count(F.lit(1)).alias("__ny"))
        )
        viol = per_x.filter(F.col("__ny") > 1)
        examples = (
            viol.orderBy("__x")
            .limit(max_examples)
            # array_sort: collect_list order is partition-order-
            # dependent even after limit; the sorted join is what
            # makes the report row hash-stable
            .agg(
                F.array_join(
                    F.array_sort(F.collect_list("__x")), ","
                ).alias("__ex")
            )
        )
        row = (
            per_x.agg(
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("__ny") > 1).cast("long"))
                .cast("long")
                .alias("violations"),
            )
            .crossJoin(F.broadcast(examples))
            .select(
                F.lit(f"{lhs}->{rhs}").alias("dependency"),
                "n_keys",
                "violations",
                F.round(
                    F.try_divide(F.col("violations"), F.col("n_keys")), 6
                ).alias("violation_rate"),
                F.col("__ex").alias("example_keys"),
            )
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("dependencies must be non-empty")
    return out.orderBy("dependency")


def key_discovery(
    df: DataFrame,
    columns: list[str],
    *,
    composites: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Candidate-key discovery — the inverse of the PK audit
    (``pk_uniqueness`` verifies DECLARED keys; this finds them): per
    column (and per opted-in composite pair), row count, NULL count,
    exact distinct count, uniqueness ratio, and ``is_key`` = fully
    distinct with zero NULLs. The schema-inference primitive behind
    "what can this table join on" and dedup-key selection.

    Composites are OPT-IN named pairs, never the full combinatorial
    lattice — at k columns the pair set alone is k²/2 distinct
    aggregates, and discovery workloads know their candidates. One
    aggregate per candidate (map-side combinable distinct); at
    warehouse scale swap exact ndv for approx_count_distinct and keep
    ``is_key`` as ndv == rows within the sketch's epsilon as a
    SCREEN, then verify survivors exactly."""
    out = None
    n_rows = df.count()
    cands: list[tuple[str, "Column"]] = [
        (c, F.col(c).cast("string")) for c in columns
    ]
    for a, b in composites or []:
        cands.append(
            (
                f"{a}+{b}",
                F.concat_ws(
                    "\x1f",
                    F.col(a).cast("string"),
                    F.col(b).cast("string"),
                ),
            )
        )
    for name, expr in cands:
        row = df.agg(
            F.lit(name).alias("candidate"),
            F.lit(n_rows).cast("long").alias("n_rows"),
            F.sum(expr.isNull().cast("long"))
            .cast("long")
            .alias("n_null"),
            F.count_distinct(expr).cast("long").alias("ndv"),
        ).select(
            "candidate",
            "n_rows",
            "n_null",
            "ndv",
            F.round(F.try_divide(F.col("ndv"), F.col("n_rows")), 6).alias(
                "uniqueness"
            ),
            (
                (F.col("ndv") == F.col("n_rows")) & (F.col("n_null") == 0)
            ).alias("is_key"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("columns must be non-empty")
    return out.orderBy("candidate")


def id_gap_audit(
    df: DataFrame,
    key_col: str,
    *,
    bucket: int = 1024,
    top_gaps: int = 5,
) -> DataFrame:
    """Sequence-gap audit over a monotone surrogate key — "did a load
    drop a range?" Missing-id mass and WHERE it is: a batch that
    silently lost a partition shows up as one contiguous hole, while
    organic sparsity (TPC-H orderkeys use 4 of every 32) shows up as
    uniform small gaps. Reports the global fill ratio plus the
    ``top_gaps`` largest holes with their [after, before] bounds.

    Scale shape: NO global sort of keys. Keys bucket by
    ``key div bucket``; within-bucket neighbor gaps come from a lag
    window PARTITIONED by bucket (partition-local sort of ~``bucket``
    keys), and cross-bucket boundary gaps from a lag over the
    bucket-summary frame (rows = keyspan/bucket, day-sized at any
    scale). The result is exact — every gap is either within one
    bucket or between two adjacent non-empty buckets' max/min.
    Duplicate keys collapse first (distinct), so the audit composes
    with non-unique staging tables.
    """
    from pyspark.sql import Window as W

    k = df.select(F.col(key_col).cast("long").alias("__k")).filter(
        F.col("__k").isNotNull()
    ).distinct()
    b = k.withColumn("__b", (F.col("__k") / bucket).cast("long"))
    win = W.partitionBy("__b").orderBy("__k")
    within = b.select(
        "__k",
        (F.col("__k") - F.lag("__k").over(win)).alias("__gap"),
        F.lag("__k").over(win).alias("__after"),
    ).filter(F.col("__gap").isNotNull() & (F.col("__gap") > 1))
    summ = b.groupBy("__b").agg(
        F.min("__k").alias("__mn"),
        F.max("__k").alias("__mx"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    bwin = W.orderBy("__b")
    boundary = summ.select(
        (F.col("__mn") - F.lag("__mx").over(bwin)).alias("__gap"),
        F.lag("__mx").over(bwin).alias("__after"),
    ).filter(F.col("__gap").isNotNull() & (F.col("__gap") > 1))
    gaps = within.select("__gap", "__after").unionByName(
        boundary.select("__gap", "__after")
    )
    totals = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("__k").alias("lo"),
        F.max("__k").alias("hi"),
    )
    # top-N first (TakeOrdered — no global sort materializes), THEN
    # rank the N survivors with a trivial window
    top = gaps.orderBy(F.desc("__gap"), F.asc("__after")).limit(top_gaps)
    ranked = top.crossJoin(F.broadcast(totals)).select(
        F.row_number()
        .over(W.orderBy(F.desc("__gap"), F.asc("__after")))
        .cast("long")
        .alias("gap_rank"),
        (F.col("__gap") - 1).cast("long").alias("missing_ids"),
        (F.col("__after") + 1).cast("long").alias("hole_start"),
        (F.col("__after") + F.col("__gap") - 1).cast("long").alias(
            "hole_end"
        ),
        "n_keys",
        "lo",
        "hi",
    )
    span = (F.col("hi") - F.col("lo") + 1).cast("double")
    return (
        ranked.select(
            "gap_rank",
            "missing_ids",
            "hole_start",
            "hole_end",
            "n_keys",
            (F.col("hi") - F.col("lo") + 1 - F.col("n_keys"))
            .cast("long")
            .alias("total_missing"),
            F.round(F.col("n_keys") / span, 6).alias("fill_ratio"),
        )
        .orderBy("gap_rank")
    )


def benford_report(
    df: DataFrame,
    value_col: str,
    *,
    cents_scale: int = 100,
) -> DataFrame:
    """Benford CHI-SQUARED audit (round 11) — the formal test layer
    over :func:`benford_audit` (round 7), which reports per-digit
    deviations without a decision rule. The classic
    fabricated-/degenerate-data screen for money-like columns:
    naturally occurring multi-magnitude amounts follow
    P(d) = log10(1 + 1/d); synthetic, truncated, or copy-pasted data
    does not, and the per-digit chi-squared contributions say WHERE
    it breaks. One row per leading digit 1-9 with observed count and
    share, the Benford expectation, the digit's chi-squared
    contribution, and the total statistic (df = 8; 15.507 is the 5%
    critical value, surfaced as ``suspicious``).

    Determinism: values quantize to integer "cents" with the explicit
    half-away floor, and the leading digit is the first character of
    the INTEGER's decimal string — integer-to-string is identical on
    every engine, where double formatting is not. The nine Benford
    probabilities are embedded as literal doubles (computed once
    here), so both engines fold the same constants. NULL values and
    values quantizing to zero or negative cents are excluded (Benford
    applies to magnitudes, and a sub-half-cent value has no stable
    first digit at cent precision).

    Scale shape: one map-side-combinable digit count; the chi-squared
    fold runs over the 9-row digit frame.
    """
    import math

    probs = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]
    v = F.col(value_col).cast("double")
    cents = F.floor(v * cents_scale + F.lit(0.5)).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        # filter on the QUANTIZED value (r11 ADVICE): a positive value
        # that quantizes to 0 cents has leading digit '0' and would
        # silently fall out of the 1-9 left join below while still
        # counting toward n_total — exclude it here, consistently with
        # the docstring's "no stable first digit at cent precision".
        df.filter(v.isNotNull() & (cents > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    digits = counts.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(
            F.array(*[F.lit(float(p)) for p in probs]),
            F.col("id").cast("int"),
        ).alias("exp_share"),
    )
    full = digits.join(counts, "digit", "left").select(
        "digit",
        "exp_share",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )
    tot = F.sum("n").over(Window.partitionBy())
    staged = full.select(
        "digit",
        "n",
        tot.alias("n_total"),
        F.round(F.col("n").cast("double") / tot.cast("double"), 6).alias(
            "obs_share"
        ),
        F.round("exp_share", 6).alias("exp_share"),
        (
            (F.col("n").cast("double") - tot.cast("double") * F.col("exp_share"))
            * (F.col("n").cast("double") - tot.cast("double") * F.col("exp_share"))
            / (tot.cast("double") * F.col("exp_share"))
        ).alias("__contrib"),
    )
    chi2 = F.sum("__contrib").over(Window.partitionBy())
    return staged.select(
        "digit",
        "n",
        "n_total",
        "obs_share",
        "exp_share",
        F.round("__contrib", 6).alias("chi2_contrib"),
        F.round(chi2, 6).alias("chi2"),
        (F.round(chi2, 6) > F.lit(15.507)).alias("suspicious"),
    ).orderBy("digit")
