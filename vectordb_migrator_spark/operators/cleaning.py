"""Corpus cleaning operators — boilerplate line removal (X5 family).

The standard pre-training cleanup (CCNet / RefinedWeb style): split
documents into lines, measure each line's document frequency across
the corpus, drop lines that repeat in more than a threshold fraction
of documents (navigation chrome, cookie banners, copyright footers),
and reassemble the survivors in order.

Scale design: three shuffles, all key-sized —
1. line document-frequency: ``dropDuplicates(id, line)`` then a
   map-side-combinable count per line;
2. hot-line anti-join: lines stream past the hot set (which is tiny —
   by definition a hot line appears in >frac of ALL docs, so there can
   be at most ``1/frac`` of them ... per unique line text — Catalyst/
   AQE broadcasts it);
3. reassembly: one exchange on doc id, order restored from the carried
   ``pos`` (no global sort).
The corpus-size denominator is a 1-row broadcast cross join, not a
driver action — the whole operator stays lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.3,
) -> DataFrame:
    """Drop lines appearing in more than ``max_df_frac`` of documents.

    Returns one row per input document: ``(id_col, cleaned,
    n_kept_lines, n_removed_lines)``. A document whose every line is
    boilerplate survives with ``cleaned = ''`` (dropping whole docs is
    the corpus-filter operator's decision, not this one's).

    Line identity is the exact line string. Lines are counted once per
    document (a doc repeating its own line 50× contributes df=1), which
    is what makes the threshold a *document* frequency.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    n_docs = df.agg(F.count("*").alias("n_docs"))
    hot = (
        lines.dropDuplicates(["id", "line"])
        .groupBy("line")
        .agg(F.count("*").alias("line_docs"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("line_docs").cast("double")
            > F.col("n_docs").cast("double") * F.lit(max_df_frac)
        )
        .select("line")
    )
    kept = lines.join(hot, "line", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("cleaned"),
        F.count("*").alias("n_kept_lines"),
    )
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
            F.coalesce("n_kept_lines", F.lit(0)).alias("n_kept_lines"),
            (F.col("n_lines") - F.coalesce("n_kept_lines", F.lit(0))).alias(
                "n_removed_lines"
            ),
        )
    )
