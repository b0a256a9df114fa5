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
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.util import fan_out


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


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: per TEST document, the fraction of
    its n-gram shingles that appear anywhere in the TRAIN corpus —
    the standard eval-leakage check run before training (n-grams of
    8-13 tokens in the common recipes; this corpus's short docs use
    smaller n).

    Returns (id_col, n_grams, n_contaminated, contamination,
    is_contaminated) for every test document.

    Scale shape: the train side reduces to DISTINCT grams — ids and
    counts never matter, so the join input is one string column,
    deduplicated map-side before the exchange. The test side shuffles
    (gram, id) pairs; the semi-join marks grams present in train, and
    a count per test doc finishes it. ``max_df`` (same knob as
    ``ngram_jaccard_pairs``) drops train grams above a document
    frequency before the join — boilerplate grams both bloat the join
    and produce false contamination signal.
    """
    from vectordb_migrator_spark.operators.dedup import shingles

    test_grams = fan_out(test).select(
        F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")
    ).withColumn("n_grams", F.size("sh"))
    test_flat = test_grams.select(
        "id", "n_grams", F.explode("sh").alias("g")
    )
    train_flat = fan_out(train).select(
        F.explode(shingles(text_col, n)).alias("g"), F.col(id_col).alias("tid")
    )
    if max_df is not None:
        keep = (
            train_flat.groupBy("g")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("g")
        )
        train_grams = keep
    else:
        train_grams = train_flat.select("g").distinct()
    hits = test_flat.join(train_grams, "g", "left_semi")
    per_doc = hits.groupBy("id", "n_grams").agg(
        F.count("*").alias("n_contaminated")
    )
    return (
        test_grams.select("id", "n_grams")
        .join(per_doc.select("id", "n_contaminated"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("contamination"),
        )
        .withColumn(
            "is_contaminated", F.col("contamination") >= F.lit(threshold)
        )
    )


def unigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram surprisal (-log2 p) under a corpus
    unigram LM with additive smoothing — the classic cheap stand-in
    for a perplexity quality filter: natural prose scores near the
    corpus average, keyboard mash and template spam score high, and
    degenerate repetition scores low.

    The LM keeps only the top ``vocab_size`` tokens (by corpus count,
    ties to the lexicographically smaller token); everything else
    falls into one OOV bucket with count 0 under the same smoothing,
    so the model size is bounded no matter the corpus.

    Returns ``(id_col, surprisal, n_tok)``, one row per document that
    has at least one token.

    Scale design: token counts shuffle (token, partial-count) with
    map-side combine; the vocabulary is a TakeOrdered(vocab_size)
    broadcast back into a map-side join (never a token-token shuffle);
    corpus totals ride along as a 1-row broadcast cross join so the
    operator stays lazy end-to-end. The only other exchange is the
    per-document partial-avg rollup.
    """
    from vectordb_migrator_spark.functions.text import ws_tokens

    toks = (
        df.select(F.col(id_col), F.explode(ws_tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = counts.orderBy(F.desc("c"), "tok").limit(vocab_size)
    # Both corpus totals derive from `counts`, NOT from a fresh pass
    # over toks: sum(c) IS the token count and least(#distinct, V) IS
    # the vocab size. The two consumers of `counts` share one
    # identical child, so Catalyst's ReuseExchange serves vocab and
    # stats from the same token-count shuffle — the whole operator
    # tokenizes the corpus twice (score pass + stats pass), the
    # honest minimum for a corpus-statistics model.
    stats = counts.agg(
        F.sum("c").cast("double").alias("n_total"),
        F.least(F.count("*"), F.lit(vocab_size)).cast("double").alias("n_vocab"),
    )
    denom = F.col("n_total") + F.lit(alpha) * (F.col("n_vocab") + 1)
    p = (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(alpha)) / denom
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log2(p)), 6).alias("surprisal"),
            F.count("*").alias("n_tok"),
        )
    )


def corpus_stats(
    df: "DataFrame",
    *,
    text_col: str = "text",
) -> "DataFrame":
    """One-row corpus health report — the gate a training-data
    pipeline checks before (and after) every ingest: volume, emptiness,
    exact-duplicate mass, token-length distribution, PII incidence.

    ONE pass, every metric a map-side-combinable aggregate (counts,
    long sums, countDistinct on a 16-hex content hash, exact
    interpolated percentiles); the mean derives from the exact long
    sum rather than a float avg, so the report is bit-deterministic
    across engines and partitionings. At 100 TB this is the same scan
    shape as any count(*) — no joins, no windows, nothing driver-side.
    """
    from vectordb_migrator_spark.functions.text import (
        md5_fingerprint,
        pii_count,
        token_count_ws,
        ws_strip,
    )

    t = F.col(text_col)
    toks = token_count_ws(t)
    zero = F.lit(0).cast("long")
    return (
        df.agg(
            F.count("*").cast("long").alias("n_docs"),
            # counts and totals coalesce to 0 on an empty corpus (sum
            # over zero rows is NULL) — a gate reads "nothing there",
            # not "unknown"; mean/percentiles stay NULL (undefined)
            F.coalesce(
                F.sum(F.when(ws_strip(t) == "", 1).otherwise(0)).cast("long"),
                zero,
            ).alias("n_empty"),
            (F.count("*") - F.count_distinct(md5_fingerprint(t)))
            .cast("long")
            .alias("n_exact_dups"),
            F.coalesce(F.sum(toks).cast("long"), zero).alias("tok_total"),
            F.coalesce(F.sum(F.length(t)).cast("long"), zero).alias(
                "chars_total"
            ),
            F.percentile(toks, F.lit(0.5)).alias("tok_p50"),
            F.percentile(toks, F.lit(0.9)).alias("tok_p90"),
            F.coalesce(
                F.sum(F.when(pii_count(t) > 0, 1).otherwise(0)).cast("long"),
                zero,
            ).alias("n_pii_docs"),
        )
        .withColumn(
            "tok_mean",
            F.round(
                F.try_divide(
                    F.col("tok_total").cast("double"),
                    F.col("n_docs").cast("double"),
                ),
                6,
            ),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_size: int = 50_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram surprisal ``-log2 p(w2|w1)`` under a
    corpus bigram LM with additive smoothing — one step up from
    :func:`unigram_surprisal` toward the LM-perplexity quality filter
    (CCNet/Gopher-style): word-salad that passes a unigram filter
    (common words, nonsense order) scores high here because its
    *transitions* are rare.

    Model size is bounded twice: the top ``model_size`` bigrams (by
    count, ties lexicographic) and the top ``model_size`` left-token
    contexts; everything outside either table falls to count 0 under
    the same smoothing, so the broadcast stays fixed no matter the
    corpus. ``p = (c(w1,w2)+α) / (ctx(w1) + α·(V+1))`` with V =
    min(distinct bigrams, model_size).

    Returns ``(id_col, surprisal, n_big)`` for documents with ≥2
    tokens.

    Scale design: bigrams are built scan-side in codegen (zip of the
    token array with its shift — no positional self-join, no extra
    shuffle), then ONE (bigram, partial-count) map-side-combinable
    shuffle builds the model; the context table and the corpus stats
    both derive from that counts frame (ReuseExchange), and both
    model tables come back as broadcasts. The only other exchange is
    the per-document rollup.
    """
    from vectordb_migrator_spark.functions.text import ws_tokens

    arr = F.filter(ws_tokens(text_col), lambda x: x != "")
    bigrams = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = (
        df.select(F.col(id_col), bigrams.alias("__bgs"))
        .filter(F.size("__bgs") >= 1)
        .select(id_col, F.explode("__bgs").alias("bg"))
    )
    counts = bg.groupBy("bg").agg(F.count("*").alias("c"))
    model = counts.orderBy(F.desc("c"), "bg").limit(model_size)
    ctx = (
        counts.groupBy(F.split(F.col("bg"), " ").getItem(0).alias("w1"))
        .agg(F.sum("c").alias("ctx_c"))
        .orderBy(F.desc("ctx_c"), "w1")
        .limit(model_size)
    )
    stats = counts.agg(
        F.least(F.count("*"), F.lit(model_size)).cast("double").alias("n_vocab")
    )
    denom = (
        F.coalesce(F.col("ctx_c"), F.lit(0)).cast("double")
        + F.lit(alpha) * (F.col("n_vocab") + 1)
    )
    p = (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(alpha)) / denom
    return (
        bg.join(F.broadcast(model), "bg", "left")
        .withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log2(p)), 6).alias("surprisal"),
            F.count("*").alias("n_big"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Cross-document repeated-SPAN removal with keep-first semantics
    — the token-level exact-substring dedup of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed relationally: any n-token window that occurs in more
    than one document is removed from every document EXCEPT the one
    with the smallest id (one copy of every span survives the corpus,
    exactly the suffix-array method's contract, at n-gram instead of
    arbitrary-length resolution). Finer-grained than document near-dup
    (catches quotes and syndicated paragraphs inside otherwise-unique
    docs) and than line boilerplate (spans cross line breaks).

    Returns ``(id_col, clean_text, n_tokens, n_removed)`` — documents
    shorter than ``n`` tokens pass through untouched.

    Scale design: windows form scan-side in codegen (indexed transform
    over the token array — no positional self-join), and every gram is
    immediately collapsed to a 128-bit key (two ``xxhash64`` BIGINTs
    with distinct seeds) so the gram shuffle carries 16 bytes per
    window instead of the raw n-token string (~5-10× fewer shuffle
    bytes at 8-token grams; collision probability at 128 bits is
    negligible at any corpus size). ONE map-side-combinable
    (gram-key → df, min-doc) shuffle builds the span table, and a
    ``df > 1`` semi-filter shrinks it to actual repeats before the
    keyed join back (the same df-pre-pass trick as
    ``ngram_jaccard_pairs``). Covered positions then collapse to ONE
    sorted per-document position array (a duplicate-sized shuffle —
    only docs that actually contain repeats appear), and reassembly is
    a zero-shuffle codegen expression: ``array_except`` of the
    position sequence against the covered array followed by an indexed
    token lookup. No corpus-sized exchange ever carries a token
    column — documents stay whole-array rows from scan to result.
    """
    from vectordb_migrator_spark.functions.text import ws_tokens

    toks = F.filter(ws_tokens(text_col), lambda x: x != "")
    base = df.select(F.col(id_col), toks.alias("__toks"))

    # (id, start, gram-key) for every n-window; starts are 0-based.
    # Docs shorter than n emit no windows (the filter also keeps
    # sequence() ascending — sequence(0, negative) would descend).
    # The raw gram string exists only inside this scan-side projection;
    # what crosses the shuffle is its two-BIGINT hash.
    grams = (
        base.filter(F.size("__toks") >= n)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - n),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.concat_ws(
                            " ", F.slice("__toks", i + 1, n)
                        ).alias("gram"),
                    ),
                )
            ).alias("g"),
        )
        .select(
            id_col,
            F.col("g.start").alias("start"),
            F.xxhash64(F.col("g.gram")).alias("gh1"),
            F.xxhash64(F.lit(1), F.col("g.gram")).alias("gh2"),
        )
    )

    spans = (
        grams.groupBy("gh1", "gh2")
        .agg(
            F.countDistinct(id_col).alias("df"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("df") > 1)
    )
    # Per-doc sorted covered-position array: the ONLY post-span shuffle,
    # sized by documents-with-repeats, carrying (id, positions) only.
    covered = (
        grams.join(spans, ["gh1", "gh2"])
        .filter(F.col(id_col) != F.col("keeper"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("pos")).alias("__covered"))
    )
    # Reassembly is pure codegen: kept positions = all positions minus
    # covered (array_except preserves left order, so no re-sort), then
    # an indexed lookup back into the intact token array.
    kept_pos = F.when(
        F.size("__toks") > 0,
        F.array_except(
            F.sequence(F.lit(0), F.size("__toks") - 1),
            F.coalesce(F.col("__covered"), F.array().cast("array<int>")),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        base.join(covered, id_col, "left")
        .withColumn("__kept", kept_pos)
        .select(
            id_col,
            F.concat_ws(
                " ",
                F.transform(
                    F.col("__kept"), lambda p: F.element_at("__toks", p + 1)
                ),
            ).alias("clean_text"),
            F.size("__toks").cast("long").alias("n_tokens"),
            (F.size("__toks") - F.size("__kept")).cast("long").alias("n_removed"),
        )
    )


_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, "Scaling Language
    Models", table A1) as one codegen pass — the word-level subset
    that applies to single-line documents: word count in
    [min_words, max_words], mean word length in [3, 10], symbol-to-word
    ratio (# and ellipsis) ≤ 0.1, ≥ 80% of words containing an
    alphabetic character, and ≥ 2 distinct hits from the canonical
    8-stopword set. Returns every signal plus the conjunctive ``kept``
    flag, so downstream can both filter and audit which rule fired.
    Zero shuffles — every rule folds over the token array in the scan
    stage."""
    from vectordb_migrator_spark.functions.text import ws_tokens

    toks = F.filter(ws_tokens(text_col), lambda x: x != "")
    t = df.select(F.col(id_col), F.col(text_col).alias("__t"), toks.alias("__toks"))
    n = F.size("__toks")
    mean_len = F.when(
        n > 0,
        F.aggregate(
            F.col("__toks"), F.lit(0.0), lambda s, x: s + F.length(x)
        )
        / n,
    ).otherwise(F.lit(0.0))
    hashes = F.length("__t") - F.length(F.replace(F.col("__t"), F.lit("#"), F.lit("")))
    ellipses = (
        F.length("__t")
        - F.length(F.replace(F.col("__t"), F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.when(n > 0, (hashes + ellipses) / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n > 0,
        F.size(F.filter(F.col("__toks"), lambda x: x.rlike("[a-z]"))) / n,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct("__toks"),
            F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS]),
        )
    )
    out = t.select(
        id_col,
        n.cast("long").alias("n_word"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    kept = (
        (F.col("n_word") >= min_words)
        & (F.col("n_word") <= max_words)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("alpha_ratio") >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("kept", kept)


def curation_grain(
    df: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    quality_min_tokens: int = 20,
    sketch: bool = False,
) -> DataFrame:
    """The curation report's GRAIN rollup: per (source, predicted
    language, log2-length bucket) — a few hundred rows for any corpus
    — carrying the associative measures every report table derives
    from: ``n`` docs, ``tok`` tokens, ``passed`` quality-gate hits,
    and the exact-duplicate measure. An identical text always lands in
    the same grain (same source ⇒ same tokens ⇒ same lang/bucket), so
    per-grain distinct counts SUM correctly per source.

    ``sketch=False`` (batch): exact ``countDistinct(md5)`` into
    ``dist``. ``sketch=True`` (streaming partials): a mergeable HLL
    sketch into ``sk`` — per-batch partial sketches union associatively
    across appends, which an exact distinct count cannot
    (see :func:`~vectordb_migrator_spark.streaming.incremental
    .curation_ingest`). One scan, one map-side-combinable exchange."""
    from vectordb_migrator_spark.functions.text import lang_id, token_count_ws

    per = df.select(
        F.col(source_col).alias("source"),
        lang_id(text_col).alias("lang_pred"),
        token_count_ws(text_col).cast("long").alias("n_tok"),
        F.md5(text_col).alias("h"),
    )
    dup_measure = (
        F.hll_sketch_agg("h").alias("sk")
        if sketch
        else F.countDistinct("h").cast("double").alias("dist")
    )
    return per.groupBy(
        "source",
        "lang_pred",
        F.floor(F.log2(F.greatest(F.col("n_tok"), F.lit(1))))
        .cast("long")
        .alias("bucket"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("n_tok").cast("double").alias("tok"),
        dup_measure,
        F.sum(
            F.when(F.col("n_tok") >= quality_min_tokens, 1.0).otherwise(0.0)
        ).alias("passed"),
    )


def curation_sections(grain: DataFrame) -> DataFrame:
    """Fold a :func:`curation_grain` rollup (columns source, lang_pred,
    bucket, n, tok, dist, passed) into the long (section, k, v) report
    frame: temperature mixtures at α ∈ {0.3, 0.7}, per-language token
    shares, the power-of-two length histogram, within-source dup and
    quality-gate rates, and corpus totals. Every branch reads the
    (tiny) grain — callers materialize it once (localCheckpoint or a
    parquet store) so the corpus is never rescanned."""
    src = grain.groupBy("source").agg(
        F.sum("n").alias("n"),
        F.sum("tok").alias("tok"),
        F.sum("dist").alias("dist"),
        F.sum("passed").alias("passed"),
    )
    d = src.agg(
        F.sum(F.pow("n", F.lit(0.3))).alias("d03"),
        F.sum(F.pow("n", F.lit(0.7))).alias("d07"),
        F.sum("n").alias("all_n"),
        F.sum("tok").alias("all_tok"),
    )

    def sec(df, section: str, k, v):
        return df.select(
            F.lit(section).alias("section"),
            k.cast("string").alias("k"),
            F.round(v, 6).cast("double").alias("v"),
        )

    src_d = src.crossJoin(F.broadcast(d))
    lang = grain.groupBy("lang_pred").agg(F.sum("tok").alias("tok"))
    hist = grain.groupBy("bucket").agg(F.sum("n").alias("n"))
    parts = [
        sec(src_d, "mixture@0.3", F.col("source"),
            F.pow("n", F.lit(0.3)) / F.col("d03")),
        sec(src_d, "mixture@0.7", F.col("source"),
            F.pow("n", F.lit(0.7)) / F.col("d07")),
        sec(lang.crossJoin(F.broadcast(d)), "lang_tokens",
            F.col("lang_pred"), F.col("tok") / F.col("all_tok")),
        sec(hist, "len_hist", F.col("bucket"), F.col("n")),
        sec(src, "dup_by_source", F.col("source"),
            F.lit(1.0) - F.col("dist") / F.col("n")),
        sec(src, "quality_by_source", F.col("source"),
            F.col("passed") / F.col("n")),
        sec(d, "totals", F.lit("docs"), F.col("all_n")),
        sec(d, "totals", F.lit("tokens"), F.col("all_tok")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("section", "k")


def pmi_collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 30,
) -> DataFrame:
    """Collocation extraction by pointwise mutual information:
    PMI(w1,w2) = log2( p(w1 w2) / (p(w1)·p(w2)) ) over adjacent word
    pairs, with the classic ``min_count`` floor (Church & Hanks 1990
    — raw PMI without a floor surfaces hapax noise). High-PMI pairs
    are the corpus's multiword units: exactly what a tokenizer vocab,
    a phrase index (``x5_phrase_search``), or a boilerplate hunt
    wants ranked. The complement of ``bigram_surprisal``: that scores
    DOCUMENTS under a transition model, this scores the TRANSITIONS
    themselves.

    Scale shape: bigrams form scan-side in codegen (token array
    zipped with its shift — no positional join); ONE bigram-count
    shuffle and ONE unigram-count shuffle build the tables; the two
    1-row totals broadcast onto the floored bigram list (the vocab
    joins carry no hint — AQE sizes them);
    TakeOrdered(top_k) on (round-6 PMI DESC,
    pair ASC) keeps the ranking engine-reproducible under ties.

    Returns (w1, w2, n_pair, n_w1, n_w2, pmi)."""
    from vectordb_migrator_spark.functions.text import ws_tokens

    arr = F.filter(ws_tokens(text_col), lambda x: x != "")
    toks = df.select(F.explode(arr).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    bigrams = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.concat_ws("\x1f", a, b),
    )
    bi = (
        df.select(F.explode(bigrams).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
        .select(
            F.split_part(F.col("b"), F.lit("\x1f"), F.lit(1)).alias("w1"),
            F.split_part(F.col("b"), F.lit("\x1f"), F.lit(2)).alias("w2"),
            "n_pair",
        )
    )
    n_uni = uni.agg(F.sum("n_w").cast("double").alias("__nu"))
    n_bi = (
        df.select(
            F.greatest(F.size(arr) - 1, F.lit(0)).cast("long").alias("__c")
        )
        .agg(F.sum("__c").cast("double").alias("__nb"))
    )
    # vocab joins carry no broadcast hint: the unigram table is
    # vocab-sized (unbounded at corpus scale) while the floored
    # bigram side shrinks with min_count — AQE picks the right side
    joined = (
        bi.join(
            uni.withColumnRenamed("w", "w1").withColumnRenamed(
                "n_w", "n_w1"
            ),
            "w1",
        )
        .join(
            uni.withColumnRenamed("w", "w2").withColumnRenamed(
                "n_w", "n_w2"
            ),
            "w2",
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    pmi = F.round(
        F.log2(
            (F.col("n_pair") / F.col("__nb"))
            / (
                (F.col("n_w1") / F.col("__nu"))
                * (F.col("n_w2") / F.col("__nu"))
            )
        ),
        6,
    )
    return (
        joined.select("w1", "w2", "n_pair", "n_w1", "n_w2", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def kneser_ney_ppl(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney
    bigram LM trained on the corpus itself — the actual algorithm
    behind the CCNet/KenLM perplexity quality filter (here at bigram
    order), one modeling step past :func:`bigram_surprisal`'s
    additive smoothing: absolute discounting plus the CONTINUATION
    unigram (how many distinct contexts a word follows — why
    "Francisco", frequent but one-context, stops inflating p).

        P(w|v) = (c(v,w) − D)/c(v·) + D·N1+(v·)/c(v·) · N1+(·w)/T

    with D = 0.75 (exactly representable — c−D is engine-exact),
    N1+(v·)/N1+(·w) the distinct right/left neighbor counts and T the
    total bigram-type count. Scoring the training corpus means every
    bigram has c ≥ 1 > D, so p > 0 with no OOV branch to specify.

    Returns ``(id_col, surprisal, ppl, n_big)``: mean −log2 p, its
    2^x perplexity, and the bigram count, for docs with ≥ 2 tokens.

    Scale design: bigrams form scan-side in codegen (array zip — no
    positional join); ONE (w1,w2) map-side-combinable count shuffle
    builds the model, and all three model frames (context totals,
    continuation counts, T) derive from that counts frame
    (ReuseExchange). The model is corpus-vocabulary-sized, so scoring
    joins are key-partitioned shuffle joins — the layout distributed
    LM-training pipelines actually use — not bounded broadcasts; the
    per-document rollup is the final exchange.
    """
    from vectordb_migrator_spark.functions.text import ws_tokens

    d = float(discount)
    arr = F.filter(ws_tokens(text_col), lambda x: x != "")
    w1s = F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0)))
    w2s = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    bg = (
        df.select(
            F.col(id_col),
            F.arrays_zip(w1s.alias("w1"), w2s.alias("w2")).alias("__z"),
        )
        .filter(F.size("__z") >= 1)
        .select(id_col, F.explode("__z").alias("__b"))
        .select(
            id_col,
            F.col("__b.w1").alias("w1"),
            F.col("__b.w2").alias("w2"),
        )
    )
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = counts.groupBy("w1").agg(
        F.sum("c").alias("ctx_c"), F.count("*").alias("n_types")
    )
    cont = counts.groupBy("w2").agg(F.count("*").alias("n_cont"))
    tt = counts.agg(F.count("*").cast("double").alias("t"))
    term1 = (F.col("c").cast("double") - F.lit(d)) / F.col(
        "ctx_c"
    ).cast("double")
    lam = (
        F.lit(d)
        * F.col("n_types").cast("double")
        / F.col("ctx_c").cast("double")
    )
    pcont = F.col("n_cont").cast("double") / F.col("t")
    p = term1 + lam * pcont
    per = (
        bg.join(counts, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .groupBy(id_col)
        .agg(
            F.avg(-F.log2(p)).alias("__s"),
            F.count("*").cast("long").alias("n_big"),
        )
    )
    return per.select(
        id_col,
        F.round(F.col("__s"), 6).alias("surprisal"),
        F.round(F.pow(F.lit(2.0), F.col("__s")), 4).alias("ppl"),
        "n_big",
    )


def compression_ratio(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """zlib compression-ratio quality signal (the RefinedWeb/Dolma
    "gzip ratio" filter): templated spam, keyword stuffing and
    boilerplate compress far better than natural prose, so
    ``compressed_bytes / raw_bytes`` is one of the cheapest
    high-precision junk detectors a corpus pipeline runs. Uses REAL
    stdlib zlib at a FIXED level (the byte stream is deterministic
    for a fixed zlib version + level, so results are stable across
    runs and partitionings; the INFLATE side of the same codec is
    value-oracle-verified by x6_png_decode / x6_zip_shards).

    Returns ``(id_col, raw_bytes, zlib_bytes, ratio)`` with ratio
    rounded to 6; empty documents report ratio NULL.

    Scale shape: embarrassingly parallel Arrow-batched
    ``mapInPandas`` — one pass, no shuffle; text bytes never leave
    the executor. No SQL oracle (a DEFLATE bitstream is not
    SQL-expressible); verified by differential tests (known-string
    fixtures, repetition monotonicity, determinism) plus the
    oracled entropy-based twin ``x12_encoding_advisor``.
    """

    def kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            out = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                if not raw:
                    out.append(
                        {
                            "doc_id": int(did), "raw_bytes": 0,
                            "zlib_bytes": 0, "ratio": None,
                        }
                    )
                    continue
                comp = zlib.compress(raw, level)
                out.append(
                    {
                        "doc_id": int(did),
                        "raw_bytes": len(raw),
                        "zlib_bytes": len(comp),
                        "ratio": round(len(comp) / len(raw), 6),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(
        kernel,
        schema="doc_id long, raw_bytes long, zlib_bytes long, ratio double",
    )


def self_bleu2(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_size: int = 32,
    seed: int = 7,
) -> DataFrame:
    """Self-BLEU-2 corpus-diversity diagnostic (Zhu et al. 2018,
    Texygen): each sampled document is scored as a BLEU-2 hypothesis
    against the OTHER samples as references — high Self-BLEU means
    the corpus repeats itself (the mode-collapse signal every
    synthetic-data pipeline must watch; complements the
    within-document ``x5_lexical_diversity`` with a BETWEEN-document
    measure). Standard smoothing-free BLEU: clipped n-gram precision
    (clip by the max reference count, n = 1, 2), brevity penalty
    against the closest reference length (ties toward the shorter),
    geometric mean; a hypothesis with zero clipped matches at either
    order scores 0; sub-2-token docs score NULL.

    Determinism: the sample is an md5 rank (the standard move —
    Self-BLEU is O(sample²), never corpus-wide), every count is an
    exact integer, clipping uses the (max, unique-argmax, second-max)
    decomposition so "max over the OTHERS" needs no per-hypothesis
    rescan, and the only floats are final ratios — full SQL oracle.

    Scale shape: one md5-rank TakeOrdered picks the sample; all
    scoring joins run on sample²-bounded gram frames.

    Returns per sampled doc: ``(id_col, n_tok, p1, p2, bp, bleu2)``.
    """
    from vectordb_migrator_spark.functions.text import ws_tokens

    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":sb:{seed}"))
    )
    toks = F.filter(ws_tokens(text_col), lambda x: x != "")
    samp = (
        df.select(F.col(id_col).alias("h"), toks.alias("__t"), key.alias("__k"))
        .orderBy("__k", "h")
        .limit(sample_size)
        .select("h", "__t", F.size("__t").alias("len"))
        .localCheckpoint(eager=True)
    )

    def gram_counts(n: int) -> DataFrame:
        if n == 1:
            g = F.col("__t")
        else:
            g = F.zip_with(
                F.slice(
                    F.col("__t"),
                    1,
                    F.greatest(F.size("__t") - 1, F.lit(0)),
                ),
                F.slice(
                    F.col("__t"),
                    2,
                    F.greatest(F.size("__t") - 1, F.lit(0)),
                ),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return (
            samp.select("h", F.explode(g).alias("g"))
            .groupBy("h", "g")
            .agg(F.count("*").cast("long").alias("c"))
        )

    def clipped(n: int) -> DataFrame:
        cnt = gram_counts(n)
        # (max, #docs at max, second max) per gram: "max over the
        # other docs" without a per-hypothesis rescan
        stats = cnt.groupBy("g").agg(
            F.max("c").alias("m1"),
            F.count("*").alias("nd"),
        )
        at_max = (
            cnt.join(stats, "g")
            .groupBy("g")
            .agg(
                F.max("m1").alias("m1"),
                F.sum((F.col("c") == F.col("m1")).cast("long")).alias(
                    "n1"
                ),
                F.max(
                    F.when(F.col("c") < F.col("m1"), F.col("c"))
                ).alias("m2"),
            )
        )
        maxother = F.when(
            (F.col("c") == F.col("m1")) & (F.col("n1") == 1),
            F.coalesce(F.col("m2"), F.lit(0)),
        ).otherwise(F.col("m1"))
        return (
            cnt.join(at_max, "g")
            .groupBy("h")
            .agg(
                F.sum(F.least(F.col("c"), maxother)).alias(f"clip{n}"),
                F.sum("c").alias(f"tot{n}"),
            )
        )

    # brevity penalty: closest reference length, ties to the shorter
    a = samp.select(F.col("h"), F.col("len").alias("hl"))
    b = samp.select(F.col("h").alias("r"), F.col("len").alias("rl"))
    rk = F.row_number().over(
        Window.partitionBy("h").orderBy(
            F.abs(F.col("rl") - F.col("hl")), F.col("rl"), F.col("r")
        )
    )
    bp = (
        a.join(b, F.col("h") != F.col("r"))
        .withColumn("__rk", rk)
        .filter(F.col("__rk") == 1)
        .select(
            "h",
            "hl",
            F.when(F.col("hl") > F.col("rl"), F.lit(1.0))
            .otherwise(
                F.exp(
                    F.lit(1.0)
                    - F.col("rl").cast("double")
                    / F.col("hl").cast("double")
                )
            )
            .alias("bp"),
        )
    )
    j = bp.join(clipped(1), "h").join(clipped(2), "h", "left")
    p1 = F.col("clip1").cast("double") / F.col("tot1").cast("double")
    p2 = F.col("clip2").cast("double") / F.col("tot2").cast("double")
    bleu = (
        F.when(F.col("tot2").isNull(), F.lit(None).cast("double"))
        .when(
            (F.col("clip1") > 0) & (F.col("clip2") > 0),
            F.col("bp")
            * F.exp(F.lit(0.5) * (F.log(p1) + F.log(p2))),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        j.select(
            F.col("h").alias(id_col),
            F.col("hl").cast("long").alias("n_tok"),
            F.round(p1, 6).alias("p1"),
            F.round(
                F.when(F.col("tot2").isNotNull(), p2), 6
            ).alias("p2"),
            F.round("bp", 6).alias("bp"),
            F.round(bleu, 6).alias("bleu2"),
        )
        .orderBy(id_col)
    )


def span_corruption(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    noise_pct: int = 15,
) -> DataFrame:
    """T5-style SPAN-CORRUPTION training transform (round 12) — the
    denoising objective's data prep (Raffel et al., JMLR'20 §3.1.4):
    each token flips an independent deterministic md5 coin at
    ``noise_pct``%; CONSECUTIVE masked tokens collapse into one
    numbered sentinel in the input, and the target spells each span
    as its sentinel followed by the dropped tokens, terminated by one
    final sentinel — exactly the (inputs, targets) pair the span-
    corruption loss consumes. Complements the FIM transform
    (``x0_fim_transform``): infilling reorders, denoising deletes.

    Determinism: the coin is ``md5('t5:<id>:<pos>')`` (the library's
    cross-engine convention), so masks, span numbering, and both
    output strings replay bit-for-bit in SQL. A document with no
    masked token keeps its text and targets the bare terminator
    ``<X0>``.

    Scale shape: per-document windows only (gaps-and-islands for the
    span grouping — every window partitions by the document id, no
    global ordering), then two id-keyed rollups; no UDF, no driver
    loop.

    Returns (id, n_tokens, n_masked, n_spans, noise_frac, input_text,
    target_text), one row per document."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.functions.text import ws_tokens

    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    h = F.md5(
        F.concat(
            F.lit("t5:"),
            F.col("id").cast("string"),
            F.lit(":"),
            F.col("pos").cast("string"),
        )
    )
    coin = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 100
    toks = toks.withColumn("masked", coin < F.lit(noise_pct))
    # gaps-and-islands: pos - row_number among masked rows is constant
    # per consecutive run and nondecreasing, so dense_rank numbers the
    # spans 0..k-1 in document order
    w_run = W.partitionBy("id", "masked").orderBy("pos")
    w_isl = W.partitionBy("id").orderBy("island")
    w_pos = W.partitionBy("id", "masked", "island").orderBy("pos")
    marked = toks.withColumn(
        "island", F.col("pos") - F.row_number().over(w_run)
    )
    masked_rows = (
        marked.filter("masked")
        .withColumn("span_idx", F.dense_rank().over(w_isl) - 1)
        .withColumn("first_in_span", F.row_number().over(w_pos) == 1)
    )
    sent = F.concat(F.lit("<X"), F.col("span_idx").cast("string"), F.lit(">"))
    in_pieces = marked.filter(~F.col("masked")).select(
        "id", "pos", F.col("tok").alias("piece")
    ).unionByName(
        masked_rows.filter("first_in_span").select(
            "id", "pos", sent.alias("piece")
        )
    )
    tgt_pieces = masked_rows.select(
        "id",
        "pos",
        F.when(F.col("first_in_span"), F.concat(sent, F.lit(" "), F.col("tok")))
        .otherwise(F.col("tok"))
        .alias("piece"),
    )

    def joined(pieces: DataFrame, out: str) -> DataFrame:
        return pieces.groupBy("id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                    lambda s: s.getField("piece"),
                ),
                " ",
            ).alias(out)
        )

    stats = marked.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("masked").cast("long")).cast("long").alias("n_masked"),
    )
    spans = masked_rows.groupBy("id").agg(
        F.max("span_idx").cast("long").alias("__max_span")
    )
    return (
        stats.join(joined(in_pieces, "input_text"), "id", "left")
        .join(joined(tgt_pieces, "__tgt"), "id", "left")
        .join(spans, "id", "left")
        .select(
            "id",
            "n_tokens",
            "n_masked",
            (F.coalesce("__max_span", F.lit(-1)) + 1).cast("long").alias(
                "n_spans"
            ),
            F.round(
                F.col("n_masked").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("noise_frac"),
            F.coalesce("input_text", F.lit("")).alias("input_text"),
            F.concat(
                F.when(
                    F.col("__tgt").isNull() | (F.col("__tgt") == ""),
                    F.lit(""),
                ).otherwise(F.concat(F.col("__tgt"), F.lit(" "))),
                F.lit("<X"),
                (F.coalesce("__max_span", F.lit(-1)) + 1).cast("string"),
                F.lit(">"),
            ).alias("target_text"),
        )
    )
