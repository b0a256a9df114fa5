"""Registry family ``s05_text`` — split from the monolithic
suite.py (round 8); registration order preserved via the
package ``__init__`` import sequence."""

from __future__ import annotations

# ruff: noqa: E501
from vectordb_migrator_spark.suite._shared import (
    DataFrame,
    F,
    LANG_PRIORITY,
    LANG_STOPWORDS,
    ORACLES,
    SparkSession,
    W,
    _t,
    lang_id,
    md5_fingerprint,
    punct_ratio,
    query,
    rolling_fingerprint,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
)



# =====================================================================
# X5 — text analysis
# =====================================================================

_SW_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]"
    for lang, ws in LANG_STOPWORDS.items()
}

_LANG_SCORE_SQL = {
    lang: (
        f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        f"t -> list_contains({_SW_SQL[lang]}, t)))"
    )
    for lang in LANG_STOPWORDS
}


@query(
    "x5_text_quality",
    rf"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars_calc,
           len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT AS tok_ws,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::BIGINT
             AS tok_bpe,
           round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE /
                 length(text)::DOUBLE, 6) AS punct_r,
           round({_LANG_SCORE_SQL['en']}::DOUBLE /
                 len(string_split_regex(lower(trim(text)), '\s+'))::DOUBLE, 6)
             AS stop_r
    FROM documents ORDER BY doc_id
    """,
)
def x5_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — quality metrics: lengths, token counts (whitespace +
    BPE-ish regex), punctuation ratio, stopword ratio. All codegen."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        token_count_ws("text").cast("long").alias("tok_ws"),
        token_count_bpe("text").cast("long").alias("tok_bpe"),
        F.round(punct_ratio("text"), 6).alias("punct_r"),
        F.round(stopword_ratio("text"), 6).alias("stop_r"),
    ).orderBy("doc_id")


def _langid_case_sql() -> str:
    """The stopword-argmax language-ID CASE expression (DuckDB), shared
    by every oracle that needs the predicted language."""
    s = {lang: _LANG_SCORE_SQL[lang] for lang in LANG_PRIORITY}
    cases = []
    for i, lang in enumerate(LANG_PRIORITY):
        later = [s[o] for o in LANG_PRIORITY[i + 1 :]]
        conds = [f"{s[lang]} > 0"] + [f"{s[lang]} >= {o}" for o in later] + [
            f"{s[lang]} > {s[o]}" for o in LANG_PRIORITY[:i]
        ]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


def _langid_sql() -> str:
    return (
        f"SELECT doc_id, {_langid_case_sql()} AS lang_pred "
        "FROM documents ORDER BY doc_id"
    )


@query("x5_langid", None)  # oracle attached below (computed string)
def x5_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — stopword-hit language ID with deterministic priority
    arg-max."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", lang_id("text").alias("lang_pred"))
        .orderBy("doc_id")
    )


ORACLES["x5_langid"] = _langid_sql()


@query("x5_langid_confusion", None)  # oracle attached below (computed)
def x5_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — language-ID confusion matrix (round 5): predicted language
    (the stopword argmax) against the corpus's ground-truth ``lang``
    column, with per-cell counts and per-truth-row recall — the
    evaluation every heuristic classifier in the pipeline owes its
    users (the langid feeds the balanced-mixture axis; its error
    profile IS the mixture's error profile). One map-side-combinable
    (lang, lang_pred) count; recall joins the tiny per-lang totals
    back broadcast."""
    from vectordb_migrator_spark.functions.text import lang_id

    d = _t(spark, sf_dir, "documents").select(
        "lang", lang_id("text").alias("lang_pred")
    )
    cells = d.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            F.round(F.col("n") / F.col("n_true"), 6).alias("frac_of_truth"),
        )
        .orderBy("lang", "lang_pred")
    )


def _langid_confusion_sql() -> str:
    return f"""
    WITH p AS (
      SELECT lang, {_langid_case_sql()} AS lang_pred FROM documents
    ),
    cells AS (
      SELECT lang, lang_pred, count(*)::BIGINT AS n
      FROM p GROUP BY lang, lang_pred
    ),
    t AS (SELECT lang, count(*) AS n_true FROM p GROUP BY lang)
    SELECT c.lang, c.lang_pred, c.n,
           round(c.n / t.n_true, 6) AS frac_of_truth
    FROM cells c JOIN t USING (lang)
    ORDER BY lang, lang_pred
    """


ORACLES["x5_langid_confusion"] = _langid_confusion_sql()


@query(
    "x5_sentence_stats",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_transform(string_split_regex(text, '[.!?]+'),
                              x -> trim(x)),
               x -> x != '') AS sents
      FROM documents
    )
    SELECT doc_id,
           len(sents)::BIGINT AS n_sentences,
           CASE WHEN len(sents) = 0 THEN 0.0 ELSE
             round(list_sum(list_transform(sents,
               x -> len(string_split_regex(x, '\s+'))))::DOUBLE
               / len(sents), 6) END AS mean_sent_words,
           CASE WHEN len(sents) = 0 THEN 0::BIGINT ELSE
             list_max(list_transform(sents,
               x -> len(string_split_regex(x, '\s+'))))::BIGINT END
             AS max_sent_words
    FROM s ORDER BY doc_id
    """,
)
def x5_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — sentence segmentation stats (round 5): sentences split on
    terminal punctuation runs, per-doc counts and mean/max sentence
    length in words — the readability/structure signal the C4 line
    rules approximate at line level (a 400-word "sentence" is a
    scraped table; zero sentences is a fragment). Pure codegen: split,
    trim-filter, two folds; zero shuffles."""
    sents = F.filter(
        F.transform(
            F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )
    n_words = lambda x: F.size(F.split(x, r"\s+"))
    d = _t(spark, sf_dir, "documents").select("doc_id", sents.alias("sents"))
    n = F.size("sents")
    return d.select(
        "doc_id",
        n.cast("long").alias("n_sentences"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.aggregate(
                    F.col("sents"), F.lit(0.0), lambda s, x: s + n_words(x)
                )
                / n,
                6,
            )
        )
        .alias("mean_sent_words"),
        F.when(n == 0, F.lit(0).cast("long"))
        .otherwise(
            F.array_max(F.transform(F.col("sents"), n_words)).cast("long")
        )
        .alias("max_sent_words"),
    ).orderBy("doc_id")


@query(
    "x5_bpe_pair_stats",
    r"""
    WITH w AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    tok AS (SELECT unnest(toks) AS t FROM w),
    pairs AS (
      SELECT substr(t, i, 2) AS pair
      FROM tok, unnest(range(1, length(t))) r(i)
      WHERE length(t) >= 2
    )
    SELECT pair, count(*)::BIGINT AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 30
    """,
)
def x5_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — BPE merge-candidate statistics (round 5): the corpus-wide
    adjacent-character-pair frequencies that drive the FIRST byte-pair
    -encoding merge (Sennrich et al. 2016) — the statistics pass a
    tokenizer trainer runs per iteration (full BPE iterates this with
    the merged vocab; each round is exactly this shape). Pairs form in
    codegen (indexed transform over each token — no positional join);
    ONE map-side-combinable count shuffle + TakeOrdered(30)."""
    from vectordb_migrator_spark.functions.text import ws_tokens

    toks = F.filter(ws_tokens("text"), lambda x: x != "")
    pairs = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("t"))
        .filter(F.length("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("t") - 1),
                    lambda i: F.col("t").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(30)
    )


def _bpe_ctes(n_merges: int = 8) -> str:
    """Shared CTE prefix for the BPE oracles — ``n_merges`` UNROLLED
    iterations ending at ``vocab{n}``/``top{n}``. Per iteration:
    adjacent-pair counts over the (freq, syms) vocab, the
    (n DESC, a, b) deterministic top-1, then the greedy left-to-right
    merge fold replayed as a per-word recursive CTE (state = (word,
    position, accumulated symbols)) — the same scan order as
    ``operators/bpe.py:_merge_fold``. The vocab is Heaps'-law tiny, so
    the recursion is (vocab × word-length) rows per merge; MATERIALIZED
    per-iteration CTEs stop DuckDB's default inlining from expanding
    the unroll exponentially."""
    sql = r"""
    WITH RECURSIVE w AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
      FROM documents
    ), v AS (
      SELECT word, count(*)::BIGINT AS freq
      FROM w WHERE word <> '' GROUP BY word
    ), vocab0 AS MATERIALIZED (
      SELECT word AS wid, freq, string_split(word, '') AS syms FROM v
    )"""
    for k in range(1, n_merges + 1):
        p = f"vocab{k - 1}"
        sql += f""", pairs{k} AS (
      SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq)::BIGINT AS n
      FROM {p}, unnest(range(1, len(syms))) u(i)
      GROUP BY 1, 2
    ), top{k} AS MATERIALIZED (
      SELECT a, b, n FROM pairs{k} ORDER BY n DESC, a, b LIMIT 1
    ), fold{k} AS (
      SELECT wid, freq, syms, 1 AS i, []::VARCHAR[] AS acc FROM {p}
      UNION ALL
      SELECT wid, freq, syms, i + 1,
        CASE WHEN len(acc) > 0
                  AND acc[-1] = (SELECT a FROM top{k})
                  AND syms[i] = (SELECT b FROM top{k})
          THEN list_slice(acc, 1, len(acc) - 1)
               || [(SELECT a FROM top{k}) || (SELECT b FROM top{k})]
          ELSE acc || [syms[i]] END
      FROM fold{k} WHERE i <= len(syms)
    ), vocab{k} AS MATERIALIZED (
      SELECT wid, freq, acc AS syms FROM fold{k} WHERE i = len(syms) + 1
    )"""
    return sql


def _bpe_train_sql(n_merges: int = 8) -> str:
    """Oracle for x5_bpe_train: the learned merge table itself."""
    steps = "\n    UNION ALL ".join(
        f"SELECT {k} AS step, a AS lhs, b AS rhs, n FROM top{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        _bpe_ctes(n_merges)
        + f"""
    SELECT step::BIGINT AS step, lhs, rhs, n FROM ({steps})
    ORDER BY step"""
    )


def _tokenizer_fit_apply_sql(n_merges: int = 8) -> str:
    """Oracle for x0_tokenizer_fit_apply: the final ``vocab{n}`` IS
    the fitted tokenizer (word → merged symbols), so applying it is a
    word→token-count join, and the per-source stats roll up from
    that."""
    return (
        _bpe_ctes(n_merges)
        + f""", wmap AS MATERIALIZED (
      SELECT wid AS word, len(syms)::BIGINT AS nb FROM vocab{n_merges}
    ), docw AS (
      SELECT doc_id, source,
             unnest(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> '')) AS word
      FROM documents
    )
    SELECT d.source,
           count(DISTINCT d.doc_id)::BIGINT AS docs,
           sum(m.nb)::BIGINT AS bpe_tokens,
           count(*)::BIGINT AS ws_tokens,
           round(sum(m.nb)::DOUBLE / count(*), 6) AS tokens_per_word
    FROM docw d JOIN wmap m USING (word)
    GROUP BY d.source ORDER BY d.source"""
    )


@query("x5_bpe_train", _bpe_train_sql(8))
def x5_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — the FULL distributed BPE merge-learning loop (round 7;
    ``x5_bpe_pair_stats`` is one round of its statistics): 8 merges
    over the (word, freq) vocabulary, each round ONE map-side-combined
    pair-count shuffle + an O(1) top-1 collect + a codegen fold that
    rewrites word symbol arrays in place — the corpus is scanned once,
    every iteration runs on the Heaps'-law-small vocab frame
    (operators/bpe.py:bpe_learn). Deterministic by the (n DESC, a, b)
    tie-break, so the learned merge table is a pure function of the
    corpus and carries an exact unrolled-SQL oracle (one recursive
    fold CTE per merge — the PageRank-oracle pattern for iterative
    algorithms). Output = the model-sized merge table itself."""
    from vectordb_migrator_spark.operators.bpe import bpe_learn

    merges = bpe_learn(
        _t(spark, sf_dir, "documents"), "text", n_merges=8, min_count=2
    )
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "step long, lhs string, rhs string, n long",
    ).orderBy("step")


@query(
    "x5_readability",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks)::BIGINT AS words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS sentences,
             coalesce(list_sum(list_transform(toks, w ->
               greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
               0)::BIGINT AS syllables
      FROM t
    ), s AS (
      SELECT doc_id, words, sentences, syllables,
             CASE WHEN words > 0 THEN
               round(206.835 - 1.015 * words / sentences
                     - 84.6 * syllables / words, 4) END AS flesch
      FROM m
    )
    SELECT doc_id, words, sentences, syllables, flesch,
           CASE WHEN flesch IS NULL THEN 'empty'
                WHEN flesch >= 90 THEN 'very_easy'
                WHEN flesch >= 70 THEN 'easy'
                WHEN flesch >= 50 THEN 'medium'
                WHEN flesch >= 30 THEN 'hard'
                ELSE 'very_hard' END AS band
    FROM s ORDER BY doc_id
    """,
)
def x5_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — Flesch reading-ease readability (round 7): the classic
    curation quality feature next to the Gopher rules — word/sentence/
    syllable counts from deterministic codegen heuristics (sentence =
    ``[.!?]`` runs floored at 1; syllable = vowel-group runs per word
    floored at 1), the 206.835 − 1.015·(W/S) − 84.6·(Syl/W) score
    rounded to 4, and a five-band difficulty label computed off the
    rounded score. One projection, no shuffle, full oracle
    (functions/text.py:flesch_reading_ease)."""
    from vectordb_migrator_spark.functions.text import flesch_reading_ease

    r = F.col("r")
    fl = F.col("r.flesch")
    band = (
        F.when(fl.isNull(), "empty")
        .when(fl >= 90, "very_easy")
        .when(fl >= 70, "easy")
        .when(fl >= 50, "medium")
        .when(fl >= 30, "hard")
        .otherwise("very_hard")
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", flesch_reading_ease("text").alias("r"))
        .select(
            "doc_id",
            r.getField("words").alias("words"),
            r.getField("sentences").alias("sentences"),
            r.getField("syllables").alias("syllables"),
            fl.alias("flesch"),
            band.alias("band"),
        )
        .orderBy("doc_id")
    )


@query("x0_tokenizer_fit_apply", _tokenizer_fit_apply_sql(8))
def x0_tokenizer_fit_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — the tokenizer LIFECYCLE composed end to end (round 7):
    fit the 8-merge BPE table on the corpus (``bpe_learn``), apply it
    to every document (``bpe_segment`` — the merges replayed in
    learned order as codegen folds), and report per-source token
    economics: docs, BPE tokens, whitespace words, and tokens-per-word
    (the compression ratio that prices a tokenizer change across
    sources). The apply is the SCALE path: the fitted tokenizer
    becomes a (word → token-count) lookup (``bpe_vocab_map`` — each
    DISTINCT word folded once), and the corpus side is explode +
    broadcast join + aggregate; the merge folds never touch the
    corpus. The oracle applies the same fitted vocab as a word join
    off the unrolled-merge CTEs. Docs whose text has no tokens carry
    no words and drop from both sides identically."""
    from vectordb_migrator_spark.functions.text import ws_tokens
    from vectordb_migrator_spark.operators.bpe import (
        bpe_learn,
        bpe_vocab_map,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_learn(docs, "text", n_merges=8, min_count=2)
    wmap = bpe_vocab_map(docs, merges)
    words = docs.select(
        "source",
        "doc_id",
        F.explode(F.filter(ws_tokens("text"), lambda x: x != "")).alias(
            "word"
        ),
    )
    n_docs = (
        words.select("source", "doc_id")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("docs"))
    )
    stats = (
        words.join(F.broadcast(wmap), "word")
        .groupBy("source")
        .agg(
            F.sum("n_tokens").cast("long").alias("bpe_tokens"),
            F.count(F.lit(1)).cast("long").alias("ws_tokens"),
            F.round(F.sum("n_tokens") / F.count(F.lit(1)), 6).alias(
                "tokens_per_word"
            ),
        )
    )
    return n_docs.join(stats, "source").orderBy("source")


@query(
    "x5_fingerprint",
    r"""
    SELECT doc_id,
           list_reduce(list_prepend(0::BIGINT,
                         [ascii(c)::BIGINT for c in string_split(text, '')]),
                       (s, x) -> (s * 31 + x) % 1000000007) AS roll_fp,
           substr(md5(text), 1, 16) AS md5_fp
    FROM documents ORDER BY doc_id
    """,
)
def x5_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — document fingerprints: polynomial rolling hash (codegen
    fold) + md5 prefix."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        rolling_fingerprint("text").alias("roll_fp"),
        md5_fingerprint("text").alias("md5_fp"),
    ).orderBy("doc_id")


@query(
    "x5_zipf_fit",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      FROM documents
    ), wc AS (
      SELECT w, count(*)::DOUBLE AS c FROM toks WHERE w <> '' GROUP BY w
    ), rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM wc
      QUALIFY r <= 200
    ), pts AS (
      SELECT ln(r) AS x, ln(c) AS y FROM rk
    ), s AS (
      SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pts
    )
    SELECT n::BIGINT AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def x5_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — Zipf's-law fit of the corpus rank-frequency curve (round
    7): least-squares slope of ln(freq) vs ln(rank) over the top-200
    word ranks, with intercept and R². Natural text sits near slope
    −1 with high R²; a corpus whose slope drifts (template spam
    flattens it, boilerplate-stripped dedup steepens it) or whose fit
    degrades is the one whose tokenizer/mixture assumptions need a
    second look — the distribution-shape twin of the lexical-diversity
    and surprisal diagnostics. Scale shape: ONE token-count aggregate
    over the corpus (map-side combined), then top-200 by
    (freq desc, word) via TakeOrderedAndProject — no global rank
    window over the vocabulary — and the regression runs in closed
    form on 200 points (ulp-level libm drift in ln() washes out at
    round-6 after the 200-term sums). Ties at the rank boundary break
    by word, so both engines pick the identical point set."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("w")
    )
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    top = wc.orderBy(F.desc("c"), "w").limit(200)
    rk = top.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("c"), "w"))
    )
    pts = rk.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log("c").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round(num / dxx, 6).alias("slope"),
        F.round((F.col("sy") - num / dxx * F.col("sx")) / F.col("n"), 6)
        .alias("intercept"),
        F.round(num * num / (dxx * dyy), 6).alias("r2"),
    )
