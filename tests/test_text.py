"""Text analysis tests (X5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.text import (
    lang_id,
    md5_fingerprint,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    token_count_bpe,
    token_count_ws,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world 42!",)], ["t"])
    row = df.select(
        token_count_ws("t").alias("ws"), token_count_bpe("t").alias("bpe")
    ).first()
    assert row["ws"] == 3
    # Hello , world 42 ! → 5 BPE-ish tokens
    assert row["bpe"] == 5


def test_punct_ratio(spark):
    df = spark.createDataFrame([("ab.,",), ("abcd",)], ["t"])
    vals = [r[0] for r in df.select(punct_ratio("t")).collect()]
    assert vals == [0.5, 0.0]


def test_lang_id_clear_cases(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in that house",),
            ("der hund und die katze ist nicht ein",),
            ("el perro y la casa que es un gato en",),
            ("zzz qqq xxx",),
        ],
        ["t"],
    )
    vals = [r[0] for r in df.select(lang_id("t")).collect()]
    assert vals == ["en", "de", "es", "und"]


def test_fingerprints_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], ["t"])
    rolls = [r[0] for r in df.select(rolling_fingerprint("t")).collect()]
    assert rolls[0] == rolls[1] == 96354  # = Java-style 31-poly hash of "abc"
    assert rolls[2] != rolls[0]
    md5s = [r[0] for r in df.select(md5_fingerprint("t")).collect()]
    assert md5s[0] == "900150983cd24fb0"


def test_quality_score_range(documents):
    vals = [r[0] for r in documents.select(quality_score("text")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_text_ops_stay_jvm_side(documents):
    plan = (
        documents.select(
            token_count_ws("text"), punct_ratio("text"), rolling_fingerprint("text")
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_remove_boilerplate_lines(spark):
    from vectordb_migrator_spark.operators.cleaning import (
        remove_boilerplate_lines,
    )

    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\nCOOKIE BANNER"),
            (2, "COOKIE BANNER\nreal content two"),
            (3, "COOKIE BANNER\nreal content three"),
            (4, "COOKIE BANNER"),  # all-boilerplate doc survives empty
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, max_df_frac=0.5).collect()
    }
    assert len(out) == 4
    assert out[1]["cleaned"] == "real content one"
    # repeated within one doc counts once for df, both copies removed
    assert out[1]["n_removed_lines"] == 2
    assert out[2]["cleaned"] == "real content two"
    assert out[4]["cleaned"] == ""
    assert out[4]["n_kept_lines"] == 0 and out[4]["n_removed_lines"] == 1


def test_remove_boilerplate_threshold_boundary(spark):
    """A line at exactly max_df_frac is NOT removed (strict >)."""
    from vectordb_migrator_spark.operators.cleaning import (
        remove_boilerplate_lines,
    )

    df = spark.createDataFrame(
        [(1, "shared\na1"), (2, "shared\na2"), (3, "b3\nb3x"), (4, "b4")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["cleaned"]
        for r in remove_boilerplate_lines(df, max_df_frac=0.5).collect()
    }
    assert out[1] == "shared\na1"  # df=2/4 == 0.5 → kept
    out2 = {
        r["doc_id"]: r["cleaned"]
        for r in remove_boilerplate_lines(df, max_df_frac=0.4).collect()
    }
    assert out2[1] == "a1"  # df=0.5 > 0.4 → removed


def test_bm25_topk_basic(spark):
    from vectordb_migrator_spark.operators.ranking import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine"),
            (3, "unrelated words entirely here"),
            (4, "engine engine engine engine"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, ["spark"], k=3).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids[0] == 1  # highest tf wins
    assert set(ids) == {1, 2}  # docs without the term score 0 → dropped
    assert rows[0]["score"] > rows[1]["score"] > 0

    import pytest

    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_bm25_topk_plan_shape(documents):
    """Scale guard: stats side is a broadcast (1-row) join and the
    top-k is TakeOrderedAndProject, not a global sort."""
    from vectordb_migrator_spark.operators.ranking import bm25_topk

    plan = (
        bm25_topk(documents, ["vector", "hash"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ngram_contamination(spark):
    from vectordb_migrator_spark.operators.cleaning import ngram_contamination

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),
         (2, "completely different training text")],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(10, "the quick brown fox jumps high"),   # verbatim leak
         (11, "the quick brown cat sits low"),     # partial overlap
         (12, "nothing in common whatsoever here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ngram_contamination(
        train, test, n=3, threshold=0.5
    ).collect()}
    assert out[10]["contamination"] == 1.0 and out[10]["is_contaminated"]
    # only "the quick brown" of doc 11's four 3-grams is in train
    assert out[11]["n_grams"] == 4 and out[11]["n_contaminated"] == 1
    assert not out[11]["is_contaminated"]
    assert out[12]["n_contaminated"] == 0 and not out[12]["is_contaminated"]
    # max_df=1 drops no gram here (all train grams unique) → unchanged
    capped = {r["doc_id"]: r["contamination"] for r in ngram_contamination(
        train, test, n=3, threshold=0.5, max_df=1
    ).collect()}
    assert capped[10] == 1.0 and capped[12] == 0.0


def test_unigram_surprisal_matches_python(spark):
    """Differential vs a plain-Python unigram LM, with a vocab cap
    small enough that the OOV bucket is actually exercised."""
    import math
    from collections import Counter

    from vectordb_migrator_spark.operators.cleaning import unigram_surprisal

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "zyx qwv zyx zyx"),  # rare tokens → OOV under the cap
        (4, "the the the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vocab_size, alpha = 3, 0.5

    toks = {d: t.lower().split() for d, t in docs}
    counts = Counter(t for ts in toks.values() for t in ts)
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    n_total = sum(counts.values())
    denom = n_total + alpha * (len(vocab) + 1)
    expected = {
        d: (
            round(
                sum(
                    -math.log2((vocab.get(t, 0) + alpha) / denom) for t in ts
                )
                / len(ts),
                6,
            ),
            len(ts),
        )
        for d, ts in toks.items()
    }
    got = {
        r["doc_id"]: (r["surprisal"], r["n_tok"])
        for r in unigram_surprisal(df, vocab_size=vocab_size, alpha=alpha).collect()
    }
    assert got == expected
    # the all-common-token doc is the least surprising; the OOV bucket
    # is exercised (cat/on/mat/dog/qwv fall outside the top-3 vocab)
    assert min(got, key=lambda d: got[d][0]) == 4
    assert got[1][0] > got[2][0] > got[4][0]


def test_unigram_surprisal_tokenizes_at_most_twice_per_pass(spark):
    """Corpus totals must derive from the token-count table, not a
    fresh explode of the corpus: the plan may tokenize for the score
    pass and the statistics pass, but a third Generate (the regression
    this pins) means the totals re-scan the corpus."""
    from vectordb_migrator_spark.operators.cleaning import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    plan = (
        unigram_surprisal(df, vocab_size=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate") <= 3  # score + (vocab/stats shared subtree)


def test_normalize_for_dedup(spark):
    from vectordb_migrator_spark.functions.text import normalize_for_dedup

    df = spark.createDataFrame(
        [("  Hello,   WORLD!! (v2) ",), ("a-b_c",), ("",)], ["t"]
    )
    vals = [r[0] for r in df.select(normalize_for_dedup("t")).collect()]
    assert vals == ["hello world v2", "a b c", ""]
    # normalized twins now shingle identically
    a = spark.createDataFrame(
        [(1, "The Quick, Brown Fox!"), (2, "the quick brown fox")],
        "doc_id long, text string",
    )
    from vectordb_migrator_spark.operators.dedup import ngram_jaccard_pairs

    norm = a.select("doc_id", normalize_for_dedup("text").alias("text"))
    pairs = ngram_jaccard_pairs(norm, n=3, threshold=0.99).collect()
    assert [(p["id_a"], p["id_b"], p["jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_corpus_stats_semantics(spark):
    """The one-row health report counts emptiness, exact-dup mass,
    token totals, and PII incidence exactly."""
    from vectordb_migrator_spark.operators.cleaning import corpus_stats

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),          # exact dup of 1
            (3, "   "),                        # whitespace-only → empty
            (4, "mail me at a.b@example.org"),  # PII doc
            (5, "five tokens in this doc"),
        ],
        "doc_id long, text string",
    )
    r = corpus_stats(df).collect()[0]
    assert r["n_docs"] == 5
    assert r["n_empty"] == 1
    assert r["n_exact_dups"] == 1
    assert r["n_pii_docs"] == 1
    # tokens: 3 + 3 + 1 (empty-string token) + 4 + 5
    assert r["tok_total"] == 16
    assert r["tok_mean"] == round(16 / 5, 6)
    assert r["tok_p90"] == 4.6  # interpolated over [1, 3, 3, 4, 5]


def test_corpus_stats_empty_corpus(spark):
    """An empty corpus yields one well-typed row of zeros/nulls
    instead of crashing — the report stays safe as an ingest gate."""
    from vectordb_migrator_spark.operators.cleaning import corpus_stats

    df = spark.createDataFrame([], "doc_id long, text string")
    r = corpus_stats(df).collect()[0]
    assert r["n_docs"] == 0 and r["n_empty"] == 0
    assert r["tok_total"] == 0 and r["n_pii_docs"] == 0
    assert r["tok_p50"] is None and r["tok_mean"] is None


def test_bigram_surprisal_orders_word_salad_above_prose(spark):
    """Documents whose bigrams repeat corpus-common transitions score
    LOW; shuffled word-salad over the same vocabulary scores HIGH —
    the transition sensitivity a unigram model cannot have. Docs with
    <2 tokens produce no row."""
    from vectordb_migrator_spark.operators.cleaning import bigram_surprisal

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(10)]  # corpus dominated by one phrasing
    rows.append((100, "mat the on sat cat the"))  # same words, alien order
    rows.append((101, "x"))  # single token — no bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_surprisal(df, model_size=100).collect()}
    assert 101 not in out
    assert out[100]["surprisal"] > out[0]["surprisal"]
    assert out[0]["n_big"] == 5


def test_remove_repeated_spans_keep_first(spark):
    """A span shared across docs survives only in the smallest-id doc;
    unique text is untouched; docs shorter than n pass through; a doc
    that is ENTIRELY a repeated span comes back empty but present."""
    from vectordb_migrator_spark.operators.cleaning import remove_repeated_spans

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma unique one here"),
            (2, "intro words alpha beta gamma outro"),   # span removed
            (3, "alpha beta gamma"),                     # fully covered
            (4, "tiny doc"),                             # < n tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_repeated_spans(df, n=3).collect()}
    assert out[1]["clean_text"] == "alpha beta gamma unique one here"
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "intro words outro"
    assert out[2]["n_removed"] == 3
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 3
    assert out[4]["clean_text"] == "tiny doc" and out[4]["n_removed"] == 0


def test_feature_hash_vector_counts_tokens(spark):
    """Dims sum to the token count; identical texts get identical
    vectors; whitespace-only text maps to the zero vector."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.functions.text import feature_hash_vector

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "a b c a"), (3, "   ")], "id long, t string"
    )
    rows = {r["id"]: r["v"] for r in df.select(
        "id", feature_hash_vector("t", dim=8).alias("v")).collect()}
    assert sum(rows[1]) == 4.0
    assert rows[1] == rows[2]
    assert sum(rows[3]) == 0.0


def test_keywords_prefer_rare_tokens(spark):
    """A token unique to one document outranks corpus-wide common
    tokens in that document's keyword list."""
    from vectordb_migrator_spark.suite import QUERIES  # noqa: F401 — pattern
    from pyspark.sql import functions as F
    from vectordb_migrator_spark.functions.text import ws_tokens

    # replicate the x5_keywords shape on a toy frame
    df = spark.createDataFrame(
        [(1, "common words here plus zyzzyva"),
         (2, "common words here again"),
         (3, "common words here too")],
        "doc_id long, text string",
    )
    toks = df.select("doc_id", F.explode(ws_tokens("text")).alias("tok")).filter(
        F.col("tok") != ""
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    dfreq = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("dfv"))
    nn = toks.agg(F.countDistinct("doc_id").cast("double").alias("n"))
    scored = tf.join(dfreq, "tok").crossJoin(F.broadcast(nn)).select(
        "doc_id", "tok",
        (F.col("c") * (F.log((F.col("n") + 1) / (F.col("dfv") + 1)) + 1)).alias("s"),
    )
    top = (
        scored.filter(F.col("doc_id") == 1)
        .orderBy(F.desc("s"))
        .first()
    )
    assert top["tok"] == "zyzzyva"


def test_gopher_rules_fire_individually(spark):
    """Each Gopher rule rejects its crafted offender and the clean doc
    passes all five (word count, mean word length, symbol ratio,
    alpha ratio, stopword hits)."""
    from vectordb_migrator_spark.operators.cleaning import gopher_rules

    clean = "the quick brown fox jumps over that lazy dog and " * 8  # 80 words
    docs = [
        (1, clean),
        (2, "the and of to short"),  # < 50 words
        (3, ("a " * 80) + "the and"),  # mean word length < 3
        (4, ("the" + "#" * 3 + " ") * 60),  # symbol ratio > 0.1
        (5, ("123 456 " * 30) + "the and"),  # alpha ratio < 0.8
        (6, "zebra quagga okapi lemur " * 20),  # no canonical stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["kept"] is True
    assert out[2]["kept"] is False and out[2]["n_word"] < 50
    assert out[3]["kept"] is False and out[3]["mean_word_len"] < 3
    assert out[4]["kept"] is False and out[4]["symbol_ratio"] > 0.1
    assert out[5]["kept"] is False and out[5]["alpha_ratio"] < 0.8
    assert out[6]["kept"] is False and out[6]["stop_hits"] < 2


def test_rm3_expansion_model_properties(spark):
    """RM3 sanity on a controlled corpus: query terms keep weight via
    the interpolation, strongly co-occurring terms enter the
    expansion, absent terms don't, and weights match a NumPy replica
    of the relevance model."""
    import pytest

    from vectordb_migrator_spark.operators.ranking import (
        bm25_topk,
        rm3_expansion,
    )

    rows = [
        (1, "spark shuffle join broadcast"),
        (2, "spark shuffle partition skew"),
        (3, "spark join broadcast hint"),
        (4, "cooking pasta recipe tomato"),
        (5, "cooking soup recipe onion"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rm3_expansion(
        df, ["spark", "join"], fb_docs=3, fb_terms=10, lam=0.5
    ).collect()
    w = {r["term"]: r["weight"] for r in out}
    # feedback docs are 1-3; cooking vocabulary must not appear
    assert "cooking" not in w and "recipe" not in w
    # query terms carry the lambda floor; co-occurring terms present
    assert w["spark"] > w["shuffle"] > 0
    assert "broadcast" in w

    # replica: fb = bm25 top-3, P(t|R) = sum score/ws * tf/dl
    fb = {r["doc_id"]: r["score"]
          for r in bm25_topk(df, ["spark", "join"], k=3).collect()}
    ws = sum(fb.values())
    texts = {i: t.split() for i, t in rows}
    p_rel: dict = {}
    for d, s in fb.items():
        toks = texts[d]
        for t in set(toks):
            p_rel[t] = p_rel.get(t, 0.0) + round(
                s / ws * toks.count(t) / len(toks), 9
            )
    for t, weight in w.items():
        want = 0.5 * (0.5 if t in ("spark", "join") else 0.0) \
            + 0.5 * p_rel.get(t, 0.0)
        assert weight == pytest.approx(want, abs=1e-6), t


def test_flesch_reading_ease_known_values(spark):
    """Flesch on controlled sentences matches hand-computed values;
    no-vowel words floor at one syllable; empty docs yield NULL."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.functions.text import flesch_reading_ease

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),   # 6 words, 2 sents
            (2, "xyz qrst"),                    # no vowels -> 2 syllables
            (3, "   "),
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: r["r"].asDict()
        for r in df.select(
            "id", flesch_reading_ease("text").alias("r")
        ).collect()
    }
    r1 = rows[1]
    assert (r1["words"], r1["sentences"]) == (6, 2)
    # the/cat/sat/the/dog/ran = 1 vowel group each
    assert r1["syllables"] == 6
    assert r1["flesch"] == round(206.835 - 1.015 * 3 - 84.6 * 1.0, 4)
    assert rows[2] == {
        "words": 2, "sentences": 1, "syllables": 2,
        "flesch": round(206.835 - 1.015 * 2 - 84.6 * 1.0, 4),
    }
    assert rows[3]["words"] == 0 and rows[3]["flesch"] is None


def test_phrase_search_consecutive_tokens(spark):
    """Phrase matching counts only CONSECUTIVE token runs (case-folded),
    counts overlapping occurrences, handles 3-word phrases and
    too-short documents, and rejects empty phrases."""
    import pytest

    from vectordb_migrator_spark.operators.ranking import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the data the data pipeline"),
            (2, "data the big table"),
            (3, "THE Data lake"),
            (4, "the"),
            (5, "big data big data big data"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["phrase"], r["doc_id"]): r["n_hits"]
        for r in phrase_search(
            docs, ["the data", "big data big"]
        ).collect()
    }
    assert got[("the data", 1)] == 2
    assert ("the data", 2) not in got  # non-adjacent
    assert got[("the data", 3)] == 1  # case-folded
    assert ("the data", 4) not in got  # doc shorter than phrase
    assert got[("big data big", 5)] == 2  # overlapping starts

    with pytest.raises(ValueError, match="phrase"):
        phrase_search(docs, ["  "])


def test_feature_hash_vector_arrow_twin_parity(spark):
    """The r13 Arrow twin must reproduce the Catalyst HOF fold's
    count vector exactly — including NULL text, empty/whitespace-only
    strings, unicode case edges, and the ASCII-only Java \\s class."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.functions.text import (
        feature_hash_vector,
        feature_hash_vector_arrow,
    )

    texts = [
        None,
        "",
        "   ",
        "\t\n\x0b\f\r",
        "Hello hello WORLD world world",
        "a b  c\td\ne",
        " leading and trailing  ",
        "Straße İstanbul ǅungla ﬁn",        # unicode lower edges
        "emoji 🎉 mixed ＴＥＸＴ",
        "non breaking space",           # U+00A0 is NOT Java \s
        "ideographic　space",            # U+3000 is NOT Java \s
        "x" * 5000,
        "tok " * 200,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    got = {
        r["id"]: (list(r["a"]) if r["a"] is not None else None,
                  list(r["b"]) if r["b"] is not None else None)
        for r in df.select(
            "id",
            feature_hash_vector("t", dim=16).alias("a"),
            feature_hash_vector_arrow("t", dim=16).alias("b"),
        ).collect()
    }
    for i, (a, b) in got.items():
        assert a == b, f"row {i}: {a} != {b}"
