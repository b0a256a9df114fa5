"""BPE merge learning vs a pure-Python reference implementation."""

from collections import Counter

from vectordb_migrator_spark.operators.bpe import (
    bpe_learn,
    bpe_segment,
    bpe_word_freqs,
)

CORPUS = [
    "low low low lower lower newest newest newest newest widest",
    "low newest widest widest newest lowest",
    "the the the low newest",
]


def _py_bpe(texts, n_merges, min_count=2):
    freqs = Counter(w for t in texts for w in t.split())
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # max count, lexicographic tie-break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((a, b, n))
        for w in vocab:
            s, out = vocab[w], []
            for sym in s:
                if out and out[-1] == a and sym == b:
                    out[-1] = a + b
                else:
                    out.append(sym)
            vocab[w] = out
    return merges, vocab


def test_bpe_learn_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe_learn(df, n_merges=10)
    want, _ = _py_bpe(CORPUS, 10)
    assert got == want
    assert len(got) == 10  # corpus supports 10 full merges


def test_bpe_word_freqs(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    freqs = {r["word"]: r["freq"] for r in bpe_word_freqs(df).collect()}
    assert freqs["low"] == 5 and freqs["newest"] == 7 and freqs["the"] == 3


def test_bpe_segment_replays_merges_in_order(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe_learn(df, n_merges=6)
    want, vocab = _py_bpe(CORPUS, 6)
    seg = bpe_segment(df, merges).collect()
    for row in seg:
        toks = row["text"].split()
        expect = [s for w in toks for s in vocab[w]]
        assert row["bpe_tokens"] == expect


def test_bpe_learn_driver_and_distributed_paths_agree(spark):
    """The driver fast path (vocab fits) and the distributed loop
    (driver_threshold=0) are the SAME algorithm — identical merge
    tables, both matching the pure-Python reference."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    fast = bpe_learn(df, n_merges=8)  # vocab ≤ default threshold
    dist = bpe_learn(df, n_merges=8, driver_threshold=0)
    want, _ = _py_bpe(CORPUS, 8)
    assert fast == dist == want


def test_bpe_vocab_map_matches_segment_counts(spark):
    """The lookup-table apply (fold per DISTINCT word + join) must
    count exactly what the per-document segmenter produces."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.bpe import bpe_vocab_map

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe_learn(df, n_merges=6)
    wmap = {r["word"]: r["n_tokens"]
            for r in bpe_vocab_map(df, merges).collect()}
    seg = bpe_segment(df, merges).collect()
    for row in seg:
        want = sum(wmap[w] for w in row["text"].split())
        assert len(row["bpe_tokens"]) == want


def _replay_encode(word, merges):
    """Pure-Python in-learned-order replay — the codegen path's exact
    semantics, as the differential reference for the Arrow kernel."""
    syms = list(word)
    for m in merges:
        a, b = m[0], m[1]
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_rank_priority_encode_agrees_with_ordered_replay_large_table():
    """Round-8 production apply: on a TRAINED table of 1000+ merges,
    the rank-priority apply loop (the GPT-2/tiktoken order the Arrow
    kernel runs) must segment every vocabulary word and a batch of
    unseen words exactly as replaying the table in learned order."""
    import random

    rng = random.Random(8)
    alphabet = "abcdefgh"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(3000)
    ]
    texts = [" ".join(rng.choices(words, k=40)) for _ in range(200)]
    merges, _ = _py_bpe(texts, 1200, min_count=1)
    assert len(merges) >= 1000, "corpus must support a production-sized table"

    from vectordb_migrator_spark.operators.bpe import _rank_priority_encode

    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}
    unseen = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16)))
        for _ in range(500)
    ]
    for w in set(words) | set(unseen):
        assert _rank_priority_encode(w, ranks) == _replay_encode(w, merges), w


def test_rank_priority_encode_agrees_on_random_trained_tables():
    """Property sweep: many tiny random corpora with dense alphabets
    (the regime where merge interactions are most tangled) — trained
    tables must segment identically under both apply orders."""
    import random

    from vectordb_migrator_spark.operators.bpe import _rank_priority_encode

    for seed in range(60):
        rng = random.Random(seed)
        alphabet = "abc"
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            for _ in range(50)
        ]
        texts = [" ".join(rng.choices(words, k=12)) for _ in range(12)]
        merges, _ = _py_bpe(texts, 40, min_count=1)
        ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}
        probes = words + [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for _ in range(50)
        ]
        for w in probes:
            got = _rank_priority_encode(w, ranks)
            want = _replay_encode(w, merges)
            assert got == want, (seed, w, merges)


def test_bpe_segment_arrow_matches_codegen_path(spark):
    """The Arrow kernel and the chained-codegen-fold path are the
    same tokenizer: identical token arrays per document, NULL text
    passes through as NULL, and the physical plan crosses Python
    exactly once (mapInPandas → ArrowEvalPython family, never
    row-at-a-time BatchEvalPython)."""
    from vectordb_migrator_spark.operators.bpe import bpe_segment_arrow

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)] + [(97, ""), (99, None)],
        "doc_id long, text string",
    )
    merges = bpe_learn(df.filter("text IS NOT NULL"), n_merges=8)
    want = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(df, merges).collect()
    }
    arrow = bpe_segment_arrow(df, merges)
    got = {r["doc_id"]: r["bpe_tokens"] for r in arrow.collect()}
    assert got[99] is None
    assert got[97] == []
    for k in want:
        if k != 99:
            assert got[k] == want[k], k
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
