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
