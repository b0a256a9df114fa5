"""BPE tokenizer training — iterative byte-pair-encoding merge
learning (Sennrich et al. 2016) over a distributed corpus.

``x5_bpe_pair_stats`` is ONE round of this loop's statistics; this
module runs the full loop. The Spark-first shape: the corpus is
scanned ONCE into a (word, freq) vocabulary — at 100 TB the vocab is
orders of magnitude smaller than the corpus (Heaps' law), so every
merge iteration is an aggregate over the VOCAB frame, never a corpus
rescan. Each round: adjacent-pair counts weighted by word frequency
(one map-side-combined shuffle of symbol pairs), an O(1) top-1
collect, and a codegen fold that rewrites each word's symbol array in
place (no Python workers anywhere). ``localCheckpoint`` truncates the
per-round lineage exactly as the graph loops do.

The loop is deterministic: ties on pair count break lexicographically,
so the learned merge table is a pure function of the corpus —
differential-tested against a pure-Python replica in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.text import ws_tokens


def bpe_word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary — the one corpus-sized pass."""
    toks = F.filter(ws_tokens(text_col), lambda x: x != "")
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _chars(col: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: col.substr(i, F.lit(1))
    )


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — the
    exact scan order the reference BPE algorithm uses, as one codegen
    fold (no UDF)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_learn_local(
    vocab: list[tuple[int, list[str]]], n_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """The identical merge loop over a collected vocab — same pair
    statistic, same (n DESC, a, b) tie-break, same greedy
    left-to-right fold. Differential-tested against the distributed
    loop (tests/test_bpe.py)."""
    vocab = [(f, list(s)) for f, s in vocab]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for freq, syms in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((a, b, n))
        for idx, (freq, syms) in enumerate(vocab):
            acc: list[str] = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = a + b
                else:
                    acc.append(s)
            vocab[idx] = (freq, acc)
    return merges


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 8,
    min_count: int = 2,
    driver_threshold: int = 100_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)]
    in learned order. Stops early when no pair reaches ``min_count``.

    The corpus-sized pass (word counting) is always distributed; the
    merge LOOP then runs wherever the vocab fits. A vocab of
    ``driver_threshold`` or fewer words (Heaps' law keeps vocabs
    orders of magnitude smaller than corpora — ~1M words for 100 TB
    of text) collects once and iterates driver-side in plain Python:
    8 merges over a bounded model-sized table need no cluster round
    trips. Above the threshold the loop stays distributed — one
    map-side-combined pair-count shuffle + O(1) top-1 collect +
    codegen fold per merge. Both paths are the SAME deterministic
    algorithm (differential-tested), so the learned table is
    path-independent. Set ``driver_threshold=0`` to force the
    distributed loop.

    The returned table is model-sized (the k-means bounded-collect
    contract); apply it with :func:`bpe_segment`."""
    vocab = (
        bpe_word_freqs(df, text_col)
        .select("freq", _chars(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    if vocab.count() <= driver_threshold:
        rows = vocab.collect()
        return _bpe_learn_local(
            [(int(r["freq"]), list(r["syms"])) for r in rows],
            n_merges,
            min_count,
        )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.element_at("syms", (i + 1).cast("int")).alias(
                                "a"
                            ),
                            F.element_at("syms", (i + 2).cast("int")).alias(
                                "b"
                            ),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        vocab = vocab.select(
            "freq", _merge_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table to every document: whitespace
    words → characters → the merges replayed IN LEARNED ORDER (the
    BPE apply contract), flattened back to one token array per doc.
    ``n_merges`` chained folds over word-sized arrays, all codegen —
    fine for diagnostic merge counts; a production tokenizer with
    thousands of merges belongs in an Arrow-batched UDF instead."""
    toks = F.filter(ws_tokens(text_col), lambda x: x != "")
    words = F.transform(toks, lambda w: _chars(w))
    def _applier(a: str, b: str):
        return lambda s: _merge_fold(s, a, b)

    for m in merges:
        words = F.transform(words, _applier(m[0], m[1]))
    return df.withColumn(out_col, F.flatten(words))


def _rank_priority_encode(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Segment one word with the rank-priority apply loop (the GPT-2 /
    tiktoken production order): repeatedly find the LOWEST-rank merge
    whose pair is adjacent in the current segmentation and fold ALL
    its occurrences greedily left-to-right (the same within-merge scan
    order as :func:`_merge_fold`). For tables produced by sequential
    BPE training this yields the segmentation of replaying the table
    in learned order — agreement is differential-tested against the
    codegen path in tests/test_bpe.py. Pure function: also the unit
    under test."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best: tuple[str, str] | None = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        a, b = best
        acc: list[str] = []
        for s in syms:
            if acc and acc[-1] == a and s == b:
                acc[-1] = a + b
            else:
                acc.append(s)
        syms = acc
    return syms


def bpe_segment_arrow(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """The PRODUCTION apply half of the tokenizer lifecycle: segment
    every document with an arbitrarily large learned merge table in
    ONE Arrow-batched ``mapInPandas`` pass — where :func:`bpe_segment`
    chains one codegen fold per merge (its docstring caps it at
    diagnostic merge counts) and :func:`bpe_vocab_map` covers token
    *counting*, this kernel emits the segmented token stream itself
    for thousands-of-merges tokenizers.

    Scale shape: the merge table rides to executors once as a
    broadcast rank dict (model-sized); each Arrow batch tokenizes
    with the SAME whitespace convention as ``ws_tokens`` (ASCII
    ``\\s`` — Java regex semantics) and segments each DISTINCT word
    once through a per-batch cache (Zipf: the cache hit rate is the
    corpus' token/type ratio), so per-batch work is
    O(distinct words × word length²) dict lookups, not
    O(rows × merges). Exactly one Python boundary in the plan
    (ArrowEvalPython via mapInPandas — locked in tests/test_plans.py);
    NULL text yields NULL tokens."""
    import re

    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    b_ranks = df.sparkSession.sparkContext.broadcast(ranks)
    # StructType.add mutates in place — never .add onto df.schema
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )
    split = re.compile(r"\s+", re.ASCII)

    def segment(batches):
        r = b_ranks.value
        cache: dict[str, list[str]] = {}

        def words(text: str) -> list[str]:
            return [w for w in split.split(text.lower().strip()) if w]

        def enc(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _rank_priority_encode(w, r)
            return got

        for pdf in batches:
            pdf[out_col] = [
                None
                if text is None
                else [t for w in words(text) for t in enc(w)]
                for text in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(segment, schema)


def bpe_vocab_map(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """(word, n_tokens) after replaying the merge table — the fitted
    tokenizer AS A LOOKUP TABLE: each DISTINCT word is folded once
    (Heaps'-law-sized work however big the corpus), and applying the
    tokenizer downstream becomes a broadcast join instead of
    re-replaying the folds per occurrence. This is how token-count
    economics run at 100 TB: explode words, join this map, aggregate —
    the folds never touch the corpus."""
    syms = _chars(F.col("word"))
    for m in merges:
        syms = _merge_fold(syms, m[0], m[1])
    return bpe_word_freqs(df, text_col).select(
        "word", F.size(syms).cast("long").alias("n_tokens")
    )
