"""PMI collocation tests (hand-math replicas)."""

from __future__ import annotations

def test_pmi_collocations_matches_hand_math(spark):
    import math

    from vectordb_migrator_spark.operators.cleaning import pmi_collocations

    # 'new york' always collocates; 'the the' co-occurs by chance
    docs = [(i, "new york is big and the weather in new york is nice")
            for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, min_count=5, top_k=50).collect()
    }
    # corpus: 5 copies of a 12-token doc -> 60 tokens, 55 bigrams
    n_uni, n_bi = 60.0, 55.0
    r = got[("new", "york")]
    assert (r["n_pair"], r["n_w1"], r["n_w2"]) == (10, 10, 10)
    want = round(
        math.log2((10 / n_bi) / ((10 / n_uni) * (10 / n_uni))), 6
    )
    assert abs(r["pmi"] - want) < 1e-9
    # every surviving pair respects the floor
    assert all(v["n_pair"] >= 5 for v in got.values())
    # 'york is' (10 of 10 york, 10 of 10 is... is appears 10) exists
    assert ("york", "is") in got


def test_kneser_ney_ppl_matches_python_replica(spark):
    import math
    from collections import Counter

    from vectordb_migrator_spark.operators.cleaning import kneser_ney_ppl

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog and a bird"),
        (4, "san francisco san francisco san francisco"),
        (5, "the cat sat on the mat"),  # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in kneser_ney_ppl(df).collect()
    }

    # pure-Python interpolated-KN replica
    D = 0.75
    bigrams = []
    per_doc: dict[int, list] = {}
    for did, text in docs:
        toks = [t for t in text.lower().strip().split() if t]
        bgs = list(zip(toks, toks[1:]))
        per_doc[did] = bgs
        bigrams.extend(bgs)
    c = Counter(bigrams)
    ctx_c = Counter()
    n_types = Counter()
    n_cont = Counter()
    for (v, w), k in c.items():
        ctx_c[v] += k
        n_types[v] += 1
        n_cont[w] += 1
    T = len(c)

    def p(v, w):
        return (c[(v, w)] - D) / ctx_c[v] + D * n_types[v] / ctx_c[v] * (
            n_cont[w] / T
        )

    for did, bgs in per_doc.items():
        s = sum(-math.log2(p(v, w)) for v, w in bgs) / len(bgs)
        assert abs(got[did]["surprisal"] - s) < 1e-5, did
        assert abs(got[did]["ppl"] - 2.0**s) < 1e-3, did
        assert got[did]["n_big"] == len(bgs)

    # identical docs score identically
    assert got[1]["ppl"] == got[5]["ppl"]

    # KN is a proper distribution: sum over the full vocab of P(w|v)
    # is 1 for every context (discount mass exactly re-allocated)
    vocab = set(w for _, w in c) | set(v for v, _ in c)
    for v in ctx_c:
        tot = sum(
            (max(c[(v, w)] - D, 0.0) / ctx_c[v])
            + D * n_types[v] / ctx_c[v] * (n_cont[w] / T)
            for w in vocab
        )
        # sums to <=1 with equality when every word has been seen as
        # a continuation (n_cont covers vocab); here 'the'/'a'/'san'
        # never end a bigram... so assert the re-allocation identity
        disc = sum(max(c[(v, w)] - D, 0.0) for w in vocab) / ctx_c[v]
        lam = D * n_types[v] / ctx_c[v]
        assert abs((disc + lam) - 1.0) < 1e-12

    # the continuation effect: 'francisco' is frequent (3 occurrences)
    # but follows only ONE context, so its continuation count equals
    # that of rare-but-diverse words, not its raw frequency
    assert n_cont[("francisco")] == 1


def test_compression_ratio_detects_repetition(spark):
    import zlib

    from vectordb_migrator_spark.operators.cleaning import (
        compression_ratio,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "buy cheap pills " * 50),       # templated spam
        (3, "a"),                            # tiny
        (4, ""),                             # empty -> NULL ratio
        (5, "x7#pQ z9@mK w2$vN r5&bT q8!cJ " * 2),  # high-entropy-ish
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}

    # exact agreement with direct zlib on the same bytes
    for did, t in docs:
        raw = t.encode()
        if not raw:
            assert got[did]["ratio"] is None
            assert got[did]["raw_bytes"] == 0
            continue
        assert got[did]["raw_bytes"] == len(raw)
        assert got[did]["zlib_bytes"] == len(zlib.compress(raw, 6))
        assert got[did]["ratio"] == round(
            len(zlib.compress(raw, 6)) / len(raw), 6
        )

    # the signal: heavy repetition compresses far better than prose
    assert got[2]["ratio"] < got[1]["ratio"] < got[5]["ratio"]
    assert got[2]["ratio"] < 0.1

    # determinism across re-runs
    again = {r["doc_id"]: r["ratio"] for r in compression_ratio(df).collect()}
    assert again == {k: v["ratio"] for k, v in got.items()}


def test_self_bleu2_detects_mode_collapse(spark):
    from vectordb_migrator_spark.operators.cleaning import self_bleu2

    # a collapsed corpus: 10 near-identical docs + 10 diverse docs
    collapsed = [
        (i, "the same template sentence about products " + str(i % 2))
        for i in range(10)
    ]
    diverse_texts = [
        "quantum chemistry of copper complexes",
        "medieval trade routes across the baltic",
        "recursive descent parsers in haskell",
        "volcanic soil nutrients for coffee",
        "bayesian priors for rare diseases",
        "jazz harmony and tritone substitutions",
        "glacier melt dynamics in patagonia",
        "supply chain contracts under uncertainty",
        "antibody affinity maturation pathways",
        "byzantine fault tolerance protocols",
    ]
    diverse = [(100 + i, t) for i, t in enumerate(diverse_texts)]

    col = self_bleu2(
        spark.createDataFrame(collapsed, "doc_id long, text string"),
        sample_size=10,
    ).collect()
    div = self_bleu2(
        spark.createDataFrame(diverse, "doc_id long, text string"),
        sample_size=10,
    ).collect()
    mean_col = sum(r["bleu2"] for r in col) / len(col)
    mean_div = sum(r["bleu2"] for r in div) / len(div)
    # near-identical docs score near 1; diverse docs near 0
    assert mean_col > 0.8
    assert mean_div < 0.2
    assert mean_col > mean_div + 0.5

    # an exact duplicate pair scores bleu 1.0 against each other
    dup = self_bleu2(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
             (3, "completely different words here")],
            "doc_id long, text string",
        ),
        sample_size=3,
    ).collect()
    by = {r["doc_id"]: r for r in dup}
    assert by[1]["bleu2"] == 1.0 and by[2]["bleu2"] == 1.0
    assert by[3]["bleu2"] == 0.0


def test_span_corruption_reconstructs_and_is_deterministic(spark):
    """r12: substituting each input sentinel <Xk> with the k-th target
    span reconstructs the original token stream EXACTLY for every
    document (the invariant the denoising objective depends on);
    noise tracks the 15% coin; repeat runs are identical."""
    import re

    from vectordb_migrator_spark.operators.cleaning import span_corruption

    rows = [
        (i, f"tok{i} " + " ".join(f"w{i}_{j}" for j in range(3 + i % 25)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in span_corruption(df).collect()}
    assert len(out) == 120

    total_tok = total_masked = 0
    for i, text in rows:
        r = out[i]
        orig = text.lower().split()
        assert r["n_tokens"] == len(orig)
        total_tok += r["n_tokens"]
        total_masked += r["n_masked"]
        # parse target: "<X0> a b <X1> c ... <Xn>" -> spans per index
        parts = re.split(r"<X(\d+)>", r["target_text"])
        # parts = ['', '0', ' a b ', '1', ' c ', 'n', '']
        spans = {}
        for k in range(1, len(parts) - 2, 2):
            spans[int(parts[k])] = parts[k + 1].split()
        assert int(parts[-2]) == r["n_spans"]  # terminator index
        rebuilt = []
        for piece in r["input_text"].split():
            m = re.fullmatch(r"<X(\d+)>", piece)
            rebuilt += spans[int(m.group(1))] if m else [piece]
        assert rebuilt == orig, i
        if r["n_masked"] == 0:
            assert r["input_text"] == " ".join(orig)
            assert r["target_text"] == "<X0>"
    # coin rate sanity: 15% +- 5 points over ~2k tokens
    assert 0.08 < total_masked / total_tok < 0.22

    again = {r["id"]: tuple(r) for r in span_corruption(df).collect()}
    assert again == {i: tuple(r) for i, r in out.items()}
