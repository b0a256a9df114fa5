"""Lexical relevance ranking — BM25 top-k over a document column.

The retrieval-side complement to the embedding similarity operators
(X3/X4): score documents against a bag-of-words query with Okapi BM25
and return the top-k. Useful standalone (lexical search over a corpus)
and as the sparse half of hybrid sparse+dense retrieval.

Scale design: everything is whole-stage codegen —
- corpus statistics (N, avgdl, per-term document frequency) are ONE
  map-side-combinable aggregate producing a single row, broadcast back
  over the corpus (no driver action, no second shuffle);
- per-document term frequencies are array expressions over the token
  array (``size(filter(toks, = term))``) — the token array never
  leaves its row and nothing but (id, score) reaches the top-k;
- top-k is ``TakeOrderedAndProject`` (per-partition heaps + driver
  merge of k·partitions rows), never a global sort.
The corpus is scanned twice (stats, then scoring) — the standard
trade; cache the tokenized corpus when issuing many queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.text import ws_tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k: ``score(D,Q) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·|D|/avgdl))`` with the standard smoothed
    ``idf(t) = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)``.

    Returns (id_col, score) for the k highest-scoring documents,
    ties broken by id for determinism.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = ws_tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("toks"))

    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", t), 1).otherwise(0)
            ).cast("double").alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ],
    )

    def term_score(i: int, t: str) -> Column:
        tf = F.size(
            F.filter(F.col("toks"), lambda x: x == F.lit(t))
        ).cast("double")
        df_t = F.col(f"df_{i}")
        idf = F.log(
            (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
            + F.lit(1.0)
        )
        dl = F.size("toks").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * dl / F.col("avgdl")
        )
        return idf * tf * F.lit(k1 + 1.0) / denom

    score = sum(
        (term_score(i, t) for i, t in enumerate(query_terms)),
        start=F.lit(0.0),
    )
    return (
        base.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "id",
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of already-truncated rankings — the
    standard hybrid-retrieval combiner (sparse BM25 list + dense
    cosine list): ``score(d) = Σ_lists 1/(rrf_k + rank_d)``; documents
    absent from a list simply contribute nothing.

    Each input must be an (id, score) top-``depth`` result. Ranks are
    re-derived here from (score DESC, id) so fusion is deterministic
    and engine-independent even when callers hand over unordered
    frames. The unpartitioned rank window is intentional: inputs are
    top-k lists (tens-to-thousands of rows — list depth, NOT corpus
    size), so a single-partition window over each is driver-trivial
    while the heavy scans stay inside the upstream operators. Rank
    arithmetic is small-integer rationals in float64 — bit-identical
    across engines.

    Returns (id_col, score, n_lists) for the top-k fused ids.
    """
    from pyspark.sql import Window as W

    if not rankings:
        raise ValueError("rankings must be non-empty")
    w = W.orderBy(F.desc("score"), F.col(id_col))
    ranked = [
        r.select(F.col(id_col), F.row_number().over(w).alias("rank"))
        for r in rankings
    ]
    allr = ranked[0]
    for r in ranked[1:]:
        allr = allr.unionAll(r)
    return (
        allr.groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))), 6
            ).alias("score"),
            F.count("*").alias("n_lists"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def retrieval_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    rank_by: list[tuple[str, bool]] = (("score", False),),
) -> DataFrame:
    """Retrieval evaluation: recall@k and MRR of a ranked candidate
    list against a relevant set — the ANN-quality gate (is the cheap
    index good enough, or does the top-k need a float rerank?).

    The ranking is re-derived from ``rank_by`` (column, ascending)
    pairs with the id as the final tiebreak — never from physical row
    order, which survives neither shuffles nor engine differences.
    ``truth`` supplies the relevant ids. Both inputs are list-depth
    frames, so the metric math is driver-trivial; keeping it a
    DataFrame op (one broadcast semi-join + one aggregate) lets it
    run per-query-batch inside larger pipelines.

    Fully LAZY: the relevant-set size is folded in as a broadcast
    one-row aggregate joined to the hit aggregate — no job fires until
    the caller's own action, so the operator composes inside larger
    plans without forcing an early materialization.

    Returns one row: (n_relevant, n_retrieved, n_hits, recall_at_k,
    mrr) — mrr is 0.0 when nothing relevant is retrieved.
    """
    from pyspark.sql import Window as W

    order = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in rank_by
    ] + [F.col(id_col).asc()]
    ranked = (
        candidates.select(
            F.col(id_col),
            F.row_number().over(W.orderBy(*order)).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
    t = truth.select(F.col(id_col)).distinct()
    hits = ranked.join(F.broadcast(t), id_col, "left_semi")
    truth_stats = t.agg(F.count("*").alias("n_relevant"))  # 1 row, lazy
    hit_stats = hits.agg(
        F.count("*").alias("n_hits"),
        F.min("rank").alias("min_rank"),
    )
    return hit_stats.crossJoin(F.broadcast(truth_stats)).select(
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.lit(k).cast("long").alias("n_retrieved"),
        F.col("n_hits"),
        F.round(
            F.col("n_hits").cast("double") / F.col("n_relevant").cast("double"),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("min_rank"), F.lit(0.0)), 6
        ).alias("mrr"),
    )


def mmr_rerank(
    candidates: DataFrame,
    *,
    k: int = 10,
    lamb: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
    max_candidates: int = 10_000,
) -> DataFrame:
    """Maximal-marginal-relevance diversity re-rank of a retrieval
    shortlist: greedily pick ``argmax λ·relevance − (1−λ)·max cosine
    to anything already selected`` — the standard de-duplicating
    re-rank between ANN retrieval and a training batch / RAG context
    (near-identical hits crowd out coverage otherwise).

    Greedy MMR is inherently sequential (selection ``i`` depends on
    all earlier picks), so the heavy distributed work must happen
    UPSTREAM in the top-n scan that produced ``candidates``; this
    operator collects the shortlist — list-depth by construction,
    tens-to-hundreds of rows, the same driver-bounded contract as
    :func:`~vectordb_migrator_spark.operators.clustering.kmeans_fit`'s
    centroids — and runs the O(n·k·d) greedy loop on the driver. Ties
    break by ascending id; similarities use unit-normalized vectors.

    Engine-independent determinism: dot products fold sequentially in
    index order (the same order Spark codegen and DuckDB
    ``list_dot_product`` use), the argmax compares MMR values ROUNDED
    to 6 decimals (so an external SQL replication ranks identically),
    and ``-0.0`` normalizes to ``0.0``.

    ``max_candidates`` (default 10 000) guards the driver collect: the
    call raises ``ValueError`` instead of OOMing when fed more rows
    than a plausible shortlist — the distributed top-n belongs
    upstream.

    Returns (id_col, mmr_rank, mmr_score) in selection order.
    """
    import math

    id_type = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, mmr_rank int, mmr_score double"
    # The collect below is shortlist-sized BY CONTRACT; enforce it so
    # a caller who accidentally passes a corpus gets a clear error,
    # not a driver OOM (r9 verdict). limit(max+1) bounds the probe.
    probe = candidates.select(id_col, score_col, vec_col).limit(
        max_candidates + 1
    )
    rows = probe.collect()
    if len(rows) > max_candidates:
        raise ValueError(
            f"mmr_rerank collects its input on the driver: got more "
            f"than max_candidates={max_candidates} rows. MMR is a "
            f"SHORTLIST re-ranker — run a distributed top-n first "
            f"(e.g. operators.similarity.cosine_topk) and re-rank "
            f"that, or raise max_candidates explicitly if the "
            f"shortlist is genuinely this large."
        )
    if not rows:
        return candidates.sparkSession.createDataFrame([], out_schema)

    def dot(a: list[float], b: list[float]) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    ids = [r[id_col] for r in rows]
    rel = [float(r[score_col]) for r in rows]
    unit = []
    for r in rows:
        v = [float(x) for x in r[vec_col]]
        norm = math.sqrt(dot(v, v))
        unit.append([x / norm for x in v] if norm else v)

    n = len(ids)
    first = min(range(n), key=lambda i: (-rel[i], ids[i]))
    selected = [first]
    out = [(ids[first], 1, round(rel[first], 6) + 0.0)]
    remaining = [i for i in range(n) if i != first]
    while remaining and len(selected) < k:
        best, best_mmr = None, None
        for i in remaining:
            max_sim = max(dot(unit[i], unit[j]) for j in selected)
            mmr = round(lamb * rel[i] - (1.0 - lamb) * max_sim, 6) + 0.0
            if best is None or (-mmr, ids[i]) < (-best_mmr, ids[best]):
                best, best_mmr = i, mmr
        selected.append(best)
        out.append((ids[best], len(selected), best_mmr))
        remaining.remove(best)
    return candidates.sparkSession.createDataFrame(out, out_schema)


def recall_report(
    families: list[tuple[str, DataFrame, list[tuple[str, bool]]]],
    truth: DataFrame,
    *,
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Recall@k / MRR of several ANN index families against one exact
    truth set — the quantified recall-vs-cost story behind choosing an
    index (is the 2^nbits-cheaper LSH scan worth its misses? does the
    binary shortlist need the float rerank?).

    ``families`` is ``[(name, candidates, rank_by), ...]`` where each
    ``candidates`` is that family's top-k frame and ``rank_by`` its
    (column, ascending) ranking. One :func:`retrieval_metrics` row per
    family, unioned and tagged — every per-family plan keeps its own
    scan shape (the heavy work), while the metric math stays
    list-depth-trivial. Returns (family, n_relevant, n_retrieved,
    n_hits, recall_at_k, mrr) ordered by family."""
    frames = []
    for name, cand, rank_by in families:
        m = retrieval_metrics(
            cand, truth, id_col=id_col, k=k, rank_by=list(rank_by)
        )
        frames.append(
            m.select(
                F.lit(name).alias("family"),
                "n_relevant",
                "n_retrieved",
                "n_hits",
                "recall_at_k",
                "mrr",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("family")


def ndcg_at_k(
    candidates: DataFrame,
    truth_ranked: DataFrame,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    rank_by: list[tuple[str, bool]] = (("score", False),),
) -> DataFrame:
    """nDCG@k of a ranked candidate list against GRADED relevance —
    the position-aware metric recall@k can't express (a system that
    returns the right ids in the wrong order scores below one that
    ranks them correctly). ``truth_ranked`` carries (id, rank) of the
    ideal ordering; gain for the id at truth rank r is ``k+1−r`` (the
    standard linear-gain grading when no explicit judgments exist —
    top truth hit worth k, k-th worth 1, absent worth 0).

    DCG = Σ gain_i / log2(i+1) over the candidate ranking (re-derived
    from ``rank_by`` + id tiebreak, never physical row order); IDCG is
    the closed-form ideal (the gains sorted descending), computed
    driver-side. One list-depth join + one aggregate; composes lazily
    like :func:`retrieval_metrics`. Returns one row
    ``(dcg, idcg, ndcg)``."""
    import math

    from pyspark.sql import Window as W

    order = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in rank_by
    ] + [F.col(id_col).asc()]
    ranked = candidates.select(
        F.col(id_col),
        F.row_number().over(W.orderBy(*order)).alias("__pos"),
    ).filter(F.col("__pos") <= k)
    t = truth_ranked.select(
        F.col(id_col), F.col("rank").alias("__trank")
    ).filter(F.col("__trank") <= k)
    idcg = sum((k + 1 - r) / math.log2(r + 1) for r in range(1, k + 1))
    joined = ranked.join(t, id_col, "left").select(
        (
            F.coalesce(F.lit(k + 1) - F.col("__trank"), F.lit(0))
            / F.log2(F.col("__pos") + 1)
        ).alias("__g")
    )
    return joined.agg(
        F.round(F.sum("__g"), 6).alias("dcg"),
        F.round(F.lit(idcg), 6).alias("idcg"),
        F.round(F.sum("__g") / F.lit(idcg), 6).alias("ndcg"),
    )


def maxsim_topk(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    *,
    id_col: str = "doc_id",
    vec_col: str = "vec",
    query_id_col: str = "q_id",
    query_vec_col: str = "qv",
    k: int = 10,
) -> DataFrame:
    """Late-interaction (ColBERT-style) retrieval: score(doc) =
    Σ over query vectors q of max over the doc's vectors c of
    cos(q, c), top-k docs by score.

    ``doc_vecs`` is one row per document sub-vector (chunk/token
    embedding); ``query_vecs`` is the query's own sub-vector set —
    QUERY-sized, so it broadcasts: the candidate pass is a broadcast
    nested-loop over (corpus sub-vectors × |Q|), a narrow multiply
    with no corpus shuffle. The two reductions shuffle id-width keys
    only: (doc, q) max, then doc sum. Per-q maxima are rounded to 6
    then summed as DECIMAL so the doc score is order-independent and
    exact cross-engine. At 100 TB, gate this full scorer behind an
    ANN shortlist (`ivf_index_topk` on pooled vectors) and MaxSim
    only the shortlist — the standard two-stage ColBERT serving
    layout; the operator composes unchanged over the shortlist frame.
    """
    from vectordb_migrator_spark.functions.vector import cosine_similarity

    q = query_vecs.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).cast("array<double>").alias("__qv"),
    )
    pairs = doc_vecs.select(
        id_col, F.col(vec_col).cast("array<double>").alias("__dv")
    ).crossJoin(F.broadcast(q))
    per_q = (
        pairs.select(
            id_col,
            "__qid",
            # cosine_similarity is NULL for zero-norm vectors; a zero
            # sub-vector contributes similarity 0, it must not drop
            # out of the (doc, q) max nor leave a NULL score that
            # still occupies a top-k slot (nulls sort last)
            F.round(
                F.coalesce(
                    cosine_similarity(F.col("__dv"), F.col("__qv")),
                    F.lit(0.0),
                ),
                6,
            ).alias("__s"),
        )
        .groupBy(id_col, "__qid")
        .agg(F.max("__s").alias("__m"))
    )
    return (
        per_q.groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("__m").cast("decimal(18,6)")).cast("double"), 6
            ).alias("maxsim")
        )
        .orderBy(F.desc("maxsim"), id_col)
        .limit(k)
    )


def rm3_expansion(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fb_docs: int = 10,
    fb_terms: int = 15,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """RM3 pseudo-relevance-feedback query expansion (Lavrenko &
    Croft relevance models + Abdul-Jaleel et al.'s RM3 interpolation):
    run BM25, treat the top ``fb_docs`` as pseudo-relevant, estimate
    the relevance model ``P(t|R) = Σ_d (score_d/Σscore) · tf(t,d)/|d|``
    over their terms, and interpolate with the uniform original query
    model: ``w(t) = λ·P(t|Q) + (1−λ)·P(t|R)``. Returns the top
    ``fb_terms`` (term, weight) — the expanded query to feed back into
    :func:`bm25_topk`.

    Scale shape: the corpus-sized work is exactly ONE BM25 pass; the
    feedback side is ``fb_docs`` rows joined back by id, so the term
    model is built over a handful of documents however big the corpus.
    Per-doc contributions round to 9 and sum as DECIMAL, so the model
    is order-independent and engine-exact (the MaxSim contract)."""
    from vectordb_migrator_spark.functions.text import ws_tokens

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    fb = bm25_topk(
        df, query_terms, id_col=id_col, text_col=text_col,
        k=fb_docs, k1=k1, b=b,
    ).localCheckpoint(eager=True)
    wsum = fb.agg(F.sum("score").alias("__ws"))
    toks = F.filter(ws_tokens(text_col), lambda x: x != "")
    per = (
        df.join(fb, id_col)
        .select(
            F.col(id_col),
            "score",
            F.size(toks).cast("double").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy(id_col, "term", "score", "dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    rel = (
        per.crossJoin(F.broadcast(wsum))
        .select(
            "term",
            F.round(
                F.col("score") / F.col("__ws") * F.col("tf") / F.col("dl"),
                9,
            )
            .cast("decimal(18,9)")
            .alias("c"),
        )
        .groupBy("term")
        .agg(F.sum("c").cast("double").alias("p_rel"))
    )
    qm = df.sparkSession.createDataFrame(
        [(t, 1.0 / len(query_terms)) for t in query_terms],
        "term string, p_q double",
    )
    return (
        rel.join(qm, "term", "full_outer")
        .select(
            "term",
            F.round(
                F.lit(lam) * F.coalesce("p_q", F.lit(0.0))
                + F.lit(1.0 - lam) * F.coalesce("p_rel", F.lit(0.0)),
                6,
            ).alias("weight"),
        )
        .orderBy(F.desc("weight"), "term")
        .limit(fb_terms)
    )


def phrase_search(
    df: DataFrame,
    phrases: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact multi-word phrase search: for each phrase, every document
    containing it as CONSECUTIVE whitespace tokens, with the
    occurrence count — the IR primitive behind quoted-query search and
    n-gram provenance checks ("which docs contain this exact
    sentence fragment").

    Spark-first shape: a classic positional inverted index would
    shuffle a (doc, pos, token) posting row per token — corpus-sized
    exchanges before the first match. Here matching is a pure codegen
    higher-order function over each row's token array: count i where
    toks[i+j] = wordⱼ ∀j. No exchange at all until the (phrase, id,
    n_hits) result rows — for one-shot or few-phrase search this beats
    building the index; build ``x0_retrieval_tfidf``-style structures
    when the workload is many-queries-one-corpus. All phrases scan in
    ONE pass (a struct-array explode fans results out row-side).

    Matching is on lowercase whitespace tokens (the corpus-wide
    tokenizer contract, ``functions/text.py:ws_tokens``); empty or
    whitespace-only phrases are rejected."""
    from functools import reduce

    specs = []
    for p in phrases:
        words = p.lower().split()
        if not words:
            raise ValueError(f"phrase must contain at least one token: {p!r}")
        specs.append((p, words))

    base = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    )

    def hits(words: list[str]) -> Column:
        k = len(words)
        starts = F.sequence(F.lit(0), F.size("__toks") - k)
        match = lambda i: reduce(  # noqa: E731
            Column.__and__,
            [
                F.element_at("__toks", (i + j + 1).cast("int"))
                == F.lit(w)
                for j, w in enumerate(words)
            ],
        )
        return (
            F.when(
                F.size("__toks") >= k,
                F.size(F.filter(starts, match)),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(p).alias("phrase"), hits(w).alias("n_hits")
            )
            for p, w in specs
        ]
    )
    return (
        base.select(F.col(id_col), F.explode(rows).alias("r"))
        .select(id_col, F.col("r.phrase").alias("phrase"),
                F.col("r.n_hits").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )
