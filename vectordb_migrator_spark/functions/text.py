"""Text-analysis column functions (X5) — all JVM-side expressions.

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting. No Python
UDFs in any of these: at 100 TB the text columns stream through
whole-stage codegen. Each function has an exactly-equivalent ANSI-SQL
formulation used by the DuckDB oracle (see ``__spark_entry__.py``), so
the logic is deliberately regex-simple and fold-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword sets for the n-gram/stopword-hit
#: language-ID heuristic. Deterministic and duplicated verbatim in the
#: oracle SQL — keep the two in sync.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
}

#: Priority order for arg-max ties (first wins).
LANG_PRIORITY = ["en", "de", "es", "fr"]

_BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
_PUNCT_CLASS = "[^.,;:!?]"
_HASH_MOD = 1_000_000_007


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_strip(col: Column) -> Column:
    """Strip ALL leading/trailing whitespace. ``F.trim`` removes only
    spaces (0x20) — tabs/newlines at the edges would otherwise produce
    empty tokens after a ``\\s+`` split (hypothesis-found edge)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(ws_strip(_c(col))), r"\s+")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: letter runs, digit runs, and single
    punctuation marks each count as one token — a cheap, deterministic
    proxy for a byte-pair-encoding tokenizer's token count."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(_BPE_TOKEN_RE), 0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    c = _c(col)
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_count(col: Column | str, stopwords: list[str]) -> Column:
    lit_set = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(ws_tokens(col), lambda t: F.array_contains(lit_set, t)))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_STOPWORDS["en"]
    n = token_count_ws(col)
    return F.when(
        n > 0, stopword_count(col, sw).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Document quality heuristic in [0,1]: rewards mid-length docs and
    stopword presence, penalizes punctuation soup. The exact weighting
    is arbitrary but fixed — what matters is determinism and that every
    term is a codegen expression."""
    c = _c(col)
    n_tok = token_count_ws(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    p_pen = F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return F.round(0.5 * len_score + 0.3 * sw_score + 0.2 * (1.0 - p_pen), 4)


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: stopword_count(col, sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_id(col: Column | str) -> Column:
    """Stopword-hit language ID with deterministic arg-max (priority
    order breaks ties; all-zero → 'und')."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_score = F.lit(-1)
    # iterate in reverse priority so earlier languages win ties
    for lang in reversed(LANG_PRIORITY):
        s = scores[lang]
        cond = (s > best_score) | ((s == best_score) & (s > 0))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return F.when(best_score <= 0, F.lit("und")).otherwise(best)


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over characters:
    ``h = fold(chars, 0, (s, c) -> (s*31 + ascii(c)) mod 1e9+7)`` —
    a deterministic 63-bit-safe document fingerprint computed entirely
    in codegen (no UDF), reproducible in any engine with a list fold.
    """
    codes = F.transform(F.split(_c(col), ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda s, x: (s * 31 + x) % F.lit(_HASH_MOD),
    )


def md5_fingerprint(col: Column | str) -> Column:
    """Content-hash fingerprint (first 16 hex chars of md5) — the
    cheap exact-dedup key."""
    return F.substring(F.md5(_c(col)), 1, 16)


#: Conservative PII patterns — emails and NANP-style phone numbers.
#: At 100 TB this is a single-pass regexp_replace inside codegen; the
#: pattern set is deliberately small and auditable (recall-tuned NER
#: scrubbing is a model call, not a regex — that belongs in a
#: mapInPandas stage like multimodal.extract_features).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{4}\b"


def redact_pii(col: Column | str) -> Column:
    """Replace emails / phone-shaped tokens with typed placeholders."""
    c = _c(col)
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_PHONE, "<PHONE>")
    return c


def pii_count(col: Column | str) -> Column:
    """How many PII spans redaction would remove (for audit metrics)."""
    c = _c(col)
    return (
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), 0))
        + F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), 0))
    ).cast("long")


def normalize_for_dedup(col: Column | str) -> Column:
    """Canonicalize text the way dedup pipelines do before shingling:
    lowercase, strip punctuation to spaces, collapse whitespace runs,
    trim. Near-dup detection over the normalized form catches pairs
    that differ only in casing/punctuation — pure codegen (two
    regexp_replace + lower + trim), no Python, no external Unicode
    libs (ASCII-class punctuation; full NFKC needs ICU, stubbed out of
    scope in this container)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def feature_hash_vector(col: Column | str, *, dim: int = 16) -> Column:
    """Feature-hashed document vector (the HashingTF trick): dimension
    ``i`` counts the tokens whose md5-derived bucket is ``i``. Pure
    codegen (one md5 + modulo per token, one pass per dimension over
    the token array), model-free, and — because md5 and base-16 conv
    are bit-identical across engines — exactly reproducible in SQL,
    so retrieval built on it carries full value-hash oracles.

    A real pipeline swaps this for learned embeddings; everything
    downstream (normalize, index, top-k) is unchanged — this function
    exists so the retrieval compositions are testable end-to-end
    without a model in the loop."""
    toks = F.filter(ws_tokens(col), lambda t: t != "")
    buckets = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        % dim,
    )
    # ONE aggregate pass referencing `buckets` exactly once. The naive
    # per-dimension formulation (transform(sequence(0, dim-1), i ->
    # size(filter(buckets, ...)))) references `buckets` dim times, and
    # Catalyst inlines the whole tokenize+md5 tree into every lambda —
    # measured 16× md5 work at dim=16. Here each token hashes once and
    # the accumulator update is dim cheap adds in codegen.
    zero = F.array_repeat(F.lit(0.0), dim)
    return F.aggregate(
        buckets,
        zero,
        lambda acc, b: F.transform(
            acc,
            lambda x, i: x
            + F.when(b == i.cast("long"), F.lit(1.0)).otherwise(F.lit(0.0)),
        ),
    )


def feature_hash_vector_arrow(col: Column | str, *, dim: int = 16) -> Column:
    """Arrow-vectorized twin of :func:`feature_hash_vector` — the SAME
    md5-bucket count vector, computed in one ``pandas_udf`` batch pass
    instead of the per-token interpreted HOF fold (which allocates a
    fresh ``dim``-double array per token; measured 1.54 s of a 1.94 s
    scoring pass at sf0.1/dim=64 — guide §4.2).

    Value-identity is exact, not approximate: the counts are integers
    (any correct histogram of the same buckets is THE same vector), and
    the bucket stream is a verified twin of the Catalyst expression —
    Python ``str.lower`` + the Java ``\\s`` class ``[ \\t\\n\\x0b\\f\\r]``
    for strip/split reproduce ``ws_tokens`` token-for-token on every
    SF (parity-tested in tests/test_text.py), and
    ``md5(utf-8)[:8] % dim`` is bit-identical to
    ``conv(substring(md5(t),1,8),16,10) % dim``. NULL text yields NULL,
    empty/whitespace-only text the zero vector — the HOF path's exact
    contract."""
    import pandas
    from pyspark.sql.functions import pandas_udf

    d = int(dim)

    def _fhv(texts):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        # Java regex \s (used by ws_strip / ws_tokens) is ASCII-only
        ws = r"[ \t\n\x0b\f\r]"
        strip = re.compile(f"^{ws}+|{ws}+$")
        split = re.compile(f"{ws}+")
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            s = strip.sub("", t.lower())
            cnt = np.zeros(d, dtype=np.float64)
            if s:
                for tok in split.split(s):
                    if tok:
                        cnt[
                            int(
                                hashlib.md5(
                                    tok.encode("utf-8")
                                ).hexdigest()[:8],
                                16,
                            )
                            % d
                        ] += 1.0
            out.append(cnt.tolist())
        return pd.Series(out)

    # real type objects (not PEP-563 strings) so pandas_udf's hint
    # inspection needs nothing from this module's globals
    _fhv.__annotations__ = {
        "texts": pandas.Series,
        "return": pandas.Series,
    }
    return pandas_udf(_fhv, "array<double>")(_c(col))


def flesch_reading_ease(col: Column | str) -> Column:
    """Flesch reading-ease score as a struct ``(words long,
    sentences long, syllables long, flesch double)`` — the classic
    readability quality signal (Flesch 1948; used as a curation
    feature next to the Gopher rules): ``206.835 − 1.015·(W/S) −
    84.6·(Syl/W)``.

    Deterministic heuristics, pure codegen: sentences = runs of
    ``[.!?]`` (floored at 1), syllables = vowel-group runs per word
    (floored at 1 — 'xyz' is one syllable, not zero). Scores round to
    4, so the expression is engine-exact; empty documents yield NULL
    flesch."""
    c = _c(col)
    toks = F.filter(ws_tokens(c), lambda x: x != "")
    words = F.size(toks).cast("long")
    sentences = F.greatest(
        F.lit(1), F.regexp_count(c, F.lit(r"[.!?]+"))
    ).cast("long")
    syllables = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.lit(1), F.regexp_count(w, F.lit(r"[aeiouy]+"))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    flesch = F.when(
        words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * words / sentences
            - F.lit(84.6) * syllables / words,
            4,
        ),
    )
    return F.struct(
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
        flesch.alias("flesch"),
    )
