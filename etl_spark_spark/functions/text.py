"""Text-analysis expression library (LLM-data-pipeline extension,
SURVEY.md §7 / BASELINE north star).

All Column-expression builders — JVM-side, codegen-friendly, no UDFs:
tokenization, token/char/punctuation counting, stopword hits, a
quality score, document fingerprinting, word n-gram shingles, and a
stopword-profile language-ID heuristic.

Determinism note: everything here is integer counting, per-row double
arithmetic, or md5 — bit-reproducible across engines and cluster sizes,
which is what lets every operator pair with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: Column | str) -> Column:
    """Lowercase + trim (the canonical form used for fingerprints)."""
    return F.lower(F.trim(_col(c)))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of normalized text -> array<string>."""
    return F.split(normalize_text(c), r"\s+")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def punct_count(c: Column | str) -> Column:
    return F.regexp_count(_col(c), F.lit(r"[^A-Za-z0-9\s]"))


# GPT-2-style pre-tokenizer classes, lookahead-free so the SAME pattern
# runs identically under Java regex (Spark) and RE2 (DuckDB): a token is
# an optionally space-prefixed letter run, digit run, or symbol run.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(c: Column | str) -> Column:
    """Pre-tokenizer token count — the BPE-ish estimate an LLM pipeline
    budgets with (~1.3x the eventual BPE count on English): counts
    space-glued letter/digit/symbol runs instead of whitespace words,
    so punctuation and numbers cost tokens the way real tokenizers
    charge them."""
    return F.regexp_count(_col(c), F.lit(BPE_TOKEN_PATTERN))


def bpe_token_count_sql(expr: str) -> str:
    """DuckDB mirror of ``bpe_token_count`` (same pattern, RE2)."""
    return f"len(regexp_extract_all({expr}, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))"


def stopword_hits(c: Column | str, words: list[str]) -> Column:
    """Count of occurrences of any of ``words`` as whole tokens.
    Words are regex-escaped; an empty list counts 0 (the naive
    ``\\b()\\b`` pattern would match every word boundary)."""
    import re as _re

    if not words:
        return F.lit(0)
    pat = r"\b(" + "|".join(_re.escape(w) for w in words) + r")\b"
    return F.regexp_count(normalize_text(c), F.lit(pat))


def quality_score(c: Column | str, stopwords: list[str]) -> Column:
    """Heuristic quality in [0,1]: rewards stopword density and
    penalizes punctuation density (deterministic per-row doubles)."""
    n_tok = token_count(c).cast("double")
    stop_ratio = stopword_hits(c, stopwords).cast("double") / n_tok
    punct_ratio = punct_count(c).cast("double") / F.length(_col(c)).cast("double")
    score = F.least(F.lit(1.0), stop_ratio * 5.0) * (1.0 - F.least(F.lit(1.0), punct_ratio * 10.0))
    return F.round(score, 6)


def dup_fraction(arr: Column | str) -> Column:
    """Fraction of array elements that repeat an earlier element:
    ``1 - n_distinct/n`` (0.0 for empty arrays), rounded to 6 places.

    The Gopher-style within-document repetition signal: applied to the
    token array it flags word-loop spam; applied to a ``word_shingles``
    array it flags duplicated passages. Pure per-row expression — no
    shuffle, embarrassingly parallel at any scale.
    """
    a = _col(arr)
    n = F.size(a)
    u = F.size(F.array_distinct(a))
    return F.round(
        F.when(n > 0, 1.0 - u.cast("double") / n.cast("double")).otherwise(0.0),
        6,
    )


def fingerprint(c: Column | str) -> Column:
    """Exact-duplicate fingerprint: md5 of whitespace-collapsed
    normalized text."""
    canon = F.regexp_replace(normalize_text(c), r"\s+", " ")
    return F.md5(canon)


def word_shingles(tokens_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (space-joined), empty when
    the document has fewer than ``n`` tokens.

    Uses 1-based element_at so the same indexing works in ANSI SQL
    (DuckDB ``t[i]`` is 1-based). Guarded: Spark's ``sequence(1, k)``
    counts DOWN when k < 1, so short docs get an explicit empty array.

    PERF: pass a MATERIALIZED array column (``df.select(tokens(c)
    .alias("t"))`` first), not the ``tokens(...)`` expression directly —
    expressions are not common-subexpression-eliminated inside lambda
    functions, so an inlined split() would be re-tokenized for every
    element_at (quadratic per document; measured 15s -> 2s at sf0.1).
    """
    t = _col(tokens_col)
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(n)]
    )
    return F.when(F.size(t) >= n, F.transform(idx, shingle)).otherwise(
        F.array().cast("array<string>")
    )


#: Stopword profiles for the language-ID heuristic. Tiny on purpose —
#: real language ID would use character n-gram models; the operator
#: contract (deterministic per-language scores + argmax with a fixed
#: priority order) is what the engine provides.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": [],  # scored by CJK character presence instead
}


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Per-language integer scores: stopword hits (CJK char count for
    zh)."""
    out: dict[str, Column] = {}
    for lang, words in LANG_PROFILES.items():
        if words:
            out[lang] = stopword_hits(c, words)
        else:
            out[lang] = F.regexp_count(_col(c), F.lit(r"[\x{4e00}-\x{9fff}]"))
    return out


def lang_id(c: Column | str) -> Column:
    """Argmax language with a fixed priority order on ties
    (en > es > fr > de > zh, i.e. the declaration order in
    LANG_PROFILES) — mirrors a deterministic SQL CASE chain."""
    scores = lang_scores(c)
    langs = list(LANG_PROFILES)
    expr = F.lit(langs[-1])
    # build the CASE chain from lowest to highest priority
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            # lang wins if >= every higher-listed... priority encoded by
            # evaluation order: earlier langs win ties by being checked last
            c2 = scores[lang] >= scores[other]
            cond = c2 if cond is None else (cond & c2)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def gopher_rule_counters(c: Column | str) -> dict[str, Column]:
    """The integer counters behind the published Gopher quality rules
    (Rae et al. 2021, arXiv:2112.11446 §A1.1 — public method): word
    count, total word characters, words containing a letter, hash/
    ellipsis symbols. All exact integers so the rule thresholds can be
    tested with integer inequalities (no float ratios to diverge
    across engines). Pure per-row expressions — map-only at any scale.

    Approximation note: ``word_chars`` counts every non-whitespace
    character of the normalized text — punctuation and digits included
    — so the derived mean-word-length rule deviates from the Gopher
    paper's per-word character definition on punctuation-heavy docs
    (trade: one regexp_replace vs aggregating length(w) over the token
    array; Spark and the oracle share the same definition either way).
    """
    t = tokens(c)
    return {
        "n_words": F.size(t).cast("long"),
        "word_chars": F.length(
            F.regexp_replace(normalize_text(c), r"\s", "")
        ).cast("long"),
        "alpha_words": F.size(
            F.filter(t, lambda w: w.rlike("[a-z]"))
        ).cast("long"),
        "symbols": F.regexp_count(_col(c), F.lit(r"#|\.\.\.")).cast("long"),
    }


def gopher_rule_flags(
    counters: dict[str, Column],
    n_stop: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> dict[str, Column]:
    """Gopher rule booleans from ``gopher_rule_counters`` output plus a
    stopword-hit count. Ratio thresholds are cross-multiplied into
    integer comparisons (mean word length in [3, 10], >= 80% alphabetic
    words, < 10% symbol ratio, >= 2 stopword hits), so every flag is
    bit-reproducible in any engine."""
    n, wc = counters["n_words"], counters["word_chars"]
    return {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_word_len": (3 * n <= wc) & (wc <= 10 * n),
        "r_alpha": 5 * counters["alpha_words"] >= 4 * n,
        "r_symbol": 10 * counters["symbols"] <= n,
        "r_stop": n_stop >= 2,
    }
