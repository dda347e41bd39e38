"""Text analysis for training-data curation: language ID, quality scoring,
token counting, document fingerprinting.

No direct reference counterpart (the reference's text handling is
format-parsing, e.g. ``parsers/fasta.py``, ``utils/xml_utils.py``); these are
the standard corpus-curation passes a 100 TB pipeline runs before dedup.
Everything is built-in column expressions (whole-stage codegen; no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text, tokens

# small high-frequency stopword lists per language (n-gram heuristic langid)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que", "les", "des"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
}


def stopword_ratio(text_col: str = "text", lang: str = "en") -> F.Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_id_from_ratios(ratios: dict[str, F.Column]) -> tuple[F.Column, F.Column]:
    """(detected_lang, lang_score) argmax fold over per-language stopword
    ratio columns — deterministic tie-break by language code ('und' when no
    stopwords hit). ONE shared fold: both :func:`lang_id` and composed
    profile queries build from it, so the tie-break chain can never
    diverge between the operator and a query that inlines it."""
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(ratios):  # deterministic order; strict > keeps first max
        s = ratios[lang]
        better = s > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, s).otherwise(best_score)
    return best, F.round(best_score, 6)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax stopword ratio across known languages,
    deterministic tie-break by language code; 'und' when no stopwords hit."""
    scored = df
    for lang in STOPWORDS:
        scored = scored.withColumn(f"__sw_{lang}", stopword_ratio(text_col, lang))
    best, score = lang_id_from_ratios(
        {lang: F.col(f"__sw_{lang}") for lang in STOPWORDS}
    )
    return scored.withColumn("detected_lang", best).withColumn(
        "lang_score", score
    ).drop(*[f"__sw_{lang}" for lang in STOPWORDS])


def token_count(text_col: str = "text") -> F.Column:
    """Whitespace token count."""
    toks = tokens(text_col)
    return F.size(F.filter(toks, lambda t: t != ""))


def bpe_ish_token_count(text_col: str = "text") -> F.Column:
    """BPE-ish subword estimate: word-piece segments of ≤4 chars — a
    regex-split proxy for tokenizer cost accounting (count of 1-4 char
    alphanumeric runs plus isolated punctuation)."""
    c = F.col(text_col)
    pieces = F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]{1,4}|[^a-z0-9\s]"), 0)
    return F.size(pieces)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / word-shape features + a composite
    quality score in [0,1] (heuristics in the C4/Gopher-rules family)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    mean_word_len = F.when(
        n_tokens > 0, F.length(normalize_text(text_col)) / n_tokens
    ).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    sw_ratio = stopword_ratio(text_col, "en")
    # composite: reward reasonable length & stopword presence, punish
    # extreme punctuation and degenerate word shapes
    score = (
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(sw_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.2
        + F.when((mean_word_len >= 2.5) & (mean_word_len <= 10.0), 1.0).otherwise(0.0) * 0.1
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(sw_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def fingerprint(text_col: str = "text") -> F.Column:
    """Normalized-content SHA-256 fingerprint (exact-dup key; distributed
    replacement for the reference's driver-side ``text_sha256``,
    ``core/refseq_io.py:216-221``)."""
    return F.sha2(normalize_text(text_col), 256)


def rolling_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Per-document set of rolling window fingerprints (xxhash64 of each
    ``window``-token shingle) — substring-level dup detection (the basis of
    suffix-array-style decontamination at corpus scale)."""
    from .dedup import word_shingles

    sh = word_shingles(text_col, window)
    return df.select(
        F.col(id_col),
        F.transform(sh, lambda s: F.xxhash64(s)).alias("fingerprints"),
    )
