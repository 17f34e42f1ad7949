"""Text-analysis operators for document pipelines (north-star extension):
token counting, quality scoring, language-ID heuristic, fingerprinting.

All pure column expressions (codegen-friendly); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-count heuristic.
# Deterministic and portable — the point is the operator shape, not NLP
# accuracy (the driver's documents corpus is synthetic word-soup anyway).
LANG_STOPWORDS = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "a", "of", "and", "is", "to"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "et", "des", "un"],
    "ru": ["и", "в", "не", "на", "что", "с"],
}

_PUNCT_RE = r"[^.,!?;:]"


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/null-safe."""
    t = F.trim(text)
    return F.when(t.isNull() | (t == ""), F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: count of letter runs, digit runs and
    punctuation marks (a cheap BPE stand-in for budget estimation)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[a-zа-я]+|[0-9]+|[^\sa-zа-я0-9]"), 0))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: length, token count, punctuation ratio,
    stopword ratio, mean token length."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = token_count(t)
    stop_all = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*stop_all)))
    n_punct = F.length(F.regexp_replace(t, _PUNCT_RE, ""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.length(F.regexp_replace(t, r"\s+", "")) / n_tok)
        .otherwise(F.lit(0.0))
        .alias("mean_token_len"),
        F.when(F.length(t) > 0, n_punct / F.length(t)).otherwise(F.lit(0.0)).alias("punct_ratio"),
        F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-count argmax language guess with deterministic tie-break
    (higher count wins, then language code ascending)."""
    toks = tokens(F.col(text_col))

    def score(ws):
        # closure (not a default arg): Spark derives the lambda's variable
        # count from its signature, so it must stay single-parameter
        return F.size(F.filter(toks, lambda x: x.isin(*ws)))

    scores = [score(ws).alias(f"score_{lang}") for lang, ws in sorted(LANG_STOPWORDS.items())]
    scored = df.select(F.col(id_col).alias("doc_id"), *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.select(
        "doc_id",
        *[F.col(f"score_{lang}") for lang in langs],
        F.when(best > 0, pred).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min and max md5 over the
    lowercased char k-grams, plus the whole-document hash.  Identical
    min-gram fingerprints are a strong near-dup signal for prefix/suffix
    edits; the full hash catches exact dups."""
    low = F.lower(F.col(text_col))
    cnt = F.greatest(F.length(low) - (k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), cnt), lambda i: F.md5(F.substring(low, i, k)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("full_hash"),
        F.array_min(grams).alias("min_gram_hash"),
        F.array_max(grams).alias("max_gram_hash"),
    )
