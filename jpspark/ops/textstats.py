"""Text-analysis operators for the documents table: language ID, quality
scoring, token counting, document fingerprinting.

Everything here is pure Column algebra (JVM-side, codegen'd) so it runs at
scan speed with predicate pushdown intact — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def token_count(col: Column) -> Column:
    """Whitespace tokenization count (0 for empty/blank)."""
    return F.when(F.trim(col) == "", 0).otherwise(F.size(F.split(F.trim(col), r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs, and
    punctuation singletons (the regex families BPE merges start from)."""
    stripped = F.regexp_replace(col, r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]", "x")
    return F.length(F.regexp_replace(stripped, r"\s+", ""))


def ascii_ratio(col: Column) -> Column:
    return F.when(F.length(col) == 0, F.lit(1.0)).otherwise(
        F.length(F.regexp_replace(col, "[^\\x00-\\x7F]", "")) / F.length(col)
    )


def lang_id_heuristic(col: Column) -> Column:
    """N-gram/script heuristic language ID: CJK chars -> 'zh'; high
    non-ASCII ratio -> 'other'; else stopword sniff for 'en'."""
    cjk = F.length(F.regexp_replace(col, "[^\\u4E00-\\u9FFF]", ""))
    has_en_stop = F.regexp_like(
        F.concat(F.lit(" "), F.lower(col), F.lit(" ")),
        F.lit(r".*\s(the|and|of|is)\s.*"),
    )
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(ascii_ratio(col) < 0.7, F.lit("other"))
        .when(has_en_stop, F.lit("en"))
        .otherwise(F.lit("latin"))
    )


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: length, token count, mean word length,
    punctuation ratio, stopword ratio, all-caps ratio."""
    t = F.col(text_col)
    n_tok = token_count(t)
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    stop_pattern = "|".join(STOPWORDS)
    words_lower = F.split(F.lower(F.trim(t)), r"\s+")
    n_stop = F.size(F.filter(words_lower, lambda w: w.rlike(f"^({stop_pattern})$")))
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round((F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tok, F.lit(1))), 4).alias(
            "mean_word_len"
        ),
        F.round(punct / F.greatest(F.length(t), F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite 0..1 quality score from the features (heuristic weights
    fixed; deterministic)."""
    f = quality_features(docs, text_col, id_col)
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
    )
    return f.withColumn("quality", F.round(score, 4))


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text. Stable under formatting noise."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def rolling_hashes(col: Column, window: int = 8) -> Column:
    """Winnowing-style window fingerprints: array of xxhash64 values of
    each ``window``-word sliding n-gram (for containment/overlap detection;
    the distributed analog of MOSS fingerprinting)."""
    words = F.split(F.trim(col), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window)))
    )
