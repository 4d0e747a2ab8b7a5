"""Text analysis operators for large-scale training-data pipelines:
tokenization, token counting (whitespace + BPE-ish regex), quality
scoring, language ID (stopword-hit heuristic), document fingerprinting.

All but the rolling-hash fingerprint are pure JVM-side expressions
(whole-stage codegen, no Python in the hot path) and have exact DuckDB
SQL oracles in ``__spark_entry__.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
# Spark SQL string literals process backslash escapes -> double them
_BPE_SQL = BPE_ISH_REGEX.replace("\\", "\\\\")

# small public stopword lists (top function words per language)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "des", "une", "dans", "que"],
}


def tokens_col(text: Column) -> Column:
    """Lower-cased whitespace tokens; empty/null text -> empty array."""
    trimmed = F.trim(F.lower(F.coalesce(text, F.lit(""))))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text_col_name: str) -> Column:
    """Count of BPE-ish sub-tokens: letter runs, digit runs, single
    punctuation marks — a cheap, deterministic proxy for subword
    tokenizer counts."""
    return F.size(
        F.expr(f"regexp_extract_all(coalesce({text_col_name}, ''), '{_BPE_SQL}', 0)")
    )


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(__toks, t -> t IN ({in_list})))")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics in one projection pass:
    n_chars, n_tokens, n_bpe_tokens, alpha_ratio, punct_ratio,
    stopword_ratio, mean_token_len, quality_score (in [0,1])."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    out = (
        df.withColumn("__toks", tokens_col(F.col(text_col)))
        .withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", F.size(F.col("__toks")).cast("long"))
        .withColumn(
            "n_bpe_tokens",
            F.size(F.expr(f"regexp_extract_all(coalesce({text_col}, ''), '{_BPE_SQL}', 0)")).cast("long"),
        )
        .withColumn("alpha_ratio", F.round(alpha / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn(
            "stopword_ratio",
            F.round(
                _stopword_hits(F.col("__toks"), STOPWORDS["en"])
                / F.greatest(F.size("__toks"), F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                (F.length(F.regexp_replace(F.trim(text), r"\s+", "")))
                / F.greatest(F.size("__toks"), F.lit(1)),
                6,
            ),
        )
    )
    # simple bounded quality score: length sweet spot + alpha share +
    # stopword presence - punctuation excess
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.3
        + F.col("alpha_ratio") * 0.3
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(4.0), F.lit(1.0))) * 0.1
    )
    # tie-stable round-4: round(x*1e4)/1e4 makes Spark and DuckDB apply
    # the SAME decimal decision to the SAME double (Spark's round(x, 4)
    # rounds the exact binary expansion via BigDecimal, DuckDB's
    # round() multiplies then rounds — they disagree on .XXXX5 ties of
    # the weighted sum of 6-rounded components)
    return out.withColumn(
        "quality_score", F.round(score * F.lit(10000.0)) / F.lit(10000.0)
    ).drop("__toks")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free stopword-hit language ID over {en, es, de, fr};
    deterministic alphabetical tiebreak, 'und' (undetermined) when no
    stopword hits at all."""
    out = df.withColumn("__toks", tokens_col(F.col(text_col)))
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"__hits_{lang}", _stopword_hits(F.col("__toks"), words))
    langs = sorted(STOPWORDS)  # alphabetical tiebreak
    best = F.greatest(*[F.col(f"__hits_{lang}") for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(
            (best > 0) & (F.col(f"__hits_{lang}") == best), F.lit(lang)
        ).otherwise(expr)
    out = out.withColumn("lang_pred", expr)
    return out.drop("__toks", *[f"__hits_{lang}" for lang in langs])


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str = "text",
                    window: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: minimum 64-bit polynomial rolling
    hash over all ``window``-char substrings of the normalized text
    (Karp-Rabin). Arrow-batched pandas UDF — the vectorized numpy
    kernel hashes the whole batch; not SQL-expressible (rows-only
    oracle)."""
    B = np.uint64(1000003)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
    # hash_j = sum_k b[j+k] * B^(window-1-k) — constant across rows,
    # hoisted out of the per-row loop (r06)
    POWERS = np.array([B ** np.uint64(window - 1 - k) for k in range(window)],
                      dtype=np.uint64)

    @F.pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            s = " ".join(str(t or "").lower().split())
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if b.size < window:
                h = np.uint64(0)
                for ch in b:
                    h = (h * B + ch) & MASK
                out[i] = np.int64(h)
                continue
            powers = POWERS
            windows = np.lib.stride_tricks.sliding_window_view(b, window)
            hashes = (windows * powers).sum(axis=1, dtype=np.uint64)
            out[i] = np.int64(hashes.min())
        return pd.Series(out)

    return df.withColumn("fingerprint", fp(F.col(text_col)))


def repetition_stats(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition quality signals, pure JVM (one
    projection pass, whole-stage codegen — higher-order array
    functions, no Python):

    - dup_token_frac: 1 - distinct/total over whitespace tokens;
    - dup_trigram_frac: same over word 3-grams (the standard
      "repeated n-gram" filter for machine-generated / boilerplate
      text at pretraining scale).

    Empty/sub-3-token documents score 0.0 by definition. Exact DuckDB
    oracle (list_distinct twin): integer-ratio doubles are identical
    across engines, no rounding needed.
    """
    toks = tokens_col(F.col(text_col))
    out = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    tris = F.when(
        n >= 3,
        F.expr("transform(sequence(1, size(__toks) - 2), "
               "i -> concat_ws(' ', slice(__toks, i, 3)))"),
    ).otherwise(F.array().cast("array<string>"))
    out = out.withColumn("__tris", tris)
    nt = F.size("__tris")
    return out.select(
        id_col,
        n.alias("n_tokens"),
        nt.alias("n_trigrams"),
        F.when(n > 0, F.lit(1.0) - F.size(F.array_distinct("__toks"))
               .cast("double") / n).otherwise(F.lit(0.0)).alias("dup_token_frac"),
        F.when(nt > 0, F.lit(1.0) - F.size(F.array_distinct("__tris"))
               .cast("double") / nt).otherwise(F.lit(0.0)).alias("dup_trigram_frac"),
    )
