"""Text analysis operators `[EXT]` — language-ID, quality scoring, token
counting, fingerprinting over the `documents` table.

These are the BASELINE.json-mandated LLM-data-pipeline extensions beyond
the reference's own surface (SURVEY §2 [EXT]). Everything is built from
JVM-side `pyspark.sql.functions` string/array expressions — no Python in
the row path — so a 100 TB documents scan stays inside whole-stage
codegen and the filters push down.

Every operator has an exact DuckDB SQL twin (queries_ext.py) built from
the same primitives (lower/regexp/split/md5), which keeps the driver's
hash-compare green.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword profiles for the n-gram/stopword heuristic.
# Deterministic + tiny: the point is the operator shape (broadcast profile
# × token overlap scoring), not linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "他"],
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/number/punct segmentation (GPT-2-style coarse classes).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(col)), TOKEN_SPLIT_RE)


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish token count: words + numbers + individual punctuation —
    a deterministic proxy for subword tokenizer cost accounting."""
    col = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """How many tokens are stopwords of `lang`."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def lang_scores(col: Column | str) -> Column:
    """Map lang → stopword-hit count; argmax is the language guess."""
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_STOPWORDS]),
        F.array(*[stopword_hits(col, lang) for lang in LANG_STOPWORDS]),
    )


def lang_guess(col: Column | str) -> Column:
    """Language with the most stopword hits; ties break alphabetically;
    'und' (undetermined) when no stopword matches at all."""
    col = F.col(col) if isinstance(col, str) else col
    best = None
    best_score = None
    for lang in sorted(LANG_STOPWORDS):
        s = stopword_hits(col, lang)
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add deterministic quality-scoring features: char/token counts,
    punctuation + digit + whitespace ratios, mean token length,
    uppercase ratio — the standard pre-training quality filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens(t)
    n_tokens = F.size(toks)
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_tokens_bpe", token_count_bpe_ish(t).cast("long"))
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
            / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn(
            "digit_ratio",
            F.length(F.regexp_replace(t, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn(
            "space_ratio",
            F.length(F.regexp_replace(t, r"[^ ]", "")) / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn(
            "mean_token_len",
            F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
        )
        .withColumn(
            "upper_ratio",
            F.length(F.regexp_replace(t, r"[^A-Z]", "")) / F.greatest(n_chars, F.lit(1)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the features — a fixed linear
    rubric (reproducible; weights are policy, not learned)."""
    feats = quality_features(df, text_col)
    score = (
        F.lit(1.0)
        - F.least(F.lit(1.0), F.col("punct_ratio") * 4)* F.lit(0.25)
        - F.least(F.lit(1.0), F.col("digit_ratio") * 4) * F.lit(0.25)
        - F.when((F.col("n_tokens") < 5) | (F.col("n_tokens") > 10000), 0.25)
        .otherwise(0.0)
        - F.when((F.col("mean_token_len") < 2) | (F.col("mean_token_len") > 12), 0.25)
        .otherwise(0.0)
    )
    # no rounding: identical arithmetic order in the SQL twin makes the raw
    # double bit-identical; rounding could diverge at ties (HALF_UP vs even)
    return feats.withColumn("quality", score)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint = md5 of normalized text
    (content-defined identity for exact dedup across engines)."""
    return F.md5(normalize_text(col))
