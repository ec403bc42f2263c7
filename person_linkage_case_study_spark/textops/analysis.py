"""Text analysis for training-data pipelines.

Beyond the reference's linkage scope: the document-corpus operators a
100 TB text pipeline needs — token statistics, quality scoring, language
identification, content fingerprinting. Everything is built-in column
expressions (JVM codegen, no Python in the row path); these run as one
narrow projection over the documents table, so at cluster scale they are
pure scan-bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "por"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string> (empty
    array for empty/blank text)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: words plus digit runs plus punctuation
    marks counted separately (a cheap stand-in for BPE token counting —
    the regex matches what a byte-level BPE would split on)."""
    return F.size(
        F.filter(
            F.split(col, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: (t != "") & (t != " "),
        )
    )


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(t))
        .withColumn(
            "avg_token_len",
            F.when(
                F.size(t) > 0,
                F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
                / F.size(t),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("n_chars_measured", F.length(F.col(text_col)))
    )


def add_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: length, punctuation density, stopword
    ratio, digit density — the standard pre-training corpus filters."""
    text = F.col(text_col)
    t = tokens(text)
    n_chars = F.length(text)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(t, stop))
    return (
        df.withColumn(
            "punct_ratio",
            F.when(
                n_chars > 0,
                F.length(F.regexp_replace(text, r"[^.,;:!?'\"]", "")) / n_chars,
            ).otherwise(0.0),
        )
        .withColumn(
            "digit_ratio",
            F.when(
                n_chars > 0, F.length(F.regexp_replace(text, r"[^0-9]", "")) / n_chars
            ).otherwise(0.0),
        )
        .withColumn(
            "stopword_ratio",
            F.when(F.size(t) > 0, n_stop / F.size(t)).otherwise(0.0),
        )
        .withColumn(
            "quality_ok",
            (n_chars >= 20)
            & (F.size(t) >= 5)
            & (F.col("punct_ratio") < 0.3)
            & (F.col("digit_ratio") < 0.3),
        )
    )


def add_language_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: count distinct marker hits per language
    over the token set, pick the argmax (ties broken by language code) —
    'und' when nothing matches. Pure array built-ins."""
    t = F.array_distinct(tokens(F.lower(F.col(text_col))))
    out = df
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out = out.withColumn(f"__hits_{lang}", F.size(F.array_intersect(t, marker_arr)))
    # argmax via greatest + chained when (deterministic tie order: code asc)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"__hits_{l}") for l in langs])
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(
            (best > 0) & (F.col(f"__hits_{lang}") == best), F.lit(lang)
        ).otherwise(guess)
    # reversed + overwrite order gives the alphabetically-first winner
    out = out.withColumn("lang_guess", guess)
    return out.drop(*[f"__hits_{l}" for l in langs])


def add_rolling_fingerprint(
    df: DataFrame, text_col: str = "text", modulus: int = 1_000_000_007
) -> DataFrame:
    """Deterministic polynomial rolling hash of the normalized text
    (document fingerprinting for dedup/citation): fold over characters of
    lower(trim(text)) with acc = (acc*31 + ascii(ch)) mod M. Expressed with
    ``aggregate``/``transform`` so it runs inside codegen; the same fold is
    SQL-expressible for the DuckDB oracle (list_reduce)."""
    chars = F.split(F.lower(F.trim(F.col(text_col))), "")
    fp = F.aggregate(
        F.transform(chars, lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % modulus,
    )
    return df.withColumn("fingerprint64", fp)
