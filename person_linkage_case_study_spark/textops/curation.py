"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: benchmark decontamination, PII scrubbing, and repetition
quality rules (Gopher-style).

These extend the reference's linkage scope (it stops at record linkage —
SURVEY.md §2.8, functions over the name/address columns); the same engine
idioms apply: pure column expressions where possible, one explode where
unavoidable, and broadcast joins against the small side.

Scale shapes (100 TB corpus, 1000-executor cluster):

* **Decontamination** — eval benchmarks are tiny (≲10⁷ n-grams even for a
  full eval-suite union), so the benchmark gram set broadcasts and the
  corpus side is one generate-and-probe scan: explode word n-grams,
  broadcast-semi/anti-join, re-aggregate by doc. NO shuffle of corpus
  text; the only wide op is the per-doc count aggregation, keyed by
  doc_id, which AQE coalesces to the natural output size.
* **PII scrubbing** — a narrow per-row projection (chained
  ``regexp_replace`` / ``regexp_count``), whole-stage-codegen'd; at
  cluster scale it is pure scan bandwidth. Patterns stay in the
  RE2-compatible subset (no backrefs/lookaround) so the same strings run
  on Spark (Java regex), DuckDB, and any RE2-based scrubber.
* **Repetition signals** — per-row array arithmetic over the token
  array; the mode-style counts use interpreted higher-order lambdas
  (O(distinct·n) per row), the right trade below ~10⁴ tokens/doc because
  it keeps the operator narrow (no explode shuffle). For corpora of
  book-length documents, switch to the explode + groupBy(doc, token)
  variant sketched in ``add_repetition_signals``'s docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

# ---------------------------------------------------------------------------
# decontamination


def word_ngrams(t: Column, n: int) -> Column:
    """Distinct word n-grams from a token-array column; documents shorter
    than ``n`` tokens yield an empty array (they cannot leak an n-gram).

    Like ``dedup.minhash.shingles_of_tokens``: per-position ``element_at``
    lookups, and the caller must pass a MATERIALIZED array column (the
    interpreted lambda re-evaluates its argument per position).
    """
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                ),
            )
        )
    )


def _doc_grams(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    spark = df.sparkSession
    return (
        df.select(id_col, tokens(F.col(text_col)).alias("__toks"))
        .repartition(spark.sparkContext.defaultParallelism, id_col)
        .select(id_col, F.explode(word_ngrams(F.col("__toks"), n)).alias("gram"))
    )


def benchmark_grams(
    benchmark: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-grams of the eval/benchmark set — the (small)
    broadcast side of decontamination."""
    return _doc_grams(benchmark, n, text_col, id_col).select("gram").distinct()

def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report: for every corpus document that
    shares at least one word ``n``-gram with the benchmark set, the number
    of distinct shared grams.

    Plan: corpus grams explode → broadcast-hash inner join against the
    distinct benchmark grams → count by doc. The corpus text is never
    shuffled; only (id, gram) hits reach the aggregation.
    """
    bench = F.broadcast(benchmark_grams(benchmark, n, text_col, id_col))
    hits = _doc_grams(docs, n, text_col, id_col).join(bench, on="gram")
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_contaminated_grams")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every document sharing any word ``n``-gram with the benchmark
    set (broadcast anti-join on the contaminated id set) — the standard
    eval-leakage guard before pretraining."""
    dirty = contamination_stats(docs, benchmark, n, text_col, id_col).select(id_col)
    return docs.join(F.broadcast(dirty), on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# PII scrubbing

# RE2-compatible subset (works identically on Spark/Java and DuckDB):
# no backreferences, no lookaround. Order matters — SSN before the broader
# phone pattern, phone before bare IP-like digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+[0-9]{1,2}[ .-][0-9]{3}[ .-][0-9]{3,4}([ .-][0-9]{2,4})?\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Mask emails / SSNs / phone numbers / IPv4 addresses in ``text_col``
    and count each category (``n_email`` …) BEFORE masking.

    One narrow projection: counts via ``regexp_count`` on the original
    text, then a chained ``regexp_replace`` in pattern order. Everything
    is JVM-side regex over the scan — no Python, no shuffle.
    """
    out = out_col or f"{text_col}_scrubbed"
    cols = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _, pat, tag in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    return df.select("*", *cols, scrubbed.alias(out))


def scrub_pii_sql(text_expr: str, out_alias: str) -> str:
    """DuckDB projection equivalent of :func:`scrub_pii` (same patterns,
    same order; RE2 needs the 'g' flag for replace-all)."""
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS INT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrubbed = text_expr
    for _, pat, tag in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{tag}', 'g')"
    return f"{counts}, {scrubbed} AS {out_alias}"


# ---------------------------------------------------------------------------
# repetition / Gopher-style quality rules


def add_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition rules over the token stream:

    * ``dup_bigram_frac`` — fraction of word bigrams that are repeats
      (1 − distinct/total); high values mean boilerplate loops.
    * ``top_token_frac`` — share of tokens taken by the single most
      frequent token (mode count / n).
    * ``repetition_ok`` — both under the published-ish thresholds
      (dup bigrams < 0.5, top token < 0.3).

    The mode count is an interpreted HOF pass (O(distinct·n) per row,
    fine for web-page-sized docs); for book-length corpora use the wide
    form instead: explode tokens → groupBy(id, token).count → max per id
    → join back (two shuffles, but linear per row).

    The token array is materialized as a projection attribute (``__t``)
    referenced by every lambda: interpreted HOF eval re-evaluates captured
    NON-attribute expressions once per element, so capturing the raw
    ``split`` expression would re-tokenize per distinct token. Multiple
    references to a non-cheap alias also stop ``CollapseProject`` from
    inlining it back.
    """
    t = F.col("__t")
    bg = word_ngrams(t, 2)  # distinct bigrams
    all_bg = F.when(F.size(t) < 2, F.lit(0)).otherwise(F.size(t) - 1)
    top = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda x: F.size(F.filter(t, lambda y: y == x)),
        )
    )
    return (
        df.withColumn("__t", tokens(F.col(text_col)))
        .withColumn(
            "dup_bigram_frac",
            F.round(
                F.when(all_bg > 0, 1.0 - F.size(bg) / all_bg).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn(
            "top_token_frac",
            F.round(
                F.when(F.size(t) > 0, top / F.size(t)).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .withColumn(
            "repetition_ok",
            (F.col("dup_bigram_frac") < 0.5) & (F.col("top_token_frac") < 0.3),
        )
        .drop("__t")
    )
