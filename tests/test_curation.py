"""Corpus-curation operators: decontamination, PII scrubbing, repetition."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.textops.curation import (
    add_repetition_signals,
    contamination_stats,
    decontaminate,
    scrub_pii,
    word_ngrams,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta other words here"),  # shares a 4-gram w/ 1
            (3, "completely different text with no overlap at all"),
            (4, "short doc"),  # < n tokens -> no grams
            (5, ""),
        ],
        ["doc_id", "text"],
    )


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], ["text"])
    from person_linkage_case_study_spark.textops.analysis import tokens

    out = df.select(word_ngrams(tokens(F.col("text")), 3).alias("g")).collect()
    assert sorted(out[0]["g"]) == ["a b c", "b c d"]
    assert out[1]["g"] == []
    assert out[2]["g"] == []


def test_contamination_and_decontaminate(corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    rest = corpus.filter(F.col("doc_id") != 1)
    stats = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in contamination_stats(rest, bench, n=4).collect()
    }
    # doc 2 shares exactly "alpha beta gamma delta"
    assert stats == {2: 1}
    clean = decontaminate(rest, bench, n=4)
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4, 5]


def test_contamination_plan_broadcasts(corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    plan = contamination_stats(corpus, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@work.example.org today"),
            (2, "ssn 123-45-6789 phone +1 555 0042 ip 10.0.3.7"),
            (3, "nothing sensitive here"),
            (4, None),
        ],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["n_email"] == 1 and "<EMAIL>" in rows[1]["text_scrubbed"]
    assert "jo.doe" not in rows[1]["text_scrubbed"]
    r2 = rows[2]
    assert (r2["n_ssn"], r2["n_phone"], r2["n_ipv4"]) == (1, 1, 1)
    assert r2["text_scrubbed"] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert rows[3]["text_scrubbed"] == "nothing sensitive here"
    assert rows[4]["text_scrubbed"] is None


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # one token repeated
            (2, "a b a b a b"),  # bigrams all repeats of 2 distinct
            (3, "all tokens here are unique words"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in add_repetition_signals(df).collect()}
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == pytest.approx(1 - 1 / 3)
    # doc 2: 5 bigrams, 2 distinct ("a b", "b a")
    assert rows[2]["dup_bigram_frac"] == pytest.approx(1 - 2 / 5)
    assert rows[3]["dup_bigram_frac"] == 0.0
    assert rows[3]["repetition_ok"] is True
    assert rows[1]["repetition_ok"] is False
    assert rows[4]["top_token_frac"] == 0.0


def test_curation_projection_streams(spark, tmp_path_factory):
    """scrub_pii + quality/repetition signals are stateless projections, so
    the exact same operators run on a readStream source; stream == batch."""
    import shutil

    from person_linkage_case_study_spark.streaming.stream import run_stream_to_memory
    from person_linkage_case_study_spark.textops.analysis import add_quality_signals

    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy("/root/testdata/sf0.001/documents.parquet", d / "documents.parquet")
    batch_src = spark.read.parquet(str(d))
    stream_src = spark.readStream.schema(batch_src.schema).parquet(str(d))

    def curate(df):
        return add_repetition_signals(
            add_quality_signals(scrub_pii(df))
        ).select(
            "doc_id", "n_email", "quality_ok", "dup_bigram_frac", "text_scrubbed"
        )

    got = {r["doc_id"]: r for r in run_stream_to_memory(
        curate(stream_src), "curation_stream_test", output_mode="append"
    ).collect()}
    want = {r["doc_id"]: r for r in curate(batch_src).collect()}
    assert got == want and len(got) > 0


def test_mixture_upsample_streams(spark, tmp_path_factory):
    """mixture_upsample is a stateless per-row explode (literal CASE
    weight + content-hash decision), so it runs unchanged on a streaming
    source; stream output == batch output, copies included."""
    import shutil

    from person_linkage_case_study_spark.operators.sampling import mixture_upsample
    from person_linkage_case_study_spark.streaming.stream import run_stream_to_memory

    d = tmp_path_factory.mktemp("docs_mix_stream")
    shutil.copy("/root/testdata/sf0.001/documents.parquet", d / "documents.parquet")
    batch_src = spark.read.parquet(str(d))
    stream_src = spark.readStream.schema(batch_src.schema).parquet(str(d))
    weights = {"en": 0.5, "de": 2.5, "fr": 1.2, "es": 1.0, "zh": 0.9}

    def mix(df):
        return mixture_upsample(df, "lang", weights, ["doc_id"], seed=3).select(
            "doc_id", "lang", "copy_idx"
        )

    got = {
        (r["doc_id"], r["copy_idx"])
        for r in run_stream_to_memory(
            mix(stream_src), "mixture_stream_test", output_mode="append"
        ).collect()
    }
    want = {(r["doc_id"], r["copy_idx"]) for r in mix(batch_src).collect()}
    assert got == want and len(got) > 0
