"""Cavnar-Trenkle langid (operators/langid.py): fit differential vs a
plain-Python mirror, classification behavior on distinct synthetic
languages, zero-gram NULL, determinism, and streaming==batch."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from argostats_spark.operators.langid import (
    char_grams_py,
    langid_fit,
    langid_score_rows,
    rank_profile,
)

# two synthetic "languages" with genuinely different character stats
EN_WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
            "dog", "with", "sound", "judgement", "and", "strong", "will"]
DE_WORDS = ["der", "schnelle", "braune", "fuchs", "springt", "ueber",
            "den", "faulen", "hund", "mit", "starkem", "willen", "und",
            "zuversicht"]


def _mk(words, n_docs, n_words, seed):
    rng = random.Random(seed)
    return [" ".join(rng.choices(words, k=n_words)) for _ in range(n_docs)]


def test_fit_matches_python_mirror(spark):
    en = _mk(EN_WORDS, 8, 30, 1)
    de = _mk(DE_WORDS, 8, 30, 2)
    rows = [(t, "en") for t in en] + [(t, "de") for t in de]
    df = spark.createDataFrame(rows, "text string, lang string")
    got = langid_fit(df, top_k=100)

    for lang, corpus in (("en", en), ("de", de)):
        grams: list[str] = []
        for t in corpus:
            grams.extend(char_grams_py(t, 3))
        want = rank_profile(grams, 100)
        assert got[lang] == want, lang


def test_classification_and_row_semantics(spark):
    fit_rows = (
        [(t, "en") for t in _mk(EN_WORDS, 12, 40, 3)]
        + [(t, "de") for t in _mk(DE_WORDS, 12, 40, 4)]
    )
    fit_df = spark.createDataFrame(fit_rows, "text string, lang string")
    profiles = langid_fit(fit_df, top_k=200)
    assert set(profiles) == {"en", "de"}

    held = spark.createDataFrame(
        [
            (0, " ".join(_mk(EN_WORDS, 1, 25, 5))),
            (1, " ".join(_mk(DE_WORDS, 1, 25, 6))),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["lang_pred"], r["lang_dist"])
           for r in langid_score_rows(held, profiles, top_k=200).collect()}
    assert out[0][0] == "en" and out[1][0] == "de"
    assert out[2] == (None, None) and out[3] == (None, None)
    cols = langid_score_rows(held, profiles).columns
    assert cols == ["doc_id", "text", "lang_pred", "lang_dist"]


def test_streaming_equals_batch(spark, tmp_path):
    fit_df = spark.createDataFrame(
        [(t, "en") for t in _mk(EN_WORDS, 6, 30, 7)]
        + [(t, "de") for t in _mk(DE_WORDS, 6, 30, 8)],
        "text string, lang string",
    )
    profiles = langid_fit(fit_df, top_k=150)
    new = spark.createDataFrame(
        [(0, " ".join(_mk(EN_WORDS, 1, 20, 9))),
         (1, " ".join(_mk(DE_WORDS, 1, 20, 10)))],
        "doc_id long, text string",
    )
    src = str(tmp_path / "in")
    new.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    batch = {r["doc_id"]: (r["lang_pred"], r["lang_dist"]) for r in
             langid_score_rows(spark.read.parquet(src), profiles).collect()}
    stream = langid_score_rows(
        spark.readStream.schema(schema).parquet(src), profiles
    )
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("lid_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: (r["lang_pred"], r["lang_dist"]) for r in
               spark.sql("SELECT * FROM lid_stream").collect()}
    finally:
        q.stop()
    assert got == batch


def test_empty_profiles_rejected(spark):
    import pytest

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty profiles"):
        langid_score_rows(df, {})


def test_inverted_scoring_equals_naive_loop(spark):
    """The vectorized union-profile scorer (per-row cost independent of
    language count) must agree with the textbook lang-outer loop on
    every document: same winning language AND same distance, ties
    included (review finding r8)."""
    rng = random.Random(77)
    fit_rows = (
        [("en", t) for t in _mk(EN_WORDS, 20, 12, 1)]
        + [("de", t) for t in _mk(DE_WORDS, 20, 12, 2)]
        + [("xx", t) for t in _mk([w[::-1] for w in EN_WORDS], 20, 12, 3)]
    )
    fit = spark.createDataFrame(fit_rows, "lang string, text string")
    profiles = langid_fit(fit, top_k=50)
    assert len(profiles) == 3

    def naive(t, top_k=50, n=3):
        grams = char_grams_py(t, n)
        if not grams:
            return None
        doc = rank_profile(grams, top_k)
        best = None
        for lang in sorted(profiles):
            d = 0
            for g_, r_ in doc.items():
                pr = profiles[lang].get(g_)
                d += abs(r_ - pr) if pr is not None else top_k
            if best is None or d < best[0]:
                best = (d, lang)
        return best[1], best[0]

    # score a mix: in-distribution, mixed, out-of-vocabulary, empty
    texts = (
        _mk(EN_WORDS, 5, 8, 4) + _mk(DE_WORDS, 5, 8, 5)
        + [" ".join(rng.choices(EN_WORDS + DE_WORDS, k=10)) for _ in range(5)]
        + ["zzzz qqqq 0101", ""]
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["lang_pred"], r["lang_dist"])
           for r in langid_score_rows(docs, profiles, top_k=50).collect()}
    for i, t in enumerate(texts):
        want = naive(t)
        if want is None:
            assert got[i] == (None, None), i
        else:
            assert got[i] == want, (i, t[:30], got[i], want)
