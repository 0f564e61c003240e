"""Sampling operators (operators/sampling.py) — the pieces not already
pinned through the registry parity rows: temperature mixing quota math,
clamping, and determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.sampling import temperature_mixture


@pytest.fixture(scope="module")
def skewed(spark):
    # 400 'en', 100 'de', 25 'fr' — a 16:4:1 skew
    rows = (
        [(i, "en") for i in range(400)]
        + [(400 + i, "de") for i in range(100)]
        + [(500 + i, "fr") for i in range(25)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string").cache()


def _quota(counts: dict, alpha: float, target: int) -> dict:
    z = sum(c ** alpha for _, c in sorted(counts.items()))
    return {
        s: min(c, math.ceil(round(target * (c ** alpha) / z, 6)))
        for s, c in counts.items()
    }


def test_alpha_half_flattens(spark, skewed):
    counts = {"en": 400, "de": 100, "fr": 25}
    out = temperature_mixture(skewed, "lang", alpha=0.5).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    assert got == _quota(counts, 0.5, 525)
    # flattening: fr's kept share must exceed its raw 25/525 share
    assert got["fr"] / sum(got.values()) > 25 / 525
    # and sqrt weighting keeps the ordering but compresses the ratio
    assert got["en"] > got["de"] > got["fr"]
    assert got["en"] / got["fr"] < 400 / 25


def test_alpha_one_is_proportional(spark, skewed):
    out = temperature_mixture(skewed, "lang", alpha=1.0).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    # target = corpus size and p_s = n_s/N -> every stratum kept whole
    assert got == {"en": 400, "de": 100, "fr": 25}


def test_target_rows_and_clamp(spark, skewed):
    # alpha=0 is uniform weight: target/3 per stratum, clamped at n_s
    out = temperature_mixture(
        skewed, "lang", alpha=0.0, target_rows=300
    ).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    assert got == {"en": 100, "de": 100, "fr": 25}  # fr clamped, no refill


def test_deterministic_and_prefix_stable(spark, skewed):
    a = {r["doc_id"] for r in temperature_mixture(skewed, "lang", 0.5).collect()}
    b = {r["doc_id"] for r in temperature_mixture(
        skewed.repartition(7), "lang", 0.5).collect()}
    assert a == b  # content-addressed: partitioning-independent
    # a smaller target selects a PREFIX of the same hash order
    small = {r["doc_id"] for r in temperature_mixture(
        skewed, "lang", 0.5, target_rows=100).collect()}
    assert small <= a


def test_alpha_validation(spark, skewed):
    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture(skewed, "lang", alpha=-0.1)


def test_materialize_packs_roundtrip(spark):
    """chunk -> pack -> materialize: every token of every document
    lands in exactly one pack, in assignment order, and per-pack token
    totals respect the budget bound (first member may straddle)."""
    from argostats_spark.operators.sampling import (
        chunk_documents, materialize_packs, pack_chunks,
    )

    texts = {
        0: " ".join(f"a{i}" for i in range(23)),
        1: " ".join(f"b{i}" for i in range(7)),
        2: " ".join(f"c{i}" for i in range(15)),
    }
    df = spark.createDataFrame(
        [(i, "en", t) for i, t in texts.items()],
        "doc_id long, lang string, text string",
    )
    chunks = chunk_documents(df, chunk_tokens=6, stride=6, carry_cols=("lang",)) \
        .withColumnRenamed("chunk_id", "window_id")
    packed = pack_chunks(
        chunks, "n_chunk_tokens", 10, "lang", ["doc_id", "window_id"]
    ).withColumnRenamed("chunk_id", "pack_id")
    packs = materialize_packs(
        packed, "chunk_text", "lang", pack_col="pack_id",
        order_col=["doc_id", "window_id"], separator=" | ",
    ).collect()

    # lossless + ordered: re-splitting the packs in pack_id order
    # reproduces the exact chunk stream, which reproduces every token
    stream = []
    for r in sorted(packs, key=lambda r: r["pack_id"]):
        stream.extend(r["pack_text"].split(" | "))
    expect = [
        r["chunk_text"]
        for r in packed.orderBy("doc_id", "window_id").collect()
    ]
    assert stream == expect
    joined = " ".join(stream).split()
    assert joined == " ".join(texts[i] for i in sorted(texts)).split()
    # budget bound: each pack's exclusive prefix was < 10 tokens, so
    # token count < 10 + last member's tokens (<= 6)
    for r in packs:
        assert len(r["pack_text"].replace(" | ", " ").split()) < 16
