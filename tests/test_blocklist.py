"""Blocklist matching (operators/blocklist.py): the broadcast n-gram
join path and the Aho-Corasick row-local path must agree with each
other AND with a naive per-phrase sliding count, on crafted word-
boundary / overlap / prefix cases and on randomized corpora."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.blocklist import (
    blocklist_flags_rows,
    blocklist_hits,
)


def _naive(text: str, phrases: list[str]) -> int:
    tk = [t for t in (text or "").lower().split() if t]
    total = 0
    for p in phrases:
        ptk = [t for t in p.lower().split() if t]
        if not ptk:
            continue
        for i in range(len(tk) - len(ptk) + 1):
            if tk[i:i + len(ptk)] == ptk:
                total += 1
    return total


PHRASES = ["ass", "bad word", "very bad word", "spam", "spam spam", "xx yy"]
DOCS = [
    (0, "this class has mass but no profanity"),      # boundary: 0 hits
    (1, "an ASS appeared"),                            # case-insensitive: 1
    (2, "bad word here and a very bad word there"),   # overlap+prefix: 2+1+1...
    (3, "spam spam spam"),                             # 3x spam + 2x "spam spam"
    (4, ""),                                           # empty
    (5, None),                                         # NULL text
    (6, "xx yy xx yy"),                                # 2 two-token hits
]


def test_crafted_semantics_and_path_equality(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    want = {i: _naive(t, PHRASES) for i, t in DOCS}
    # sanity on the crafted intent
    assert want[0] == 0 and want[1] == 1 and want[3] == 5 and want[6] == 2
    # doc 2: "bad word" twice + "very bad word" once = 3
    assert want[2] == 3

    jo = {r["doc_id"]: r["n_hits"] for r in blocklist_hits(df, PHRASES).collect()}
    ro = {r["doc_id"]: r["n_hits"] for r in
          blocklist_flags_rows(df, PHRASES).collect()}
    assert jo == want
    assert ro == want

    blocked = {r["doc_id"]: r["blocked"] for r in
               blocklist_hits(df, PHRASES).collect()}
    assert blocked == {i: n > 0 for i, n in want.items()}
    # row path keeps row shape and all rows
    rows = blocklist_flags_rows(df, PHRASES)
    assert rows.columns == ["doc_id", "text", "n_hits", "blocked"]
    assert rows.count() == len(DOCS)


def test_randomized_differential(spark):
    rng = random.Random(23)
    vocab = ["a", "b", "cc", "dd", "e", "ff"]
    phrases = [" ".join(rng.choices(vocab, k=rng.randint(1, 3)))
               for _ in range(12)]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 40))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # dedup phrases the way the operator does before naive-counting
    uniq = sorted({tuple(p.split()) for p in phrases})
    uphr = [" ".join(p) for p in uniq]
    want = {i: _naive(t, uphr) for i, t in docs}
    jo = {r["doc_id"]: r["n_hits"] for r in blocklist_hits(df, phrases).collect()}
    ro = {r["doc_id"]: r["n_hits"] for r in
          blocklist_flags_rows(df, phrases).collect()}
    assert jo == want
    assert ro == want


def test_streaming_rows_path(spark, tmp_path):
    df = spark.createDataFrame(DOCS[:5], "doc_id long, text string")
    src = str(tmp_path / "in")
    df.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    batch = {r["doc_id"]: r["n_hits"] for r in
             blocklist_flags_rows(spark.read.parquet(src), PHRASES).collect()}
    stream = blocklist_flags_rows(
        spark.readStream.schema(schema).parquet(src), PHRASES
    )
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("bl_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r["n_hits"] for r in
               spark.sql("SELECT * FROM bl_stream").collect()}
    finally:
        q.stop()
    assert got == batch


def test_empty_phrase_list_rejected(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no non-empty phrases"):
        blocklist_hits(df, ["", "   "])


def test_nbsp_tokenization_paths_agree(spark):
    """Review finding (round 7): NBSP (U+00A0) is NOT a token break for
    the engine tokenizer (Java \\s+ is ASCII-only) — Python str.split()
    would break on it and make the row path over-match. Both paths must
    treat 'foo\\u00a0bad' as ONE token: zero hits."""
    df = spark.createDataFrame(
        [(0, "foo bad"), (1, "foo bad"), (2, "bad word here")],
        "doc_id long, text string",
    )
    phrases = ["bad", "bad word"]
    jo = {r["doc_id"]: r["n_hits"] for r in blocklist_hits(df, phrases).collect()}
    ro = {r["doc_id"]: r["n_hits"] for r in
          blocklist_flags_rows(df, phrases).collect()}
    assert jo == ro == {0: 0, 1: 1, 2: 0}
