"""JSONL ingestion (sources/jsonl.py): schema enforcement, corrupt-line
quarantine, and write/read roundtrip."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from argostats_spark.sources.jsonl import read_jsonl, write_jsonl

SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "part-000.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        json.dumps({"doc_id": 2, "text": "guten tag", "lang": "de"}),
        '{"doc_id": 3, "text": "truncated',          # malformed JSON
        "not json at all",                            # garbage line
        json.dumps({"doc_id": 4, "text": None, "lang": "fr"}),  # null field ok
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_split_good_and_quarantine(spark, corpus_path):
    good, bad = read_jsonl(spark, corpus_path, SCHEMA)
    g = {r["doc_id"]: r for r in good.collect()}
    assert set(g) == {1, 2, 4}
    assert good.columns == ["doc_id", "text", "lang"]  # no corrupt col
    assert g[4]["text"] is None                         # nulls are data
    raws = sorted(r["raw_line"] for r in bad.collect())
    assert raws == ["not json at all", '{"doc_id": 3, "text": "truncated']


def test_quarantine_off_drops_silently(spark, corpus_path):
    good, bad = read_jsonl(spark, corpus_path, SCHEMA, quarantine=False)
    assert bad is None
    assert good.count() == 3


def test_reserved_column_rejected(spark, corpus_path):
    clash = StructType(list(SCHEMA.fields) + [
        StructField("_corrupt_record", StringType())
    ])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, corpus_path, clash)


def test_write_read_roundtrip(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jsonl_rt") / "dump")
    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c d", "de")], "doc_id long, text string, lang string"
    )
    write_jsonl(df, out)  # gzip default
    assert any(f.endswith(".gz") for f in os.listdir(out))
    back, bad = read_jsonl(spark, out, SCHEMA)
    assert bad.count() == 0
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == [
        (1, "a b"), (2, "c d"),
    ]


def test_streaming_matches_batch(spark, corpus_path, tmp_path_factory):
    """read_jsonl_stream over the same files equals the batch split:
    good rows identical, corrupt raw lines identical, flag routing at
    the sink."""
    import shutil

    from argostats_spark.sources.jsonl import read_jsonl_stream
    from argostats_spark.streaming.events import run_to_memory

    d = tmp_path_factory.mktemp("jsonl_stream")
    shutil.copy(corpus_path, d / "part-000.jsonl")
    stream = read_jsonl_stream(spark, str(d), SCHEMA)
    assert stream.isStreaming
    q = run_to_memory(stream, "jsonl_stream", output_mode="append")
    try:
        rows = spark.table("jsonl_stream").collect()
    finally:
        q.stop()
    good = {r["doc_id"]: r for r in rows if not r["is_corrupt"]}
    bad = sorted(r["raw_line"] for r in rows if r["is_corrupt"])
    bgood, bbad = read_jsonl(spark, corpus_path, SCHEMA)
    assert set(good) == {r["doc_id"] for r in bgood.collect()}
    assert bad == sorted(r["raw_line"] for r in bbad.collect())
    for r in rows:
        if r["is_corrupt"]:
            assert r["doc_id"] is None and r["text"] is None
