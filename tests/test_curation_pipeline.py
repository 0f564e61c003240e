"""End-to-end score-at-ingest composition (round 7): the engine's whole
stateless-scorer stack — JSONL ingest with quarantine → unigram-LM NLL
(lm_score_rows) → DSIR importance logweight (dsir_score_rows) →
fastText-style classifier probability (quality_score_rows) → gate →
content-addressed split assignment — chained over ONE readStream with
no state, no watermark, no aggregation, and proven row-identical to the
same chain over the batch reader. This is the pipeline a production
crawl runs at the ingest edge; each stage is pinned individually
elsewhere, this pins that they COMPOSE."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


@pytest.fixture(scope="module")
def fitted_models(spark, sf_dir):
    """Fit every model once on the testdata corpus."""
    from argostats_spark.operators.dsir import (
        dense_lambda, dsir_logratio, doc_bucket_counts, gram_rows, _bucket_of,
    )
    from argostats_spark.operators.quality_classifier import quality_fit
    from argostats_spark.operators.textstats import unigram_lm_fit

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab, t_total, v_size = unigram_lm_fit(d)

    B = 128
    feats = doc_bucket_counts(d, n_buckets=B)
    raw_tot = feats.groupBy("bucket").agg(F.sum("c").alias("c"))
    tgt = d.where(F.col("doc_id") % 7 == 0)
    tgt_tot = (
        gram_rows(tgt, "text", [])
        .select(_bucket_of(F.col("gram"), B))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    )
    logr = dsir_logratio(tgt_tot, raw_tot, n_buckets=B)
    dense = dense_lambda(logr, n_buckets=B)

    grp = F.substring("source", 4, 10).cast("int")
    w, b, _ = quality_fit(
        d.where(grp < 10), d.where(grp >= 10),
        n_buckets=64, epochs=3, lr=200.0,
    )
    return dict(vocab=vocab, t_total=t_total, v_size=v_size,
                dense=dense, B=B, w=w, b=b)


def _curate(df, m):
    """The composed ingest-edge chain — every stage row-local."""
    from argostats_spark.operators.dsir import dsir_score_rows
    from argostats_spark.operators.quality_classifier import quality_score_rows
    from argostats_spark.operators.sampling import train_test_split
    from argostats_spark.operators.textstats import lm_score_rows

    good = df.where(~F.col("is_corrupt")).drop("is_corrupt", "raw_line")
    scored = lm_score_rows(good, m["vocab"], m["t_total"], m["v_size"])
    scored = dsir_score_rows(scored, m["dense"], n_buckets=m["B"])
    scored = quality_score_rows(scored, m["w"], m["b"])
    gated = scored.where(
        F.col("d_nll").isNotNull() & (F.col("q_score").isNotNull())
    )
    return train_test_split(gated, "doc_id").select(
        "doc_id", "n_tok", "d_nll", "n_grams", "logw", "q_score", "split"
    )


def test_streaming_curation_chain_equals_batch(spark, sf_dir, tmp_path, fitted_models):
    from argostats_spark.sources.jsonl import read_jsonl, read_jsonl_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60).collect()
    src = tmp_path / "in"
    src.mkdir()
    lines = []
    for r in docs:
        lines.append(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}))
    lines.insert(3, '{"doc_id": "not-a-number", "text": 17}')  # corrupt
    lines.insert(9, "{broken json")                            # corrupt
    lines.append(json.dumps({"doc_id": 999_001, "text": ""}))  # zero tokens
    half = len(lines) // 2
    (src / "a.jsonl").write_text("\n".join(lines[:half]) + "\n")
    (src / "b.jsonl").write_text("\n".join(lines[half:]) + "\n")

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    m = fitted_models

    good_b, bad_b = read_jsonl(spark, str(src / "*.jsonl"), schema)
    batch_out = _curate(
        good_b.withColumn("is_corrupt", F.lit(False))
        .withColumn("raw_line", F.lit(None).cast("string")),
        m,
    )
    batch = {r["doc_id"]: r for r in batch_out.collect()}
    assert len(batch) > 40
    assert bad_b.count() == 2
    assert 999_001 not in batch  # zero-token doc gated out, not scored 0

    stream = read_jsonl_stream(spark, str(src / "*.jsonl"), schema)
    out = _curate(stream, m)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("curated")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM curated").collect()}
    finally:
        q.stop()

    assert set(got) == set(batch)
    for k in got:
        assert got[k].asDict() == batch[k].asDict(), k
    # every split value present and content-addressed (stable keys)
    splits = {r["split"] for r in got.values()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_crawl_to_curated_end_to_end(spark, sf_dir, tmp_path, fitted_models):
    """Capstone: raw crawl bytes to curated split — synthetic WARC
    archives → read_warc (HTML→text in-scan) → warc_to_documents
    (content-addressed ids, host strata) → the full stateless scoring
    chain fitted on the reference corpus (OOV tokens score the LM
    floor, classifier/DSIR score row-locally) → gate → split. Pins the
    bridge schema, id stability across re-reads, and that every
    curated row carries all scores."""
    import gzip

    from argostats_spark.sources.warc import read_warc, warc_to_documents
    from tests.test_warc import _archive

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg0.warc").write_bytes(_archive())
    (d / "seg1.warc.gz").write_bytes(gzip.compress(_archive()))

    docs = warc_to_documents(read_warc(spark, str(d / "*")))
    rows = docs.collect()
    assert set(docs.columns) == {
        "doc_id", "url", "source", "lang", "text", "n_chars", "n_tokens"
    }
    assert set(r["lang"] for r in rows) <= {"en", "de", "fr", "es", "und"}
    # 2 HTML responses per archive; identical content across archives
    # collapses to the same content-addressed doc_id
    assert len(rows) == 4
    ids = {r["doc_id"] for r in rows}
    assert len(ids) == 2  # content-addressed: re-crawl == same id
    assert all(r["source"] == "example.com" for r in rows)

    # ids stable across a second read
    ids2 = {r["doc_id"] for r in
            warc_to_documents(read_warc(spark, str(d / "*"))).collect()}
    assert ids2 == ids

    # crawl-hygiene stages: robots compliance + blocklist + langid —
    # all row-local / broadcast, composing before the scoring chain
    from argostats_spark.operators.blocklist import blocklist_flags_rows
    from argostats_spark.operators.langid import langid_fit, langid_score_rows
    from argostats_spark.operators.robots import apply_robots

    robots = spark.createDataFrame(
        [("example.com", "User-agent: *\nDisallow: /a\n")],
        "host string, robots_txt string",
    )
    gated = apply_robots(docs.dropDuplicates(["doc_id"]), robots)
    allowed = gated.where(F.col("robots_allowed"))
    # /a disallowed, /b allowed -> exactly one survivor
    assert allowed.count() == 1
    assert allowed.first()["url"] == "http://example.com/b"

    flagged = blocklist_flags_rows(allowed, ["forbidden phrase"])
    assert flagged.where(~F.col("blocked")).count() == 1

    ref = spark.read.parquet(f"{sf_dir}/documents.parquet")
    profiles = langid_fit(ref.limit(200))
    lid = langid_score_rows(flagged.where(~F.col("blocked")), profiles)
    assert lid.first()["lang_pred"] is not None

    m = fitted_models
    crawl = lid.select("doc_id", "text").withColumn(
        "is_corrupt", F.lit(False)
    ).withColumn("raw_line", F.lit(None).cast("string"))
    curated = _curate(crawl, m).collect()
    assert len(curated) == 1
    for r in curated:
        assert r["d_nll"] is not None      # LM scored (OOV floor applies)
        assert r["logw"] is not None       # DSIR scored
        assert r["q_score"] is not None    # classifier scored
        assert r["split"] in {"train", "val", "test"}


def test_crawl_to_training_packs(spark, tmp_path):
    """The capstone's last mile (round 8): curated crawl text →
    passage removal (exact substring dedup) → compression-ratio gate →
    content-defined chunking → non-splitting best-fit packing. Every
    pack obeys the token budget, no chunk is split, and the duplicated
    passage survives only once corpus-wide before chunking."""
    import gzip

    from argostats_spark.operators.decontam import remove_duplicate_passages
    from argostats_spark.operators.sampling import (
        chunk_documents_cdc,
        pack_chunks_bestfit,
    )
    from argostats_spark.operators.textstats import compression_ratio_rows
    from argostats_spark.sources.warc import read_warc, warc_to_documents
    from tests.test_warc import _record, _http_response

    # two pages sharing a 12-token boilerplate footer (the dup to cut)
    footer = " ".join(f"footer{i}" for i in range(12))
    pages = [
        (f"http://h.example.com/p{k}",
         "<html><body><p>"
         + " ".join(f"doc{k} tok{k}x{j}" for j in range(30))
         + f" {footer}</p></body></html>")
        for k in range(2)
    ]
    arc = b"".join(
        _record(
            b"response",
            b"WARC-Target-URI: " + url.encode() + b"\r\n",
            _http_response(html.encode()),
        )
        for url, html in pages
    )
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(gzip.compress(arc))

    docs = warc_to_documents(read_warc(spark, str(d / "*")))
    deduped = remove_duplicate_passages(docs, window=12, stride=1)
    rows = {r["url"]: r for r in deduped.collect()}
    removed = sum(r["n_tokens_removed"] for r in rows.values())
    assert removed == 12  # footer cut exactly once, canonical kept

    scored = compression_ratio_rows(
        deduped.select("doc_id", "source", "text_dedup"),
        text_col="text_dedup",
    )
    kept = scored.where(F.col("zlib_ratio") > 0.2).select(
        "doc_id", F.col("text_dedup").alias("text"), "source"
    )
    assert kept.count() == 2

    chunks = chunk_documents_cdc(
        kept, min_tokens=4, max_tokens=16, divisor=4,
        carry_cols=("source",),
    )
    packed = pack_chunks_bestfit(
        chunks, "n_chunk_tokens", 32, "source", ["doc_id", "chunk_id"]
    )
    pdf = packed.toPandas()
    assert len(pdf) == chunks.count()  # every chunk assigned, none split
    per_pack = pdf[~pdf.oversize].groupby(["source", "pack_id"])[
        "n_chunk_tokens"
    ].sum()
    assert (per_pack <= 32).all()      # budget respected in every pack
    # token conservation: chunked tokens == post-removal doc tokens
    total_doc_toks = sum(
        len(r["text_dedup"].split()) for r in rows.values()
    )
    assert int(pdf.n_chunk_tokens.sum()) == total_doc_toks
