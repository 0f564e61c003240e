"""Product quantization (operators/pq.py): codebook shape, encode
determinism, reconstruction-error bound, and ADC recall vs brute force
on the embeddings table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.pq import (
    pq_decode_expr, pq_encode, pq_topk, pq_train,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=16, ksub=32, sample_rows=500, seed=7)


def test_pq_codebook_shape_and_encode(spark, emb, books):
    dim = len(emb.first()["embedding"])
    assert len(books) == 16 and all(len(b) == 32 for b in books)
    assert all(len(c) == dim // 16 for b in books for c in b)

    enc = pq_encode(emb, books)
    pdf = enc.select("vec_id", "pq_code").limit(50).toPandas()
    assert all(len(c) == 16 for c in pdf.pq_code)
    assert all(0 <= x < 32 for c in pdf.pq_code for x in c)
    # encoding is deterministic (pure expression over the same model)
    pdf2 = pq_encode(emb, books).select("vec_id", "pq_code").limit(50).toPandas()
    assert [list(c) for c in pdf.pq_code] == [list(c) for c in pdf2.pq_code]


def test_pq_reconstruction_beats_zero_codebook(spark, emb, books):
    """Quantization must explain most of the variance: mean squared
    reconstruction error well under the mean squared vector norm."""
    enc = pq_encode(emb, books)
    rec = enc.withColumn("dec", pq_decode_expr("pq_code", books))
    err = rec.select(
        F.aggregate(
            F.zip_with("embedding", "dec",
                       lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("e"),
        F.aggregate(
            F.transform("embedding", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("n"),
    ).agg(F.avg("e").alias("mse"), F.avg("n").alias("mnorm")).first()
    assert err["mse"] < 0.5 * err["mnorm"], (err["mse"], err["mnorm"])


def test_pq_adc_recall_vs_brute_force(spark, emb, books):
    """ADC top-10 must recover most of the exact Euclidean top-10 —
    the standard PQ quality check (recall@10 ≥ 0.5 at m=16, ksub=32 on
    clustered embeddings; exact values are data-dependent, the bound is
    deliberately conservative)."""
    enc = pq_encode(emb, books).cache()
    queries = emb.limit(4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    got = pq_topk(enc, queries, books, k=10).toPandas()

    qrows = queries.collect()
    corpus = emb.select("vec_id", "embedding").toPandas()
    V = np.stack(corpus.embedding.to_numpy()).astype("f8")
    recalls = []
    for qr in qrows:
        qv = np.asarray(qr["qv"], dtype="f8")
        d = ((V - qv) ** 2).sum(axis=1)
        order = np.lexsort((corpus.vec_id.to_numpy(), d))
        true10 = set(corpus.vec_id.to_numpy()[order[:10]])
        mine = set(got[got.qid == qr["qid"]].vec_id)
        recalls.append(len(true10 & mine) / 10)
    assert np.mean(recalls) >= 0.5, recalls
    # the query vector itself (distance 0) must always be found
    for qr in qrows:
        assert qr["qid"] in set(got[got.qid == qr["qid"]].vec_id)
    enc.unpersist()


def test_pq_composes_with_ivf_pruning(spark, emb, books):
    """The memory+compute scale path: IVF prunes cells, ADC scores the
    compressed codes of surviving cells only. Sanity: the composed path
    returns k rows per query from probed cells, finds the query itself
    (its own cell is always its nearest → always probed), and its
    distances agree with the unpruned ADC path on shared candidates."""
    from argostats_spark.operators.similarity import ivf_assign, train_centroids

    cents = train_centroids(emb, n_centroids=8, sample_rows=500)
    enc = pq_encode(ivf_assign(emb, cents), books).cache()
    queries = emb.limit(3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    # probe the query's own cell (nprobe=1 equivalent): prune then score
    q_cells = ivf_assign(
        queries.select("qid", F.col("qv").alias("embedding")), cents
    ).select("qid", F.col("ivf_cell").alias("qcell"))
    full = pq_topk(enc, queries, books, k=10)
    pruned_rows = []
    for qr in q_cells.collect():
        sub = enc.where(F.col("ivf_cell") == qr["qcell"])
        one_q = queries.where(F.col("qid") == qr["qid"])
        pruned_rows.append(pq_topk(sub, one_q, books, k=10).toPandas())
    import pandas as pd
    pruned = pd.concat(pruned_rows, ignore_index=True)

    fullp = full.toPandas()
    for qid in pruned.qid.unique():
        mine = pruned[pruned.qid == qid]
        assert qid in set(mine.vec_id)          # self always found
        ref = fullp[fullp.qid == qid].set_index("vec_id").adc_dist
        for _, r in mine.iterrows():            # same ADC distance both paths
            if r.vec_id in ref.index:
                assert abs(r.adc_dist - ref[r.vec_id]) < 1e-9
    enc.unpersist()


def test_pq_train_partition_independent(spark, emb):
    """The content-ordered sample makes the model a pure function of
    the corpus: different partitionings must yield identical
    codebooks."""
    a = pq_train(emb.repartition(7), m=4, ksub=8, sample_rows=200, seed=3)
    b = pq_train(emb.repartition(3), m=4, ksub=8, sample_rows=200, seed=3)
    assert a == b


def test_pq_topk_empty_query_set(spark, emb, books):
    """Zero query rows degrade to an empty (qid, vec_id, adc_dist, rnk)
    frame — the ANN-family convention — rather than an IndexError."""
    enc = pq_encode(emb.select("vec_id", "embedding"), books)
    q = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = pq_topk(enc, q, books, k=5)
    assert out.columns == ["qid", "vec_id", "adc_dist", "rnk"]
    assert out.count() == 0


def test_pq_topk_single_scan_and_query_bound(spark, emb, books):
    """Round-11 restructure pins: (a) the multi-query plan has NO
    Union — every query's distance is a column of ONE corpus scan
    (the previous per-query union re-ran a lazy encode |queries|
    times: 16.5 s vs ~1.2 s at the 10x checkpoint); (b) the query
    count is bounded with an error naming the remedy; (c) exclude_self
    drops exactly the self row per query."""
    from argostats_spark.operators.pq import PQ_TOPK_MAX_QUERIES

    enc = pq_encode(emb.select("vec_id", "embedding"), books)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = pq_topk(enc, q, books, k=5, exclude_self=True)
    explained = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Union" not in explained
    rows = out.collect()
    assert {r["qid"] for r in rows} == {0, 1, 2}
    assert all(r["vec_id"] != r["qid"] for r in rows)
    for qid in (0, 1, 2):
        rnks = sorted(r["rnk"] for r in rows if r["qid"] == qid)
        assert rnks == [1, 2, 3, 4, 5]
    big = spark.range(PQ_TOPK_MAX_QUERIES + 1).select(
        F.col("id").alias("qid"),
        F.array(*[F.lit(0.0)] * len(books[0][0]) * len(books)).alias("qv"),
    )
    with pytest.raises(ValueError, match="PQ_TOPK_MAX_QUERIES"):
        pq_topk(enc, big, books, k=5)


# --- SQ8 scalar quantization ---------------------------------------------


def test_sq8_encode_matches_numpy_mirror(spark, emb):
    from argostats_spark.operators.pq import sq8_encode

    got = sq8_encode(emb.limit(50)).select("vec_id", "embedding",
                                           "sq8_code", "sq8_scale").collect()
    assert len(got) == 50
    for r in got:
        x = np.asarray(r["embedding"], dtype="f8")
        ma = float(np.max(np.abs(x)))
        exp = np.floor((x * 127.0) / ma + 0.5).astype("i8") if ma > 0 \
            else np.zeros(len(x), dtype="i8")
        assert list(exp) == list(r["sq8_code"]), r["vec_id"]
        assert abs(r["sq8_scale"] - ma / 127.0) < 1e-15
        # codes live in int8 range and reconstruction error <= scale/2
        assert all(-127 <= c <= 127 for c in r["sq8_code"])
        rec = np.asarray(r["sq8_code"], dtype="f8") * r["sq8_scale"]
        assert float(np.max(np.abs(rec - x))) <= r["sq8_scale"] / 2 + 1e-12


def test_sq8_code_dtype_is_tinyint_and_zero_vector_safe(spark):
    from pyspark.sql.types import ArrayType, ByteType

    from argostats_spark.operators.pq import sq8_decode_expr, sq8_encode

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 1.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    enc = sq8_encode(df)
    assert isinstance(enc.schema["sq8_code"].dataType, ArrayType)
    assert isinstance(enc.schema["sq8_code"].dataType.elementType, ByteType)
    rows = {r["vec_id"]: r for r in
            enc.withColumn("rec", sq8_decode_expr("sq8_code", "sq8_scale"))
            .collect()}
    assert rows[2]["sq8_code"] == [0, 0, 0, 0]
    assert rows[2]["sq8_scale"] == 0.0
    assert rows[2]["rec"] == [0.0, 0.0, 0.0, 0.0]
    assert rows[1]["sq8_code"] == [64, -127, 32, 127]


def test_sq8_topk_recall_vs_brute_force(spark, emb):
    from argostats_spark.operators.pq import sq8_encode, sq8_topk
    from argostats_spark.operators.similarity import brute_force_topk

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = brute_force_topk(emb, q, k=5)
    approx = sq8_topk(sq8_encode(emb), q, k=5)
    e = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    a = {(r["qid"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"sq8 recall@5 collapsed to {recall}"


def test_pq_adc_distances_match_numpy_mirror(spark, emb, books):
    """Exact differential for the single-scan ADC (round 11): every
    (qid, vec_id) distance equals the NumPy table-lookup mirror to the
    operator's 6-dp rounding, and ranks follow (dist, vec_id)."""
    enc = pq_encode(emb.select("vec_id", "embedding"), books).cache()
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    got = pq_topk(enc, q, books, k=7, exclude_self=True).collect()

    m, ksub, dsub = len(books), len(books[0]), len(books[0][0])
    bk = np.array(books, dtype="f8")
    codes = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    qvs = {r["qid"]: np.asarray(r["qv"], dtype="f8") for r in q.collect()}
    for r in got:
        qv = qvs[r["qid"]]
        dt = ((qv.reshape(m, 1, dsub) - bk) ** 2).sum(axis=2)
        want = round(float(sum(
            dt[b, codes[r["vec_id"]][b]] for b in range(m)
        )), 6)
        assert r["adc_dist"] == pytest.approx(want, abs=2e-6), (
            r["qid"], r["vec_id"])
    # per-query ranks are 1..k ordered by (dist, vec_id)
    for qid in qvs:
        rows = sorted(
            (r for r in got if r["qid"] == qid), key=lambda r: r["rnk"]
        )
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(r["adc_dist"], r["vec_id"]) for r in rows]
        assert keys == sorted(keys)
    enc.unpersist()
