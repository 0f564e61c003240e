"""DSIR importance resampling (operators/dsir.py) — behavioral tests
beyond the driver-hashed oracle row: does the selection actually
recover a planted target dialect, is it partition- and run-
deterministic, and do the temperature limits behave as the Gumbel
top-k math says they must."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.dsir import (
    doc_bucket_counts,
    dsir_logratio,
    dsir_resample,
    dsir_scores,
    dsir_select,
    hashed_gram_buckets,
)

B = 512  # small bucket space keeps the tiny-corpus tests honest


def _dialect_corpus(spark, n_a=60, n_b=60):
    """Raw corpus of two disjoint-vocabulary dialects: doc_id < 1000 is
    dialect A ('alpha'-family words), >= 1000 is dialect B."""
    rows = []
    va = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    vb = ["zulu", "yankee", "xray", "whiskey", "victor", "uniform"]
    for i in range(n_a):
        ws = [va[(i + j) % len(va)] for j in range(12)]
        rows.append((i, " ".join(ws)))
    for i in range(n_b):
        ws = [vb[(i + j) % len(vb)] for j in range(12)]
        rows.append((1000 + i, " ".join(ws)))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _target(spark, n=20):
    va = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    rows = [
        (10_000 + i, " ".join(va[(i + j) % len(va)] for j in range(10)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gram_features_count(spark):
    # t tokens -> t unigrams + (t-1) bigrams = 2t - 1 grams
    df = spark.createDataFrame([(1, "A b  c"), (2, "solo"), (3, "")],
                               "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(hashed_gram_buckets("text", B)).alias("n")
        ).collect()
    }
    assert out == {1: 5, 2: 1, 3: 0}
    # buckets are in range and case-insensitive ('A b c' vs 'a b c')
    b1 = df.where("doc_id = 1").select(
        F.explode(hashed_gram_buckets("text", B)).alias("b")).collect()
    assert all(0 <= r["b"] < B for r in b1)
    low = spark.createDataFrame([(9, "a b  c")], "doc_id bigint, text string")
    b2 = low.select(F.explode(hashed_gram_buckets("text", B)).alias("b")).collect()
    assert sorted(r["b"] for r in b1) == sorted(r["b"] for r in b2)


def test_logratio_signs(spark):
    # a bucket seen only in the target has positive lam; only-raw negative
    tgt = spark.createDataFrame([(1, 10)], "bucket bigint, c bigint")
    raw = spark.createDataFrame([(2, 10)], "bucket bigint, c bigint")
    lam = {r["bucket"]: r["lam"] for r in dsir_logratio(tgt, raw, B).collect()}
    assert lam[1] > 0 and lam[2] < 0


def test_logratio_fused_equals_two_table_path(spark):
    """Round 14 (VERDICT r13 item 5): dsir_logratio_fused — the
    one-aggregate λ fit dsir_select now ships — must produce the
    EXACT λ table (values and floor) of the public two-table
    dsir_logratio on the same fused feature table, including buckets
    seen on only one side and a non-default alpha."""
    from argostats_spark.operators.dsir import (
        dsir_logratio,
        dsir_logratio_fused,
    )

    feats = spark.createDataFrame(
        # bucket 1 both sides, 2 target-only, 3 raw-only (two docs)
        [("t", None, 1, 4), ("t", None, 2, 6),
         ("r", 10, 1, 3), ("r", 10, 3, 5), ("r", 11, 3, 2)],
        "__side string, doc_id bigint, bucket bigint, c bigint",
    )
    for alpha in (1.0, 0.25):
        tgt_tot = (
            feats.filter(F.col("__side") == "t")
            .groupBy("bucket").agg(F.sum("c").alias("c"))
        )
        raw_tot = (
            feats.filter(F.col("__side") == "r")
            .groupBy("bucket").agg(F.sum("c").alias("c"))
        )
        want, want_floor = dsir_logratio(
            tgt_tot, raw_tot, B, alpha, return_floor=True
        )
        got, got_floor = dsir_logratio_fused(
            feats, B, alpha, return_floor=True
        )
        assert got_floor == want_floor
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_planted_dialect_recovery(spark):
    raw = _dialect_corpus(spark)
    tgt = _target(spark)
    # near-argmax temperature: Gumbel noise is ~O(1), logw gaps between
    # dialects are tens of nats, so even T=1 separates; T=0.05 is argmax
    sel, lam = dsir_select(raw, tgt, k=30, n_buckets=B, temperature=0.05)
    ids = [r["doc_id"] for r in sel.collect()]
    assert len(ids) == 30
    assert all(i < 1000 for i in ids), "selected a dialect-B document"
    # at temperature 1 the dialect gap still dominates the noise
    sel1, _ = dsir_select(raw, tgt, k=30, n_buckets=B, temperature=1.0)
    ids1 = [r["doc_id"] for r in sel1.collect()]
    assert sum(i < 1000 for i in ids1) == 30


def test_partition_independence_and_rerun_determinism(spark):
    raw = _dialect_corpus(spark)
    tgt = _target(spark)

    def run(df):
        sel, _ = dsir_select(df, tgt, k=25, n_buckets=B)
        return [(r["doc_id"], r["rank"], r["logw"], r["score"])
                for r in sel.orderBy("rank").collect()]

    a = run(raw.repartition(13))
    b = run(raw.repartition(2))
    c = run(raw.coalesce(1))
    assert a == b == c


def test_xxhash64_fast_path(spark):
    """Round 13: hasher="xxhash64" (the production fast path — md5
    stays the oracle-replayable registry family). Pins: planted-
    dialect recovery holds in the xxhash64 feature space too;
    selection is partition-independent and rerun-deterministic; the
    row-local scorer agrees with the join path when fit and scoring
    share the family; mixed families are a loud ValueError."""
    import pytest

    from argostats_spark.operators.dsir import (
        dense_lambda,
        dsir_score_rows,
        dsir_scores,
        fused_bucket_counts,
        dsir_logratio,
        dsir_score_rows as _srows,
    )

    raw = _dialect_corpus(spark)
    tgt = _target(spark)
    sel, lam = dsir_select(
        raw, tgt, k=30, n_buckets=B, temperature=0.05, hasher="xxhash64"
    )
    ids = [r["doc_id"] for r in sel.collect()]
    assert len(ids) == 30
    assert all(i < 1000 for i in ids), "selected a dialect-B document"
    # buckets land in [0, B) even though xxhash64 is signed
    assert lam.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= B)
    ).count() == 0
    # partition independence under the fast family
    sel2, _ = dsir_select(
        raw.repartition(7), tgt, k=30, n_buckets=B, temperature=0.05,
        hasher="xxhash64",
    )
    assert sorted(map(tuple, sel.collect())) == sorted(
        map(tuple, sel2.collect())
    )
    # row-local scorer == join path on the fitted corpus, same family
    feats = fused_bucket_counts(raw, tgt, n_buckets=B, hasher="xxhash64")
    raw_feats = feats.filter(F.col("__side") == "r").select(
        "doc_id", "bucket", "c")
    raw_tot = raw_feats.groupBy("bucket").agg(F.sum("c").alias("c"))
    tgt_tot = (feats.filter(F.col("__side") == "t")
               .groupBy("bucket").agg(F.sum("c").alias("c")))
    lam2, floor = dsir_logratio(tgt_tot, raw_tot, B, return_floor=True)
    joined = {r["doc_id"]: r["logw"]
              for r in dsir_scores(raw_feats, lam2).collect()}
    rowlocal = {
        r["doc_id"]: r["logw"]
        for r in dsir_score_rows(
            raw, dense_lambda(lam2, B, floor), n_buckets=B,
            hasher="xxhash64",
        ).collect()
    }
    for k, v in joined.items():
        assert abs(rowlocal[k] - v) < 2e-6, (k, v, rowlocal[k])
    with pytest.raises(ValueError, match="hasher"):
        dsir_select(raw, tgt, k=5, n_buckets=B, hasher="sha1")


def test_low_temperature_is_argmax_of_logw(spark):
    raw = _dialect_corpus(spark, n_a=15, n_b=15)
    tgt = _target(spark, n=8)
    feats = doc_bucket_counts(raw, n_buckets=B)
    tgt_tot = (
        tgt.select(F.explode(hashed_gram_buckets("text", B)).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    )
    raw_tot = feats.groupBy("bucket").agg(F.sum("c").alias("c"))
    lam = dsir_logratio(tgt_tot, raw_tot, B)
    scores = dsir_scores(feats, lam)
    by_logw = [
        r["doc_id"]
        for r in scores.orderBy(F.desc("logw"), "doc_id").limit(10).collect()
    ]
    sel = dsir_resample(scores, 10, temperature=1e-6)
    assert sorted(r["doc_id"] for r in sel.collect()) == sorted(by_logw)


def test_resample_rank_is_dense_and_score_sorted(spark):
    raw = _dialect_corpus(spark, n_a=10, n_b=10)
    tgt = _target(spark, n=5)
    sel, _ = dsir_select(raw, tgt, k=12, n_buckets=B)
    rows = sel.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, 13))
    ss = [r["score"] for r in rows]
    assert ss == sorted(ss, reverse=True)


def test_k_larger_than_corpus_returns_everything(spark):
    raw = _dialect_corpus(spark, n_a=4, n_b=4)
    tgt = _target(spark, n=3)
    sel, _ = dsir_select(raw, tgt, k=100, n_buckets=B)
    assert sel.count() == 8


def _fit_dense(spark, raw, tgt, n_buckets=B):
    from pyspark.sql import functions as F2
    from argostats_spark.operators.dsir import (
        dense_lambda,
        dsir_logratio,
        gram_rows,
        _bucket_of,
    )

    feats = doc_bucket_counts(raw, n_buckets=n_buckets)
    raw_tot = feats.groupBy("bucket").agg(F2.sum("c").alias("c"))
    tgt_tot = (
        gram_rows(tgt, "text", [])
        .select(_bucket_of(F2.col("gram"), n_buckets))
        .groupBy("bucket").agg(F2.count(F2.lit(1)).alias("c"))
    )
    lam, floor = dsir_logratio(tgt_tot, raw_tot, n_buckets, return_floor=True)
    return feats, lam, dense_lambda(lam, n_buckets, floor), floor


def test_row_local_scoring_equals_join_path(spark):
    from argostats_spark.operators.dsir import dsir_score_rows

    raw = _dialect_corpus(spark, n_a=25, n_b=25)
    tgt = _target(spark, n=10)
    feats, lam, dense, floor = _fit_dense(spark, raw, tgt)
    join_path = {
        (r["doc_id"]): (r["n_grams"], r["logw"])
        for r in dsir_scores(feats, lam).collect()
    }
    row_path = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_score_rows(raw, dense, n_buckets=B).collect()
    }
    assert set(join_path) == set(row_path)
    for k in join_path:
        assert join_path[k][0] == row_path[k][0]
        assert abs(join_path[k][1] - row_path[k][1]) < 2e-6, k


def test_unseen_bucket_scores_floor_not_dropped(spark):
    from argostats_spark.operators.dsir import dsir_score_rows

    raw = _dialect_corpus(spark, n_a=10, n_b=10)
    tgt = _target(spark, n=5)
    _, _, dense, floor = _fit_dense(spark, raw, tgt)
    # floor = ln((R+αB)/(T+αB)): raw 20 docs × (12+11) grams = 460,
    # target 5 × (10+9) = 95 — positive, because the SMALLER target
    # model is more diffuse, so a never-seen gram reads as (weakly)
    # more target-like under both smoothed multinomials
    import math

    assert floor == pytest.approx(math.log((460 + B) / (95 + B)))
    # a document whose vocabulary the fit never saw: every gram scores
    # some λ (many the floor) — logw is defined, not null/dropped
    new = spark.createDataFrame(
        [(1, "qqqq wwww eeee rrrr")], "doc_id bigint, text string"
    )
    row = dsir_score_rows(new, dense, n_buckets=B).collect()[0]
    assert row["n_grams"] == 7
    assert row["logw"] is not None


def test_streaming_score_equals_batch(spark, tmp_path):
    from argostats_spark.operators.dsir import dsir_score_rows
    from argostats_spark.streaming.events import run_to_memory

    raw = _dialect_corpus(spark, n_a=20, n_b=20)
    tgt = _target(spark, n=8)
    _, _, dense, _ = _fit_dense(spark, raw, tgt)

    src = str(tmp_path / "docs_in")
    raw.write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = run_to_memory(
        dsir_score_rows(stream, dense, n_buckets=B), "dsir_stream",
        output_mode="append",
    )
    try:
        got = {
            r["doc_id"]: (r["n_grams"], r["logw"])
            for r in spark.table("dsir_stream").collect()
        }
    finally:
        q.stop()
    want = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_score_rows(raw, dense, n_buckets=B).collect()
    }
    assert got == want


def test_score_rows_zero_token_doc_null_logw(spark):
    """Round-6 advice: a zero-token document keeps its row with
    n_grams=0 and logw NULL (not 0.0 — the batch path omits it, and a
    fake 0.0 would rank as a real score)."""
    from argostats_spark.operators.dsir import dsir_score_rows

    raw = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    _, _, dense, _ = _fit_dense(spark, raw, tgt)
    new = spark.createDataFrame(
        [(10, "alpha zeta"), (11, ""), (12, "   ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dsir_score_rows(new, dense, n_buckets=B).collect()}
    assert rows[10]["n_grams"] > 0 and rows[10]["logw"] is not None
    for i in (11, 12):
        assert rows[i]["n_grams"] == 0
        assert rows[i]["logw"] is None


def test_logratio_direct_equals_fused_per_doc_path(spark):
    """Round-14 close (the sf1 stall fix): dsir_logratio_direct — λ
    straight from the tagged gram stream, no per-doc intermediate —
    must produce the EXACT λ table (values and floor) of the
    per-doc-checkpoint path (dsir_logratio_fused over
    fused_bucket_counts), in both hash families and with a
    non-default alpha. The conditional bucket sums commute with the
    per-doc aggregation, so any divergence is a bug, not tolerance."""
    from argostats_spark.operators.dsir import (
        dsir_logratio_direct,
        dsir_logratio_fused,
        fused_bucket_counts,
    )

    raw = _dialect_corpus(spark)
    tgt = _target(spark)
    for hasher in ("md5", "xxhash64"):
        for alpha in (1.0, 0.25):
            feats = fused_bucket_counts(raw, tgt, n_buckets=B, hasher=hasher)
            want, want_floor = dsir_logratio_fused(
                feats, B, alpha, return_floor=True
            )
            got, got_floor = dsir_logratio_direct(
                raw, tgt, "text", B, alpha, hasher, return_floor=True
            )
            assert got_floor == want_floor
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, want.collect())
            )


def test_fused_bucket_totals_match_per_doc_reaggregation(spark):
    """The direct (bucket, ct, cr) totals equal the re-aggregated
    per-doc feature table bucket-for-bucket (NULL where a side never
    hits a bucket), i.e. the stall fix changed the materialization
    shape, not a single count."""
    from pyspark.sql import functions as F
    from argostats_spark.operators.dsir import (
        fused_bucket_counts,
        fused_bucket_totals,
    )

    raw = _dialect_corpus(spark)
    tgt = _target(spark)
    want = sorted(map(tuple, (
        fused_bucket_counts(raw, tgt, n_buckets=B)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__side") == "t", F.col("c"))).alias("ct"),
            F.sum(F.when(F.col("__side") == "r", F.col("c"))).alias("cr"),
        )
        .collect()
    )))
    got = sorted(map(tuple, fused_bucket_totals(raw, tgt, n_buckets=B).collect()))
    assert got == want
