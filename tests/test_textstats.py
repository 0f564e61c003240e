"""Unigram-LM scoring + decile bucketing (operators/textstats.py):
NLL vs a direct Python computation, and the approx (scale-path)
decile assignment vs the exact ntile path."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from argostats_spark.operators.textstats import nll_deciles, unigram_lm_nll


@pytest.fixture(scope="module")
def docs_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_unigram_lm_nll_matches_python(spark):
    texts = [
        "the cat sat on the mat",
        "the the the the",
        "unique words only here now",
        "cat mat cat mat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["d_nll"] for r in unigram_lm_nll(df).collect()}

    counts = Counter(t for s in texts for t in s.lower().split())
    T, V = sum(counts.values()), len(counts)
    for i, s in enumerate(texts):
        toks = s.lower().split()
        want = round(
            sum(-math.log((counts[t] + 1.0) / (T + V)) for t in toks) / len(toks), 6
        )
        assert got[i] == pytest.approx(want, abs=1.5e-6), (i, got[i], want)


def test_nll_deciles_approx_matches_exact_off_edges(docs_df):
    """The percentile_approx path must agree with the exact ntile path
    for every document whose score is not within sketch error of a
    decile edge — and bucket populations must stay within 2% of n/10."""
    nll = unigram_lm_nll(docs_df).cache()
    n = nll.count()
    exact = {r["doc_id"]: r["decile"] for r in nll_deciles(nll, exact=True).collect()}
    approx_rows = nll_deciles(nll, exact=False).collect()
    approx = {r["doc_id"]: r["decile"] for r in approx_rows}
    scores = {r["doc_id"]: r["d_nll"] for r in approx_rows}

    # documents sharing a d_nll with another doc can straddle an ntile
    # boundary (ntile splits ties by doc_id; the bucketing can't) —
    # exclude exact-tie values and edge-adjacent values from the
    # identity check, then bound how many documents differ at all
    from collections import Counter as C
    val_counts = C(scores.values())
    diffs = [k for k in exact if exact[k] != approx[k]]
    real_diffs = [k for k in diffs if val_counts[scores[k]] == 1]
    # off-tie disagreements must sit exactly at a bucket boundary step
    for k in real_diffs:
        assert abs(exact[k] - approx[k]) == 1, (k, exact[k], approx[k])
    assert len(diffs) <= max(5, n // 20), f"{len(diffs)}/{n} moved buckets"

    pops = C(approx.values())
    for d in range(1, 11):
        assert abs(pops.get(d, 0) - n / 10) <= max(3, 0.05 * n), (d, pops.get(d, 0), n)
    nll.unpersist()


def test_textstats_empty_corpus(spark):
    """Empty inputs return empty results with the right schema, not a
    TypeError from int(None)/list(None)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    nll, t, v = unigram_lm_nll(empty, return_totals=True)
    assert (t, v) == (0, 0)
    assert nll.columns == ["doc_id", "d_nll"] and nll.count() == 0
    # all-empty documents behave identically
    blank = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    assert unigram_lm_nll(blank).count() == 0
    # both decile paths survive empty input
    assert nll_deciles(nll, exact=True).count() == 0
    out = nll_deciles(nll, exact=False)
    assert out.columns == ["doc_id", "d_nll", "decile"] and out.count() == 0


def test_chunk_documents_matches_python(spark):
    """chunk_documents vs a direct Python chunker: disjoint and
    overlapping strides, short docs, empty docs."""
    from argostats_spark.operators.sampling import chunk_documents

    texts = [
        "a b c d e f g h i j",   # 10 tokens
        "one two three",          # shorter than a chunk
        "",                       # no tokens -> no rows
        "  x   y  ",              # messy whitespace
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    for chunk, stride in [(4, 4), (4, 2), (3, 1), (512, 512)]:
        got = sorted(
            (
                (r["doc_id"], r["chunk_id"], r["tok_start"], r["tok_end"],
                 r["chunk_text"], r["n_chunk_tokens"])
                for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
            )
        )
        want = []
        for i, t in enumerate(texts):
            toks = t.split()
            for cid, start in enumerate(range(0, len(toks), stride)):
                piece = toks[start:start + chunk]
                want.append((i, cid, start, start + len(piece), " ".join(piece), len(piece)))
        assert got == sorted(want), (chunk, stride, got[:4], sorted(want)[:4])

    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=5)


def test_chunk_documents_no_shuffle(spark, sf_dir):
    from argostats_spark.operators.sampling import chunk_documents
    from argostats_spark.plans.explain import count_exchanges, physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(docs, chunk_tokens=16, stride=8)
    plan = physical_plan(out)
    assert count_exchanges(out) == 0, plan[:800]
    assert "BatchEvalPython" not in plan


def test_nll_deciles_approx_has_no_global_sort(docs_df):
    """The scale path must not contain the exact path's single-partition
    Window sort — one aggregate for the edges, then row-local bucketing."""
    from argostats_spark.plans.explain import physical_plan

    nll = unigram_lm_nll(docs_df)
    plan = physical_plan(nll_deciles(nll, exact=False))
    assert "Window" not in plan, plan[:800]


def test_chunk_documents_carry_cols_row_local(spark, sf_dir):
    """carry_cols projects stratum columns through to every chunk row
    without any join or shuffle (the pack_sequences composition relies
    on this staying single-exchange)."""
    from argostats_spark.operators.sampling import chunk_documents
    from argostats_spark.plans.explain import count_exchanges, physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(docs, chunk_tokens=16, stride=8,
                          carry_cols=("lang", "source"))
    assert count_exchanges(out) == 0
    assert "Join" not in physical_plan(out)
    langs = dict(
        docs.select("doc_id", "lang").collect()
    )
    for r in out.limit(200).collect():
        assert r["lang"] == langs[r["doc_id"]]
    assert set(out.columns) >= {"doc_id", "lang", "source", "chunk_id",
                                "tok_start", "tok_end", "chunk_text",
                                "n_chunk_tokens"}


def _py_bigram_nll(texts: dict[int, str], lam: float = 0.7) -> dict[int, float]:
    """Reference JM-interpolated bigram NLL, mirroring bigram_lm_nll."""
    toks = {i: t.lower().split() for i, t in texts.items() if t.split()}
    uni: Counter = Counter()
    big: Counter = Counter()
    ctx: Counter = Counter()
    for tk in toks.values():
        uni.update(tk)
        for a, b in zip(tk, tk[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    t_total, v = sum(uni.values()), len(uni)

    def p1(w):
        return (uni[w] + 1.0) / (t_total + v)

    out = {}
    for i, tk in toks.items():
        s = -math.log(p1(tk[0]))
        for a, b in zip(tk, tk[1:]):
            s += -math.log(lam * big[(a, b)] / ctx[a] + (1 - lam) * p1(b))
        out[i] = round(s / len(tk), 6)
    return out


def test_bigram_lm_matches_python_reference(spark):
    from argostats_spark.operators.textstats import bigram_lm_nll

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox",
        3: "dog the dog the dog",
        4: "solo",
        5: "over over over over",
        6: "",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    got = {r["doc_id"]: r["b_nll"] for r in bigram_lm_nll(df).collect()}
    want = _py_bigram_nll(texts)
    assert set(got) == set(want)  # empty doc absent from both
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6), k


def test_bigram_lm_predictable_text_scores_lower(spark):
    from argostats_spark.operators.textstats import bigram_lm_nll

    rep = " ".join(["ab cd"] * 20)                      # one dominant bigram
    mix = "ab qq cd zz ab ww cd ee ab rr cd tt"         # same words, broken pairs
    df = spark.createDataFrame(
        [(1, rep), (2, mix)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["b_nll"] for r in bigram_lm_nll(df).collect()}
    assert got[1] < got[2]


def test_bigram_lm_partition_independent(spark):
    from argostats_spark.operators.textstats import bigram_lm_nll

    rows = [(i, f"w{i % 7} w{(i + 1) % 5} w{i % 3} w{(i + 2) % 7}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted((r["doc_id"], r["b_nll"]) for r in bigram_lm_nll(df.repartition(11)).collect())
    b = sorted((r["doc_id"], r["b_nll"]) for r in bigram_lm_nll(df.coalesce(1)).collect())
    assert a == b


def test_lm_score_rows_fitted_corpus_agrees_with_batch(spark):
    """On the FITTED corpus the row-local scorer must reproduce
    unigram_lm_nll exactly (every token in-vocab), keep zero-token
    documents with d_nll NULL (never 0.0), and the pandas-UDF transport
    must equal the literal-map transport bit-for-bit."""
    from pyspark.sql import functions as F

    from argostats_spark.operators.textstats import (
        lm_score_rows, unigram_lm_fit, unigram_lm_nll,
    )

    texts = [
        "the cat sat on the mat",
        "the the the the",
        "unique words only here now",
        "cat mat cat mat",
        "",          # zero tokens: batch path omits, row path NULLs
        "   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab, t_total, v_size = unigram_lm_fit(df)
    batch = {r["doc_id"]: r["d_nll"] for r in unigram_lm_nll(df).collect()}
    lit_rows = lm_score_rows(df, vocab, t_total, v_size).collect()
    got = {r["doc_id"]: r["d_nll"] for r in lit_rows}
    for i in (0, 1, 2, 3):
        assert got[i] == batch[i], (i, got[i], batch[i])
    assert 4 not in batch and 5 not in batch
    assert got[4] is None and got[5] is None
    assert {r["doc_id"]: r["n_tok"] for r in lit_rows}[4] == 0
    # row shape preserved: original columns still present, no explode
    assert set(c for r in [lit_rows[0]] for c in r.asDict()) == {
        "doc_id", "text", "n_tok", "d_nll"
    }

    pd_rows = lm_score_rows(df, vocab, t_total, v_size, max_literal_vocab=0).collect()
    assert {r["doc_id"]: (r["n_tok"], r["d_nll"]) for r in pd_rows} == {
        r["doc_id"]: (r["n_tok"], r["d_nll"]) for r in lit_rows
    }


def test_lm_score_rows_new_corpus_oov_floor(spark):
    """Fitted-vs-new behavior: an unseen token scores the add-one floor
    -ln(1/(T+V)) — the model's real probability mass for an unseen
    type — so an all-OOV document scores exactly the floor, and a
    mixed document interpolates between floor and in-vocab NLL. The
    batch scorer (inner join) would silently DROP the OOV tokens."""
    import math

    from argostats_spark.operators.textstats import lm_score_rows, unigram_lm_fit

    fit_df = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "bb cc")], "doc_id long, text string"
    )
    vocab, t, v = unigram_lm_fit(fit_df)
    assert (t, v) == (5, 3)
    floor = -math.log(1.0 / (t + v))

    new = spark.createDataFrame(
        [(10, "zz qq"), (11, "aa zz")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["d_nll"] for r in
           lm_score_rows(new, vocab, t, v).collect()}
    assert got[10] == round(floor, 6)
    aa = -math.log((2 + 1.0) / (t + v))
    assert got[11] == round((aa + floor) / 2.0, 6)
    # OOV scores strictly worse than any in-vocab token's NLL
    assert got[10] > aa


def test_lm_score_rows_streaming_equals_batch(spark, tmp_path):
    """The scorer is a stateless streaming map: the same fitted model
    applied through readStream (append mode, no watermark, no agg) must
    produce exactly the batch rows."""
    from argostats_spark.operators.textstats import lm_score_rows, unigram_lm_fit

    fit_df = spark.createDataFrame(
        [(0, "alpha beta gamma alpha"), (1, "beta beta delta")],
        "doc_id long, text string",
    )
    vocab, t, v = unigram_lm_fit(fit_df)

    new = spark.createDataFrame(
        [(100, "alpha zzz"), (101, "beta"), (102, "")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "in")
    new.repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    batch = {
        r["doc_id"]: (r["n_tok"], r["d_nll"])
        for r in lm_score_rows(spark.read.parquet(src), vocab, t, v).collect()
    }

    stream = spark.readStream.schema(schema).parquet(src)
    scored = lm_score_rows(stream, vocab, t, v)
    assert scored.isStreaming
    q = (
        scored.writeStream.format("memory")
        .queryName("lm_score_stream").outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: (r["n_tok"], r["d_nll"])
            for r in spark.sql("SELECT * FROM lm_score_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch


def test_compression_ratio_rows(spark):
    """zlib-ratio quality signal: repetitive template text compresses
    far below varied prose; NULL/empty handled; streaming==batch (the
    scorer is stateless)."""
    import json as _json

    from argostats_spark.operators.textstats import compression_ratio_rows

    varied = ("the striped lighthouse keeper counted seventeen gulls "
              "while mixing cobalt paint for the harbor mural today")
    spam = "click here buy now " * 40
    df = spark.createDataFrame(
        [(0, varied * 3), (1, spam), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["zlib_ratio"]
           for r in compression_ratio_rows(df).collect()}
    assert got[3] is None and got[2] == 1.0
    assert got[1] < 0.2 < got[0] < 1.0
    assert got[1] < got[0]  # spam compresses harder


# --- blend_scores (quantile-normalize-and-blend) --------------------------


def test_blend_scores_calibrates_incomparable_units(spark):
    from argostats_spark.operators.textstats import blend_scores

    # signal a: tiny floats; signal b: huge ints; same ordering
    rows = [(i, float(i) / 1000.0, int(i * 10_000)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, a double, b long")
    out = blend_scores(df, ["a", "b"], k=4).collect()
    by_id = {r["doc_id"]: r for r in out}
    # perfectly correlated signals: normalized values agree everywhere
    for r in out:
        assert r["a_qn"] == r["b_qn"] == r["blend"]
    # quartiles: 4 distinct levels, monotone in the underlying order
    levels = sorted({r["blend"] for r in out})
    assert levels == [0.0, 1.0 / 3, 2.0 / 3, 1.0] or len(levels) == 4
    assert by_id[0]["blend"] == 0.0 and by_id[99]["blend"] == 1.0


def test_blend_scores_nulls_and_validation(spark):
    import pytest as _pt

    from argostats_spark.operators.textstats import blend_scores

    df = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, None, 20.0), (3, 3.0, None), (4, None, None),
         (5, 2.0, 15.0)],
        "doc_id long, a double, b double",
    )
    got = {r["doc_id"]: r for r in blend_scores(df, ["a", "b"], k=2).collect()}
    assert got[2]["a_qn"] is None and got[2]["blend"] == got[2]["b_qn"]
    assert got[4]["blend"] is None  # no signals at all
    with _pt.raises(ValueError, match="k must"):
        blend_scores(df, ["a"], k=1)
    with _pt.raises(ValueError, match="no signal"):
        blend_scores(df, [], k=4)


def test_blend_scores_partition_independent(spark):
    from argostats_spark.operators.textstats import blend_scores

    rows = [(i, float((i * 37) % 101), float((i * 53) % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, a double, b double")
    x = sorted(map(tuple, blend_scores(df, ["a", "b"], k=10).collect()))
    y = sorted(map(tuple,
                   blend_scores(df.repartition(11), ["a", "b"], k=10).collect()))
    assert x == y


def test_blend_scores_approx_path(spark):
    """ADVICE r8: the documented corpus-scale path (approx_percentile
    edges) must be reachable via a parameter. At high accuracy the GK
    sketch's edges land within one rank of exact, so per-doc buckets
    shift by at most one quantile step — and on a distinct-valued
    input at accuracy >> n the paths agree exactly."""
    from argostats_spark.operators.textstats import blend_scores

    rows = [(i, float((i * 37) % 101), float((i * 53) % 97)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, a double, b double").cache()
    exact = {r["doc_id"]: r["blend"]
             for r in blend_scores(df, ["a", "b"], k=4).collect()}
    approx = {r["doc_id"]: r["blend"]
              for r in blend_scores(df, ["a", "b"], k=4,
                                    exact=False).collect()}
    step = 1.0 / 3  # one quantile-bucket step at k=4, per signal
    assert set(exact) == set(approx)
    off = [i for i in exact if abs(exact[i] - approx[i]) > step / 2 + 1e-9]
    assert not off, f"approx buckets drifted more than one step: {off[:5]}"
    # NULL semantics identical on the approx path
    dn = spark.createDataFrame([(1, None, 5.0), (2, None, None)],
                               "doc_id long, a double, b double")
    got = {r["doc_id"]: r
           for r in blend_scores(dn, ["a", "b"], k=2, exact=False).collect()}
    assert got[1]["a_qn"] is None and got[2]["blend"] is None


def test_nll_deciles_join_form_equals_literal_form(docs_df):
    """materialize_edges=False (edges as a 1-row broadcast inside the
    plan — the single-job overlap form) must assign identical deciles
    to the literal-edges form: same aggregate, same bucketing rule."""
    nll = unigram_lm_nll(docs_df).cache()
    lit_form = {r["doc_id"]: r["decile"]
                for r in nll_deciles(nll, exact=False).collect()}
    join_form = {r["doc_id"]: r["decile"]
                 for r in nll_deciles(nll, exact=False,
                                      materialize_edges=False).collect()}
    assert lit_form == join_form
    nll.unpersist()


def test_bm25_matches_python_mirror(spark, docs_df):
    """bm25_scores vs a direct Python BM25 over the real corpus: same
    tokenization, same Robertson idf, same saturation; rounded 6dp."""
    from collections import Counter

    from argostats_spark.operators.textstats import bm25_scores

    terms = ["dup", "scan", "vector", "nosuchterm"]
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_scores(docs_df, terms).collect()
    }

    rows = docs_df.select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].lower().split() for r in rows}
    n = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(
        t for tk in toks.values() for t in set(tk) if t in set(terms)
    )
    want = {}
    for did, tk in toks.items():
        c = Counter(t for t in tk if t in set(terms))
        if not c:
            continue
        s = 0.0
        for t, tf in c.items():
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        want[did] = (len(c), round(s, 6))
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6)
    # real idf spread reaches the fixture: the rare term must be rarer
    assert 0 < df["dup"] < df["scan"]


def test_bm25_absent_term_and_validation(spark):
    """An absent query term contributes nothing (no phantom smoothed
    idf rows); non-matching docs are absent; empty query raises;
    empty corpus returns an empty typed frame."""
    from argostats_spark.operators.textstats import bm25_scores

    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "gamma delta"), (3, "alpha alpha")],
        "doc_id long, text string",
    )
    base = {r["doc_id"]: r["score"]
            for r in bm25_scores(df, ["alpha", "beta"]).collect()}
    plus = {r["doc_id"]: r["score"]
            for r in bm25_scores(df, ["alpha", "beta", "zzz"]).collect()}
    assert base == plus and set(base) == {1, 3}  # doc 2 matches nothing
    with pytest.raises(ValueError, match="query_terms"):
        bm25_scores(df, [])
    empty = bm25_scores(df.filter("doc_id < 0"), ["alpha"])
    assert empty.count() == 0
    assert set(empty.columns) == {"doc_id", "n_terms_matched", "score"}


def test_bm25_queries_batch_equals_single(spark, docs_df):
    """bm25_scores_queries (one corpus pass for a query batch) must
    produce, for each query, exactly bm25_scores run with that query's
    terms alone — same formula, same df, same rounding."""
    from argostats_spark.operators.textstats import (
        bm25_scores,
        bm25_scores_queries,
    )

    qsets = {0: ["dup", "scan"], 1: ["vector", "merge", "nosuch"],
             2: ["dup"]}
    queries = spark.createDataFrame(
        [(q, ts) for q, ts in qsets.items()],
        "qid long, terms array<string>",
    )
    got = {
        (r["qid"], r["doc_id"]): (r["n_terms_matched"], r["score"])
        for r in bm25_scores_queries(docs_df, queries).collect()
    }
    for q, ts in qsets.items():
        want = {
            (q, r["doc_id"]): (r["n_terms_matched"], r["score"])
            for r in bm25_scores(docs_df, ts).collect()
        }
        sub = {k: v for k, v in got.items() if k[0] == q}
        assert sub == want, f"query {q} diverged"


def test_bm25_score_rows_absent_terms_and_term_bound(spark):
    """A legitimate model with dfs={} (bm25_fit on terms that never
    occur: absent terms yield no df rows while n_docs/avgdl stay
    non-zero) must score 0.0 as documented, not IndexError (review
    finding, round 10); and the row-local form refuses a frozen term
    count past BM25_ROW_LOCAL_MAX_TERMS, naming the batched remedy."""
    from argostats_spark.operators.textstats import (
        BM25_ROW_LOCAL_MAX_TERMS,
        bm25_fit,
        bm25_score_rows,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, None)],
        "doc_id long, text string",
    )
    model = bm25_fit(df, ["zzz", "qqq"])
    assert model[0] == {} and model[1] == 3 and model[2] > 0
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_score_rows(df, model).collect()}
    assert got == {1: 0.0, 2: 0.0, 3: None}
    big = {f"t{i}": 1 for i in range(BM25_ROW_LOCAL_MAX_TERMS + 1)}
    with pytest.raises(ValueError, match="bm25_scores_queries"):
        bm25_score_rows(df, (big, 3, 2.0))
    # exactly at the bound is fine
    at = {f"t{i}": 1 for i in range(BM25_ROW_LOCAL_MAX_TERMS)}
    assert bm25_score_rows(df, (at, 3, 2.0)).count() == 3


def test_bm25_queries_empty_corpus_preserves_qid_type(spark):
    """The empty-corpus early return must carry the queries frame's
    actual qid type (a string qid previously came back as long on
    this edge only, breaking downstream unions — review finding,
    round 10)."""
    from argostats_spark.operators.textstats import bm25_scores_queries

    docs = spark.createDataFrame([], "doc_id long, text string")
    queries = spark.createDataFrame(
        [("qa", ["alpha"])], "qid string, terms array<string>"
    )
    out = bm25_scores_queries(docs, queries)
    assert out.count() == 0
    assert out.schema["qid"].dataType.simpleString() == "string"


def test_rrf_fuse_mirror_and_validation(spark):
    from argostats_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 12, 1)], "qid long, id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "qid long, id long, rank int"
    )
    got = {
        (r["qid"], r["id"]): (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([a, b], on=["qid", "id"]).collect()
    }
    assert got == {
        (0, 10): (round(1 / 61, 6), 1),
        (0, 11): (round(1 / 62 + 1 / 61, 6), 2),
        (0, 13): (round(1 / 62, 6), 1),
        (1, 12): (round(1 / 61, 6), 1),
    }
    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        rrf_fuse([], on=["id"])
    with _pt.raises(ValueError, match="k must"):
        rrf_fuse([a], on=["qid", "id"], k=0)


def test_bm25_score_rows_equals_batch_and_streams(spark, docs_df, tmp_path):
    """The frozen-model row-local scorer (bm25_fit + bm25_score_rows)
    agrees with the batch bm25_scores on every matching doc of the
    fitted corpus, keeps non-matching rows at 0.0, NULLs NULL text,
    and gates a readStream unchanged (stateless map)."""
    from argostats_spark.operators.textstats import (
        bm25_fit,
        bm25_score_rows,
        bm25_scores,
    )

    terms = ["dup", "scan", "vector"]
    model = bm25_fit(docs_df, terms)
    batch = {r["doc_id"]: r["score"]
             for r in bm25_scores(docs_df, terms).collect()}
    rows = {r["doc_id"]: r["bm25"]
            for r in bm25_score_rows(docs_df, model).collect()}
    assert set(batch) <= set(rows)
    for did, s in batch.items():
        assert rows[did] == pytest.approx(s, abs=2e-6)
    for did, s in rows.items():
        if did not in batch:
            assert s == 0.0
    # NULL text scores NULL, never 0.0
    nd = spark.createDataFrame([(99, None)], "doc_id long, text string")
    assert bm25_score_rows(nd, model).first()["bm25"] is None
    with pytest.raises(ValueError, match="non-empty"):
        bm25_fit(docs_df, [])
    with pytest.raises(ValueError, match="corpus statistics"):
        bm25_score_rows(nd, ({}, 0, 0.0))

    # streaming == batch through a memory sink
    import json as _json

    from argostats_spark.streaming.events import run_to_memory

    d = tmp_path / "bm25_stream"
    d.mkdir()
    sample = docs_df.select("doc_id", "text").limit(50).collect()
    (d / "part-000.jsonl").write_text(
        "\n".join(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                  for r in sample) + "\n"
    )
    stream = bm25_score_rows(
        spark.readStream.schema("doc_id long, text string").json(str(d)),
        model,
    )
    q = run_to_memory(stream, "bm25_rows_stream", output_mode="append")
    try:
        got = {r["doc_id"]: r["bm25"]
               for r in spark.table("bm25_rows_stream").collect()}
    finally:
        q.stop()
    want = {r["doc_id"]: rows[r["doc_id"]] for r in sample}
    assert got == want
