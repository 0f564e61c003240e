"""Corpus-level text statistics operators (round 6): the reusable forms
behind the `tfidf_lm_suite` registry query — unigram language-model
scoring (CCNet-style, Wenzek et al. 2019) and quality-decile bucketing
with both an exact and a cluster-scale path.

Green-field scope (no counterpart in the reference's oceanographic
engine); the Spark shapes are the point:

- each aggregate costs exactly one pass over the exploded corpus —
  vocabulary-sized intermediates are localCheckpointed and broadcast
  so no pass runs twice;
- the vocabulary table rides back as a broadcast (at web scale a
  100M-type vocab outgrows a broadcast — the join key is the token, so
  the same plan degrades gracefully to a shuffle join);
- exact deciles are a global sort (fine for demos/oracles); the scale
  path computes 9 approx_percentile edges — one aggregate, no global
  sort — and buckets each document against the broadcast edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens

# bm25_score_rows builds ONE column expression with a
# size(filter(...)) + saturation branch PER frozen term; past a few
# dozen terms the expression tree approaches Janino/codegen limits
# and fails with an opaque JVM error. Named bound, checked up front —
# large query sets belong in bm25_scores_queries (batched form).
BM25_ROW_LOCAL_MAX_TERMS = 64


def unigram_lm_nll(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", return_totals: bool = False,
                   vocab_df: DataFrame | None = None):
    """Per-document mean negative log-probability under an add-one-
    smoothed corpus unigram LM: (id_col, d_nll) with d_nll rounded to
    6 dp (the cross-engine determinism policy — sum order inside the
    avg is nondeterministic at ~1e-15).

    Two corpus passes (one explode+agg for the vocab table — then
    localCheckpointed, so the totals action costs a vocabulary-sized
    scan, not a second corpus pass — and one explode+join+agg for the
    per-document score); the smoothing denominator T+V comes back as
    two scalars (driver traffic is 16 bytes, not data). With
    ``return_totals`` the
    (df, total_tokens, vocab_size) triple is returned so callers that
    also report the totals don't recount the corpus.

    ``vocab_df`` (round 12): a precomputed corpus unigram table
    (tok, c) — callers that already aggregated the corpus's tokens
    (e.g. a TF-IDF pass whose (source, tok) counts re-aggregate to
    exactly this table at vocabulary-sized cost) pass it here and the
    LM fit pays NO corpus pass of its own; only the scoring explode
    remains. The counts must cover the SAME documents/tokenizer or
    the model is silently wrong — same-contract note as tokens().
    """
    d = docs.select(id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    # one corpus pass builds the vocab table (unless the caller hands
    # one in); localCheckpoint it so the totals action and the
    # broadcast join below both reuse the materialized
    # (vocabulary-sized) result instead of re-exploding the corpus
    vocab = (
        vocab_df.select("tok", "c") if vocab_df is not None
        else d.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=True)
    tot = vocab.agg(
        F.sum("c").cast("long").alias("t"), F.count(F.lit(1)).alias("v")
    ).first()
    if tot["t"] is None:  # empty corpus (or all-empty documents)
        id_type = docs.schema[id_col].dataType.simpleString()
        empty = docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, d_nll double"
        )
        return (empty, 0, 0) if return_totals else empty
    t_total, v_size = int(tot["t"]), int(tot["v"])
    m_nlp = -F.log((F.col("c") + F.lit(1.0)) / F.lit(float(t_total + v_size)))
    out = (
        d.join(F.broadcast(vocab.select("tok", m_nlp.alias("m_nlp"))), "tok")
        .groupBy(id_col)
        .agg(F.round(F.avg("m_nlp"), 6).alias("d_nll"))
    )
    return (out, t_total, v_size) if return_totals else out


def nll_deciles(nll: DataFrame, id_col: str = "doc_id",
                exact: bool = True,
                materialize_edges: bool = True) -> DataFrame:
    """Assign each scored document a quality decile (1..10, 1 = lowest
    NLL = most in-distribution): (id_col, d_nll, decile).

    exact=True: ntile over a global (d_nll, id) sort — deterministic
    and oracle-hashable, but the sort funnels through one task; use for
    tests/small corpora.

    exact=False (the 100 TB path): one approx_percentile aggregate
    yields the 9 inner decile edges; documents bucket against the
    broadcast edge array with zero global sort. Bucket POPULATIONS
    match the exact path only as closely as the sketch allows
    (relativeError 1e-4 → ±0.01% of rows near each edge); bucket
    IDENTITY for any document farther than the sketch error from an
    edge is identical — pinned by test_textstats.py.

    ``materialize_edges``: True collects the 9 edges to the driver
    (one action at call time) and buckets against literals — right
    when the caller will reuse the result across jobs. False keeps the
    edges INSIDE the plan: a 1-row aggregate broadcast back on a
    constant join key, so the whole thing stays lazy and runs in the
    SAME job as sibling branches (full stage overlap — the
    tfidf_lm_suite de-overlap fix, round 9). Identical bucketing rule
    either way (edge strictly below the score)."""
    if exact:
        w = W.orderBy(F.col("d_nll").asc(), F.col(id_col).asc())
        return nll.withColumn("decile", F.ntile(10).over(w).cast("long"))
    qs = [i / 10.0 for i in range(1, 10)]
    if not materialize_edges:
        e = nll.groupBy(F.lit(1).alias("__j")).agg(
            F.percentile_approx("d_nll", qs, 10000).alias("__e")
        )
        # NULL edges (every d_nll NULL) must yield NULL deciles like
        # the materialized path — without the guard, size(filter(NULL))
        # is -1 under legacy mode and the decile came out 0 (review
        # finding, round 9)
        dec = F.when(
            F.col("__e").isNotNull(),
            F.lit(1) + F.size(
                F.filter(F.col("__e"), lambda x: x < F.col("d_nll"))
            ),
        )
        return (
            nll.withColumn("__j", F.lit(1))
            .join(F.broadcast(e), "__j")
            .withColumn("decile", dec.cast("long"))
            .drop("__j", "__e")
        )
    edges_row = nll.agg(
        F.percentile_approx("d_nll", F.lit(qs), 10000).alias("e")
    ).first()
    if edges_row["e"] is None:  # empty input: keep the output schema
        return nll.withColumn("decile", F.lit(None).cast("long"))
    edges = list(edges_row["e"])
    edge_arr = F.array(*[F.lit(float(e)) for e in edges])
    # decile = 1 + number of edges strictly below the score: documents
    # exactly ON an edge land in the lower bucket, matching ntile's
    # closed-left behavior up to sketch error
    decile = F.lit(1) + F.size(F.filter(edge_arr, lambda e: e < F.col("d_nll")))
    return nll.withColumn("decile", decile.cast("long"))


def bigram_lm_nll(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", lam: float = 0.7) -> DataFrame:
    """Jelinek–Mercer interpolated bigram LM scoring — the step between
    the CCNet-style unigram LM above and a real KenLM: per-document
    mean negative log-probability under

        p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·p₁(w₂)

    with p₁ the add-one unigram model and c(w₁·) the exact context
    count (Σ_w₂ c(w₁w₂), derived from the bigram table itself so doc-
    final tokens are handled exactly, not approximated by c(w₁)). The
    first token of each document scores −ln p₁(w₁); documents with no
    tokens are absent (the unigram contract). Output: (id_col, n_tok,
    b_nll) with b_nll rounded to 6 dp.

    Spark shape: the token array is staged once per document
    (row-local; the same CollapseProject discipline as gram_rows), the
    bigram pair stream is an in-row zip_with explode — no window, no
    shuffle until the counts aggregate. Three vocabulary-bounded
    aggregates (unigrams, bigrams, contexts), the model tables ride
    back as broadcasts (a web-scale bigram table outgrows a broadcast —
    the join keys are the words, so the plan degrades to shuffle
    joins), one per-document aggregate. Like the unigram scorer this
    scores the FITTED corpus: a bigram absent from the model would
    null out at inference time — interpolation masks unseen bigrams
    only when λ < 1 and the w₂ unigram exists."""
    tkd = (
        docs.select(id_col, tokens(F.lower(F.col(text_col))).alias("tk"))
        .where(F.size("tk") > 0)
    )
    uni = (
        tkd.select(F.explode("tk").alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = uni.agg(F.sum("c").cast("long").alias("t"),
                  F.count(F.lit(1)).alias("v")).first()
    t_total, v_size = int(tot["t"]), int(tot["v"])
    p1 = (F.col("c") + F.lit(1.0)) / F.lit(float(t_total + v_size))
    uni_p = uni.select("tok", p1.alias("p1"))

    pairs = tkd.select(
        id_col,
        F.size("tk").cast("long").alias("n_tok"),
        F.element_at("tk", 1).alias("w_first"),
        F.explode_outer(
            F.zip_with(
                F.slice(F.col("tk"), F.lit(1), F.size("tk") - 1),
                F.slice(F.col("tk"), F.lit(2), F.size("tk") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    )
    big = (
        pairs.where(F.col("p").isNotNull())
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cb"))
        .localCheckpoint(eager=True)
    )
    ctx = big.groupBy("w1").agg(F.sum("cb").cast("long").alias("cw"))
    bprob = big.join(ctx, "w1").select(
        "w1", "w2", (F.col("cb") / F.col("cw")).alias("pb")
    )

    # per-bigram-position term; explode_outer keeps 1-token docs (their
    # p is NULL → term 0, only the first-token term contributes)
    term = F.when(
        F.col("p").isNull(), F.lit(0.0)
    ).otherwise(
        -F.log(F.lit(lam) * F.col("pb") + F.lit(1.0 - lam) * F.col("p1"))
    )
    scored = (
        pairs.join(
            F.broadcast(bprob),
            (F.col("p.w1") == F.col("w1")) & (F.col("p.w2") == F.col("w2")),
            "left",
        )
        .join(F.broadcast(uni_p), F.col("p.w2") == F.col("tok"), "left")
        .groupBy(id_col, "n_tok", "w_first")
        .agg(F.sum(term).alias("bi_sum"))
    )
    first_term = -F.log(F.col("p1"))
    return (
        scored.join(
            F.broadcast(uni_p.select(F.col("tok").alias("w_first"),
                                     F.col("p1"))),
            "w_first",
        )
        .select(
            id_col,
            "n_tok",
            F.round((first_term + F.col("bi_sum")) / F.col("n_tok"), 6)
            .alias("b_nll"),
        )
    )


def unigram_lm_fit(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int, int]:
    """Fit the add-one-smoothed corpus unigram LM once and hand back
    the reusable model: (vocab, t_total, v_size) where vocab is the
    materialized (tok, c) table (localCheckpointed — fitting costs one
    corpus pass, every later scorer reuses the result). This is the
    fit half of :func:`unigram_lm_nll`, split out so the model can be
    applied to NEW documents (:func:`lm_score_rows`) — quality-gating
    a fresh crawl against last month's corpus model, the score-at-
    ingest shape — instead of only scoring the corpus it was fitted
    on."""
    d = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    vocab = (
        d.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = vocab.agg(
        F.sum("c").cast("long").alias("t"), F.count(F.lit(1)).alias("v")
    ).first()
    t_total = int(tot["t"]) if tot["t"] is not None else 0
    v_size = int(tot["v"]) if tot["v"] is not None else 0
    return vocab, t_total, v_size


def lm_score_rows(
    docs: DataFrame,
    vocab: DataFrame,
    t_total: int,
    v_size: int,
    text_col: str = "text",
    max_literal_vocab: int = 10_000,
) -> DataFrame:
    """Inference-time unigram-LM scoring (VERDICT r6 item 6): apply a
    FITTED model (from :func:`unigram_lm_fit`) to any frame — new
    documents, the fitted corpus, or a readStream — adding ``n_tok``
    and ``d_nll`` columns while keeping the frame ROW-SHAPED. The same
    dense-model/row-local pattern as ``dsir_score_rows``: no shuffle,
    no state, no output-mode constraints — a stateless streaming map.

    Model transport picks itself by vocabulary size:

    - up to ``max_literal_vocab`` types: the tok → −ln p map rides as
      a ``create_map`` LITERAL and the per-document mean is an in-row
      fold — pure codegen expression, zero Python;
    - beyond that: the collected dict ships once per executor inside
      an Arrow-batched pandas UDF (a literal map's expression tree
      and a broadcast-join's aggregate are both wrong here: the first
      hits expression-size limits, the second forfeits row shape and
      streaming statelessness). Never a row-at-a-time Python UDF.

    Semantics vs the fitted-corpus scorer (:func:`unigram_lm_nll`):

    - on the FITTED corpus the two paths agree exactly (pinned by
      test) except that zero-token documents, which the batch explode
      path omits, are kept here with ``d_nll = NULL`` (not 0.0 — a
      fake best-possible score would sail through a quality gate);
    - tokens the fit never saw score the add-one smoothing floor
      −ln(1/(T+V)) — the model's actual probability for an unseen
      type, exactly what a new corpus needs (the batch path's inner
      join would silently DROP them, deflating OOV documents' NLL).
    """
    import math

    if t_total + v_size <= 0:
        raise ValueError(
            "lm_score_rows: empty fitted model (t_total + v_size == 0) — "
            "fit on a non-empty corpus first (unigram_lm_fit)"
        )
    floor = -math.log(1.0 / (t_total + v_size))
    model_rows = vocab.collect()  # vocabulary-sized by contract
    nlp = {
        r["tok"]: -math.log((r["c"] + 1.0) / (t_total + v_size))
        for r in model_rows
    }
    tk = tokens(F.lower(F.col(text_col)))
    if len(nlp) <= max_literal_vocab:
        pairs: list = []
        for t, v in nlp.items():
            pairs.extend([F.lit(t), F.lit(v)])
        m = F.create_map(*pairs) if pairs else F.create_map()
        total = F.aggregate(
            tk,
            F.lit(0.0),
            lambda acc, x: acc + F.coalesce(F.element_at(m, x), F.lit(floor)),
        )
        d_nll = F.when(
            F.size(tk) > 0, F.round(total / F.size(tk), 6)
        )  # otherwise NULL
        return docs.withColumn("n_tok", F.size(tk).cast("long")).withColumn(
            "d_nll", d_nll
        )

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # dict is closure-captured: pickled once into the UDF payload,
    # shipped once per executor, shared across Arrow batches.
    # annotations set explicitly because this module's
    # `from __future__ import annotations` would stringify inline
    # hints, which pandas_udf's signature inspection cannot resolve.
    def _score_fn(toks):
        def one(ts):
            if ts is None or len(ts) == 0:
                return None
            return round(sum(nlp.get(t, floor) for t in ts) / len(ts), 6)

        return toks.apply(one)

    _score_fn.__annotations__ = {"toks": pd.Series, "return": pd.Series}
    _score = pandas_udf(_score_fn, "double")

    return docs.withColumn("n_tok", F.size(tk).cast("long")).withColumn(
        "d_nll", _score(tk)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 (Robertson et al., TREC-3; the Lucene-default scoring
    form) of every document against a bag-of-terms query — the standard
    lexical retrieval scorer a training-data pipeline uses for
    fuzzy eval-set decontamination (rank corpus docs against each eval
    question, audit the head) and query-targeted data selection (the
    lexical complement to DSIR's hashed-ngram importance weights).

    Returns (id_col, n_terms_matched, score) for every document
    matching >= 1 query term, score rounded to 6 dp (the cross-engine
    determinism policy):

        score = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
                  · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    with tf the term's count in the doc, dl the doc's token count,
    N/avgdl corpus totals. Terms absent from the corpus contribute
    nothing (no +0.5 phantom idf rows — they generate no match rows).

    Scale shape: the corpus explode filters to query terms BEFORE the
    exchange (a row-local isin on a literal set), so the one keyed
    shuffle carries only matching tokens — queries are words, corpora
    are 100 TB; the match stream is closer to query-side-sized. The
    df table is term-bounded and broadcast; N and avgdl come back as
    two scalars (one tiny action, the blend_scores convention). dl is
    computed row-locally pre-explode, so no second corpus pass."""
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    qt = sorted({t.lower() for t in query_terms})
    tk = docs.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).select(id_col, F.size("__toks").alias("__dl"), F.col("__toks"))
    row = tk.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__dl").alias("avgdl"),
    ).first()
    n_docs, avgdl = row["n"], row["avgdl"]
    if not n_docs or not avgdl:
        id_type = docs.schema[id_col].dataType.simpleString()
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, n_terms_matched int, score double"
        )
    matches = (
        tk.select(id_col, "__dl", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(qt))
    )
    tf_tbl = matches.groupBy(id_col, "__dl", "__t").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    df_tbl = tf_tbl.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    sat = (
        F.col("__tf").cast("double") * F.lit(k1 + 1.0)
    ) / (
        F.col("__tf")
        + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("__dl") / F.lit(float(avgdl))
        )
    )
    return (
        tf_tbl.join(F.broadcast(df_tbl), "__t")
        .withColumn("__s", idf * sat)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
            F.round(F.sum("__s"), 6).alias("score"),
        )
    )


def bm25_scores_queries(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batched multi-query BM25 — ONE corpus pass for ANY number of
    queries (the retrieval shape an eval-decontamination sweep runs:
    thousands of benchmark questions against a 100 TB corpus, never
    one corpus scan per question). ``queries`` is (qid, terms
    array<string>, pre-normalized by the caller); returns
    (qid, id_col, n_terms_matched, score) with the identical formula
    and 6 dp rounding as :func:`bm25_scores` — pinned equal on shared
    terms by test.

    Scale shape: the query-term table is exploded and BROADCAST; the
    corpus explode joins it row-locally, so the one keyed exchange
    carries only (query, matching-token) rows. df is derived from the
    matched (doc, term) set (never a second corpus pass) and the tf
    table is lazily localCheckpointed because two consumers read it
    (the df aggregate and the scoring join — the dsir_logratio
    lesson). N/avgdl are two scalars in one tiny action."""
    tk = docs.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).select(id_col, F.size("__toks").alias("__dl"), F.col("__toks"))
    row = tk.agg(
        F.count(F.lit(1)).alias("n"), F.avg("__dl").alias("avgdl")
    ).first()
    n_docs, avgdl = row["n"], row["avgdl"]
    id_type = docs.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[qid_col].dataType.simpleString()
    if not n_docs or not avgdl:
        return docs.sparkSession.createDataFrame(
            [],
            f"{qid_col} {qid_type}, {id_col} {id_type}, "
            "n_terms_matched int, score double",
        )
    qt = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(F.col(terms_col))).alias("__t"),
    )
    matches = (
        tk.select(id_col, "__dl", F.explode("__toks").alias("__t"))
        .join(F.broadcast(qt), "__t")
    )
    tf_tbl = matches.groupBy(qid_col, id_col, "__dl", "__t").agg(
        F.count(F.lit(1)).alias("__tf")
    ).localCheckpoint(eager=False)
    # df is per TERM over the corpus (query-independent): distinct
    # (doc, term) from the matched set — a term shared by two queries
    # must not double-count its documents
    df_tbl = (
        tf_tbl.select(id_col, "__t").distinct()
        .groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    sat = (
        F.col("__tf").cast("double") * F.lit(k1 + 1.0)
    ) / (
        F.col("__tf")
        + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("__dl") / F.lit(float(avgdl))
        )
    )
    return (
        tf_tbl.join(F.broadcast(df_tbl), "__t")
        .withColumn("__s", idf * sat)
        .groupBy(qid_col, id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
            F.round(F.sum("__s"), 6).alias("score"),
        )
    )


def bm25_fit(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
) -> tuple[dict[str, int], int, float]:
    """Freeze the BM25 corpus statistics a scorer needs: (df_by_term,
    n_docs, avgdl) for ``query_terms`` over ``docs``. One corpus pass
    (dl + matched-term explode into a single mixed aggregate would
    Expand; two aggregates over the SAME scan stay cheap because the
    df side is match-filtered row-locally first). The returned model
    is O(|query_terms|) — collect-and-ship is the point."""
    if not query_terms:
        raise ValueError("bm25_fit: query_terms must be non-empty")
    qt = sorted({t.lower() for t in query_terms})
    tk = docs.select(
        tokens(F.lower(F.col(text_col))).alias("__toks")
    ).select(F.size("__toks").alias("__dl"), F.col("__toks"))
    row = tk.agg(
        F.count(F.lit(1)).alias("n"), F.avg("__dl").alias("avgdl")
    ).first()
    n_docs, avgdl = int(row["n"] or 0), row["avgdl"]
    dfs = {
        r["__t"]: int(r["__df"])
        for r in (
            tk.select(F.explode(F.array_distinct("__toks")).alias("__t"))
            .filter(F.col("__t").isin(qt))
            .groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
            .collect()
        )
    }
    return dfs, n_docs, float(avgdl or 0.0)


def bm25_score_rows(
    docs: DataFrame,
    model: tuple[dict[str, int], int, float],
    text_col: str = "text",
    out_col: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Inference-time BM25 against a FROZEN model (from
    :func:`bm25_fit`): adds ``out_col`` while keeping the frame
    ROW-SHAPED — the lm_score_rows / dsir_score_rows score-at-ingest
    shape (no shuffle, no state, no output-mode constraints — a
    stateless streaming map, so the same call gates a readStream).

    Per-term tf is an in-row count over the token array; idf constants
    fold at the driver from the frozen (df, N); the saturation uses
    the frozen avgdl. Docs matching no term score 0.0 (a valid "not
    relevant" — unlike lm_score_rows' NULL-for-unscorable, a zero here
    IS the scorer's answer); NULL text scores NULL. On the fitted
    corpus the scores equal :func:`bm25_scores` for every matching doc
    (pinned by test; score_rows additionally keeps the non-matching
    rows)."""
    import math

    dfs, n_docs, avgdl = model
    if n_docs <= 0 or not avgdl:
        raise ValueError(
            "bm25_score_rows: model has no corpus statistics "
            "(n_docs/avgdl empty) — fit on a non-empty corpus"
        )
    if len(dfs) > BM25_ROW_LOCAL_MAX_TERMS:
        raise ValueError(
            f"bm25_score_rows: {len(dfs)} frozen terms exceeds "
            f"BM25_ROW_LOCAL_MAX_TERMS={BM25_ROW_LOCAL_MAX_TERMS} — "
            "each term adds a size(filter(...)) branch to ONE column "
            "expression, and thousands of branches blow the codegen "
            "limit with an opaque JVM error. For large query sets use "
            "bm25_scores_queries (the batched form: one corpus pass, "
            "broadcast query-term table)."
        )
    toks = tokens(F.lower(F.col(text_col)))
    dl = F.size(toks)
    denom_tail = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl))
    )
    parts = []
    for t in sorted(dfs):
        idf = math.log(1 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
        tf = F.size(F.filter(toks, lambda x: x == F.lit(t)))
        parts.append(
            F.when(
                tf > 0,
                F.lit(idf) * tf.cast("double") * F.lit(k1 + 1.0)
                / (tf + denom_tail),
            ).otherwise(F.lit(0.0))
        )
    # dfs can legitimately be empty: bm25_fit returns {} when none of
    # the query terms occur in the corpus (absent terms produce no df
    # rows while n_docs/avgdl stay non-zero) — every doc then scores
    # the documented 0.0, not an IndexError
    total = parts[0] if parts else F.lit(0.0)
    for p in parts[1:]:
        total = total + p
    return docs.withColumn(
        out_col,
        F.when(F.col(text_col).isNotNull(), F.round(total, 6)),
    )


def compression_ratio_rows(
    docs: DataFrame,
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Gopher-style compression-ratio quality signal: adds
    ``zlib_ratio`` = compressed bytes / raw utf-8 bytes (DEFLATE at
    ``level``; NULL for NULL text, 1.0 for empty text). Machine-
    generated boilerplate and template spam compress far below human
    prose (~0.3-0.5 for English text; <0.2 flags repetition the
    token-level Gopher stats can miss because it spans lines, not
    n-grams).

    Row-local and stateless (Arrow-batched over stdlib zlib — there is
    no JVM-side DEFLATE expression, and the ~1 µs/KB cost is
    compression itself, not Python overhead), so it scores a batch
    frame or a readStream unchanged — the same score-at-ingest shape
    as lm_score_rows.

    Implemented as ``mapInPandas`` rather than a scalar pandas UDF ON
    PURPOSE: mapInPandas is an optimizer-opaque boundary, so the text
    expression is fully evaluated BELOW it and downstream filters on
    ``zlib_ratio`` stay attribute references above it. A scalar
    pandas_udf here is a landmine when ``text_col`` is itself a
    higher-order expression (e.g. the rebuilt ``text_dedup`` from
    remove_duplicate_passages): predicate pushdown substitutes the
    UDF-with-lambda-args into the Filter and Spark 4.1 dies with
    INTERNAL_ERROR "Cannot evaluate expression" (reproduced in the
    crawl-to-packs capstone, r8; marking the UDF nondeterministic just
    moves the failure to the count() pruning path)."""
    import zlib

    from pyspark.sql import types as T

    def run(batches):
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, level)) / len(raw)

        for pdf in batches:
            pdf = pdf.copy()
            pdf["zlib_ratio"] = pdf[text_col].map(one)
            yield pdf

    schema = T.StructType(
        list(docs.schema.fields) + [T.StructField("zlib_ratio", T.DoubleType())]
    )
    return docs.mapInPandas(run, schema)



def blend_scores(
    df: DataFrame,
    cols: list[str],
    k: int = 4,
    out_col: str = "blend",
    round_digits: int = 9,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Quantile-normalize-and-blend: calibrate heterogeneous quality
    signals (an LM NLL in nats, a classifier probability, a length)
    onto one comparable [0, 1] scale and average them - how a curation
    pipeline combines signals whose units and distributions have
    nothing in common (the FineWeb-style multi-classifier blend).

    Each signal maps to its quantile bucket: one EXACT percentile
    aggregate yields k-1 edges per signal (k·|cols| doubles of driver
    traffic), and each row's bucket is the count of edges strictly
    below its value - a row-local fold over broadcast literals, zero
    joins, zero shuffles after the edges agg. normalized = bucket/(k-1):
    0 for the bottom bucket, 1 for the top. ``out_col`` is the
    mean of the normalized signals; per-signal columns land as
    ``<col>_qn``. Values and edges compare ROUNDED to ``round_digits``
    (round-before-compare: cross-engine edge interpolation agrees to
    the last ulp, the rounding makes bucket boundaries identical -
    the stats_suite quantile limb pins the interpolation equality).

    NULL signals contribute NULL normalized values; the blend averages
    the NON-NULL normalized signals (aggregate semantics), so a doc
    missing one signal is scored by the others rather than dropped.

    At corpus scale pass ``exact=False``: the edges aggregate becomes
    ``approx_percentile`` (Greenwald-Khanna sketch at ``accuracy``,
    rank error <= 1/accuracy) — same plan shape, sketch-accurate
    edges, no multi-GB sort behind the exact percentile (ADVICE r8:
    the documented scale path is now a parameter, not a fork). Either
    way the edges aggregate is its own ACTION before the row-local
    bucketing plan — cache ``df`` first or its lineage is computed
    twice."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not cols:
        raise ValueError("blend_scores: no signal columns")
    qs = [i / k for i in range(1, k)]
    if exact:
        pct = lambda c: F.percentile(F.col(c).cast("double"), F.lit(qs))  # noqa: E731
    else:
        pct = lambda c: F.percentile_approx(  # noqa: E731
            F.col(c).cast("double"), F.lit(qs), F.lit(accuracy)
        )
    row = df.agg(*[pct(c).alias(c) for c in cols]).first()
    # an all-NULL signal (or empty frame) has no percentiles: that
    # signal normalizes to NULL everywhere and the blend averages the
    # rest (the same per-row missing-signal rule, applied column-wide)
    edges = {
        c: (None if row[c] is None else [float(x) for x in row[c]])
        for c in cols
    }

    out = df
    for c in cols:
        if edges[c] is None:
            out = out.withColumn(f"{c}_qn", F.lit(None).cast("double"))
            continue
        v = F.round(F.col(c).cast("double"), round_digits)
        bucket = None
        for e in edges[c]:
            hit = F.when(v > F.round(F.lit(e), round_digits), 1).otherwise(0)
            bucket = hit if bucket is None else bucket + hit
        out = out.withColumn(
            f"{c}_qn",
            F.when(
                F.col(c).isNotNull(),
                F.round(
                    bucket.cast("double") / F.lit(float(k - 1)), round_digits
                ),
            ),
        )
    qn_cols = [F.col(f"{c}_qn") for c in cols]
    n_present = sum(
        (F.when(q.isNotNull(), 1).otherwise(0) for q in qn_cols), F.lit(0)
    )
    total = sum((F.coalesce(q, F.lit(0.0)) for q in qn_cols), F.lit(0.0))
    return out.withColumn(
        out_col,
        F.when(n_present > 0, F.round(total / n_present, round_digits)),
    )
