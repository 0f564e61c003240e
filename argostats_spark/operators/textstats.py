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


def unigram_lm_nll(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", return_totals: bool = False):
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
    """
    d = docs.select(id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    # one corpus pass builds the vocab table; localCheckpoint it so the
    # totals action and the broadcast join below both reuse the
    # materialized (vocabulary-sized) result instead of re-exploding the
    # corpus a second time
    vocab = d.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
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
                exact: bool = True) -> DataFrame:
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
    """
    if exact:
        w = W.orderBy(F.col("d_nll").asc(), F.col(id_col).asc())
        return nll.withColumn("decile", F.ntile(10).over(w).cast("long"))
    edges_row = nll.agg(
        F.percentile_approx(
            "d_nll", [i / 10.0 for i in range(1, 10)], 10000
        ).alias("e")
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
