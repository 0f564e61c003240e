"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick the k raw-corpus documents that look most like
a small high-quality target corpus, by importance weights computed in
a hashed n-gram feature space, sampled without replacement via Gumbel
top-k.

Green-field scope (no counterpart in the reference's oceanographic
engine): this is the standard published technique for targeted
pre-training-data selection, and it slots between quality filtering
and tokenization in a 100 TB corpus build.

The math (paper §3, bag-of-hashed-ngrams instantiation):

- every word unigram and bigram is hashed into one of B buckets;
- two multinomials are fit over bucket counts — p̂ on the target
  corpus, q̂ on the raw corpus — with add-α smoothing
  (p̂_b = (c_b + α) / (T + α·B));
- a document's importance log-weight is Σ_b c_b·(ln p̂_b − ln q̂_b),
  i.e. its gram count vector dotted with the bucket log-ratio λ;
- k documents are drawn WITHOUT replacement with probability
  ∝ exp(logw / temperature) via the Gumbel top-k trick: rank by
  logw/temperature + g_i, g_i ~ Gumbel(0,1), take the top k.

Determinism policy (matches operators/sampling.py): the Gumbel noise
is content-derived, never rand() — u_i comes from the md5 of
(salt‖doc_id), so the selection is byte-identical on every run, every
partitioning, every engine (DuckDB computes the identical u_i; that is
the oracle). Ranking compares ROUNDED (6 dp) scores with a doc-id
tiebreak so a 1-ulp ln() difference between libm implementations can
never flip an ordering.

Scale shape (the point of the Spark re-expression):

- feature extraction is a row-local explode — no shuffle until the
  (id, bucket) aggregate;
- the fitted model is a ≤B-row λ table (B defaults to 4096; the paper
  uses 10k) — broadcast back, never a corpus reshuffle;
- the fit and the scoring pass SHARE one lazy per-doc (id, bucket)
  aggregate: the fit's raw side re-aggregates it to (bucket, cr)
  (map-side partials → ≤B rows per mapper), the target side is one
  gram pass, the corpus totals are window sums over the ≤B-row
  table — no collect, no checkpoint, so every consumer compiles into
  ONE physical plan and AQE stage reuse tokenizes the raw corpus
  ONCE per action (at 100 TB a REUSED-ACROSS-JOBS per-doc feature
  table belongs in a parquet table, not an in-memory pin — see
  dsir_select's docstring for the measured sf1 stall that taught
  this);
- selection is orderBy(...).limit(k) — TakeOrdered (per-partition
  top-k, then a k-row driver merge), never a global sort.

Shuffle inventory: per-doc features 1 (keyed (id, bucket), shared by
scoring and the fit via stage reuse), fit 1 (B-bounded — map-side
partials collapse the tagged union to ≤B rows per mapper), scoring 1
(keyed id). Nothing quadratic, nothing driver-side except the k
selected rows and (for the streaming path) the B-float dense model.

Score-at-ingest: :func:`dsir_score_rows` applies the trained model as
a ZERO-shuffle ZERO-state row-local expression (the model is a
length-B array literal), so the identical call scores a batch frame
or a readStream — the stateless-map shape a production ingest gate
runs. Selection (top-k) stays batch; a stream can gate on
``logw >= threshold`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import tokens, word_ngrams

__all__ = [
    "hashed_gram_buckets",
    "gram_rows",
    "doc_bucket_counts",
    "fused_bucket_counts",
    "fused_bucket_totals",
    "dsir_logratio",
    "dsir_logratio_fused",
    "dsir_logratio_direct",
    "dsir_logratio_shared",
    "dsir_scores",
    "gumbel_key",
    "dsir_resample",
    "dsir_select",
    "dense_lambda",
    "dsir_score_rows",
]


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def hashed_gram_buckets(text, n_buckets: int = 4096,
                        hasher: str = "md5") -> Column:
    """Array of feature-bucket ids (bigint, [0, n_buckets)) for every
    word unigram AND bigram of ``text`` — the hashed n-gram feature map
    of DSIR §3, as one array expression.

    Bucket (md5, the default) = first 8 hex chars of md5 → 32-bit int
    → mod. md5 is the cross-engine hash family (identical in Spark and
    DuckDB, see sampling.hash_bucket); repeated grams repeat their
    bucket — counts are carried by multiplicity, not pre-aggregated
    here. ``hasher="xxhash64"`` is the production fast path (same
    convention as sample_state's family knob): pmod(xxhash64(gram), B)
    — native codegen, measured −29% on the sf0.1 feature pass (round
    13), deterministic within Spark but NOT DuckDB-replayable, so the
    driver-hashed registry keeps md5. Fit and scoring must share ONE
    family — buckets from different hashers are different feature
    spaces and the λ model is silently wrong across them.

    This is the convenience/array API. The hot path
    (:func:`gram_rows`) does NOT use it: nested higher-order lambdas
    that reference the token-array expression re-inline the whole
    token pipeline per element (the measured-90× CollapseProject
    pitfall, SCALE.md "repetition stats") and the md5 lambda itself
    runs interpreted — staging the token array as a projected column
    and hashing AFTER the explode keeps everything scalar codegen
    (measured: warm dsir_select 7.1 s → 3.0 s on the sf0.1 corpus)."""
    _check_hasher(hasher)
    unis = F.transform(tokens(_c(text)), lambda t: F.lower(t))
    grams = F.concat(unis, word_ngrams(_c(text), 2))
    if hasher == "xxhash64":
        return F.transform(
            grams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets))
        )
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets),
    )


def _check_hasher(hasher: str) -> None:
    if hasher not in ("md5", "xxhash64"):
        raise ValueError(
            f'hasher must be "md5" or "xxhash64", got {hasher!r}'
        )


def _bucket_of(gram: Column, n_buckets: int, hasher: str = "md5") -> Column:
    _check_hasher(hasher)
    if hasher == "xxhash64":
        return F.pmod(F.xxhash64(gram), F.lit(n_buckets)).alias("bucket")
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).alias("bucket")


def gram_rows(docs: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """(id..., gram) rows — one per unigram/bigram occurrence. The
    token array is staged as a projected column (CollapseProject
    leaves non-cheap aliased expressions alone) so the bigram zip_with
    references a cheap attribute, never re-tokenizes; everything after
    the explode is scalar whole-stage codegen."""
    tk = docs.select(*id_cols, tokens(F.lower(F.col(text_col))).alias("tk"))
    bigrams = F.when(
        F.size("tk") >= 2,
        F.zip_with(
            F.slice(F.col("tk"), F.lit(1), F.size("tk") - 1),
            F.slice(F.col("tk"), F.lit(2), F.size("tk") - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = tk.select(*id_cols, F.concat(F.col("tk"), bigrams).alias("grams"))
    return grams.select(*id_cols, F.explode("grams").alias("gram"))


def doc_bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    hasher: str = "md5",
) -> DataFrame:
    """Per-document hashed-ngram feature vector in sparse (id, bucket,
    c) form. One explode (row-local) + one (id, bucket) aggregate —
    the only corpus-keyed shuffle DSIR ever does with document text.

    The explicit ``isnotnull(bucket)`` filter is a row-wise no-op
    (the bucket hash of a non-null gram is never NULL) placed for
    PLAN CANONICALIZATION: an inner join on ``bucket`` downstream
    pushes exactly this predicate into joined copies of the subtree
    but not into non-join consumers (e.g. a totals aggregate), and
    that asymmetry defeats AQE stage reuse between
    :func:`dsir_select`'s scoring and fit references — the raw corpus
    would be tokenized once per divergent copy. With the filter
    explicit, every consumer sees the same canonical subtree and the
    join-inferred duplicate is pruned by constraint propagation
    (plan-pinned in tests)."""
    return (
        gram_rows(docs, text_col, [id_col])
        .select(id_col, _bucket_of(F.col("gram"), n_buckets, hasher))
        .where(F.col("bucket").isNotNull())
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def fused_bucket_counts(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    hasher: str = "md5",
) -> DataFrame:
    """ONE gram pass for BOTH corpora (round 12; VERDICT r11 item 3 —
    the cum_lam limb fusion): raw and target rows are tagged and
    unioned, then a single explode + (side, id, bucket) aggregate
    produces the feature table every downstream consumer re-aggregates
    from. Target ids are NULLed (the fit only needs target TOTALS, so
    all target docs collapse into one group per bucket at the
    aggregate — the per-doc granularity would be wasted rows).

    Returns (__side 'r'|'t', id, bucket, c), localCheckpointed EAGERLY:
    three consumers read it (raw per-doc features for scoring, raw
    bucket totals, target bucket totals) and each is a
    state-table-sized re-aggregation — the corpus text is tokenized
    exactly once, in one stage chain instead of two. Measured on the
    dsir_select bench row: 3.25 → 2.09 s fresh-JVM at sf0.1 (A/B with
    an input spread later dropped — see below; shipped fusion-only
    re-confirmed at 2.50 s under 1-min load ~3.7), identical
    selection + λ (scripts/bench_dsir_lam_ab.py; SCALE.md "dsir fit
    stage")."""
    id_type = raw_docs.schema[id_col].dataType
    tagged = raw_docs.select(
        F.col(id_col), F.col(text_col), F.lit("r").alias("__side")
    ).unionByName(
        target_docs.select(
            F.lit(None).cast(id_type).alias(id_col),
            F.col(text_col),
            F.lit("t").alias("__side"),
        )
    )
    # NO input spread here (round-12 sf1 finding): the fused pass is
    # consumed through an eager checkpoint built fresh per call, and
    # the spread's full-text RoundRobin shuffle interleaving with the
    # checkpoint write produced erratic multi-10s stalls at sf1
    # (5.5-47 s run-to-run vs a stable 4.5 s without; SCALE.md "dsir
    # fit stage", sf1 postscript). The fusion alone carries the win.
    g = gram_rows(tagged, text_col, [id_col, "__side"])
    return (
        g.select(id_col, "__side",
                 _bucket_of(F.col("gram"), n_buckets, hasher))
        .groupBy("__side", id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )


def dsir_logratio(
    target_bucket_totals: DataFrame,
    raw_bucket_totals: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    return_floor: bool = False,
):
    """The fitted model: (bucket, lam) with
    lam = ln((ct + α)/(T + α·B)) − ln((cr + α)/(R + α·B)).

    Inputs are (bucket, c) totals per corpus. Output is ≤B rows —
    broadcast it. The two corpus totals come back as scalars (16 bytes
    of driver traffic, ONE job — the two aggregates are unioned so the
    driver doesn't pay two scheduler round-trips for two numbers);
    buckets unseen on one side get the smoothed floor via
    coalesce(c, 0). Buckets unseen on BOTH sides are absent — no gram
    of the fitted corpora maps there, so they can never contribute to
    a training-corpus score; NEW documents at inference time can hit
    them, so ``return_floor=True`` additionally returns the both-sides
    smoothed value ln(α/(T+αB)) − ln(α/(R+αB)) those buckets carry
    (used by :func:`dense_lambda` for the streaming/row-local path).

    Both inputs are EAGERLY localCheckpointed here: two consumers read
    each (the scalar-totals action and the λ join), and without the
    pin a caller passing a raw lineage — e.g. the target corpus's
    tokenize+aggregate — pays that lineage once per consumer (measured
    on the dsir_select bench row: the target pass ran twice). The
    checkpointed frames are ≤B rows, so the pinned blocks are KBs.
    Eager, not lazy, since the round-14 sf1 stall incident (SCALE.md
    "sf1 stall incident"): a LAZY localCheckpoint on a multi-consumer
    subtree interleaves AQE re-materialization between the consumers'
    actions and stalls erratically at scale — the fused path measured
    12-60 s outliers on a ~4.5 s row until its checkpoint went eager,
    and this path showed the same scatter signature in the same A/B."""
    target_bucket_totals = target_bucket_totals.localCheckpoint(eager=True)
    raw_bucket_totals = raw_bucket_totals.localCheckpoint(eager=True)
    totals = {
        r["side"]: r["t"]
        for r in target_bucket_totals.select(F.lit("t").alias("side"), "c")
        .unionByName(raw_bucket_totals.select(F.lit("r").alias("side"), "c"))
        .groupBy("side")
        .agg(F.sum("c").alias("t"))
        .collect()
    }
    t_tot = totals.get("t") or 0
    r_tot = totals.get("r") or 0
    t = target_bucket_totals.select("bucket", F.col("c").alias("ct"))
    r = raw_bucket_totals.select("bucket", F.col("c").alias("cr"))
    denom_t = float(t_tot + alpha * n_buckets)
    denom_r = float(r_tot + alpha * n_buckets)
    joined = t.join(r, "bucket", "full_outer")
    lam = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(alpha)) / F.lit(denom_t)
    ) - F.log(
        (F.coalesce(F.col("cr"), F.lit(0)).cast("double") + F.lit(alpha)) / F.lit(denom_r)
    )
    out = joined.select("bucket", lam.alias("lam"))
    if return_floor:
        import math

        floor = math.log(alpha / denom_t) - math.log(alpha / denom_r)
        return out, floor
    return out


def dsir_logratio_fused(
    feats_all: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    return_floor: bool = False,
):
    """The fitted model straight from the FUSED feature table (round
    14; VERDICT r13 item 5 — the cum_lam limb collapse): ONE
    conditional-sum ``groupBy(bucket)`` over the (side, id, bucket, c)
    checkpoint produces (bucket, ct, cr) directly, replacing
    :func:`dsir_logratio`'s two side-filtered re-aggregations + the
    full_outer join — one scan of the corpus-feature-table-sized
    checkpoint instead of two, and no B-row join at all. The two
    corpus totals come off the resulting ≤B-row table (one action,
    never the text). λ arithmetic is IDENTICAL to dsir_logratio
    (coalesce(c,0) + add-α smoothing), so the model is byte-equal —
    pinned by test and by the registry hash, and measured on the
    dsir_select row: interleaved fresh-JVM both orders, 12 children,
    identical selection and λ in every one; 7/12 round wins, warm
    minima −9% sf0.1 (inside box scatter) / −8% sf1 where the
    collapsed checkpoint scan carries 10× the data
    (scripts/bench_dsir_lam_ab.py v3_fusedlam; SCALE.md "dsir fused-λ
    fit" has the full table).

    :func:`dsir_logratio` stays the public two-table API (callers
    with separately-built totals — incremental refits, the streaming
    path); this is the fused-checkpoint fast path dsir_select ships.
    """
    # EAGER checkpoint, deliberately (sf1 incident, round 14): the
    # first-shipped lazy (eager=False) form stalled the FULL row
    # erratically at sf1 — stable ~4.5 s with 12-60 s outliers — while
    # the limbs stayed fast; the per-variant A/B
    # (scripts/bench_dsir_row_ab.py) isolated it: lazy and
    # no-checkpoint forms each threw multi-10s stalls (worst 59.8 s)
    # when `both`'s two consumers (the totals collect and the λ select
    # feeding the eager lam checkpoint) interleaved AQE
    # re-materialization; the eager ≤B-row checkpoint ran 8/8 singles
    # tight (3.8-5.4 s) and fastest. Same lesson as the round-12
    # spread incident: ONE eager checkpoint on any subtree with
    # multiple downstream actions.
    both = feats_all.groupBy("bucket").agg(
        F.sum(F.when(F.col("__side") == "t", F.col("c"))).alias("ct"),
        F.sum(F.when(F.col("__side") == "r", F.col("c"))).alias("cr"),
    ).localCheckpoint(eager=True)
    return _lam_from_both(both, n_buckets, alpha, return_floor)


def _lam_from_both(
    both: DataFrame,
    n_buckets: int,
    alpha: float,
    return_floor: bool = False,
):
    """λ arithmetic over an already-materialized ≤B-row (bucket, ct,
    cr) table — the shared tail of :func:`dsir_logratio_fused` and
    :func:`dsir_logratio_direct`: coalesce(c,0) + add-α smoothing,
    byte-identical to :func:`dsir_logratio`. The totals collect runs
    over the tiny materialized table (one action, KB of rows)."""
    tots = both.agg(
        F.sum("ct").alias("t"), F.sum("cr").alias("r")
    ).collect()[0]
    t_tot = tots["t"] or 0
    r_tot = tots["r"] or 0
    denom_t = float(t_tot + alpha * n_buckets)
    denom_r = float(r_tot + alpha * n_buckets)
    lam = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(alpha))
        / F.lit(denom_t)
    ) - F.log(
        (F.coalesce(F.col("cr"), F.lit(0)).cast("double") + F.lit(alpha))
        / F.lit(denom_r)
    )
    out = both.select("bucket", lam.alias("lam"))
    if return_floor:
        import math

        floor = math.log(alpha / denom_t) - math.log(alpha / denom_r)
        return out, floor
    return out


def fused_bucket_totals(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    hasher: str = "md5",
) -> DataFrame:
    """(bucket, ct, cr) STRAIGHT from the tagged-union gram stream —
    no per-document intermediate at all (round-14 close; the sf1
    stall fix). One explode + ONE ``groupBy(bucket)`` conditional-sum
    aggregate: with ≤B groups the map-side partial aggregation
    collapses each mapper's output to ≤B rows, so the fit's exchange
    carries KBs regardless of corpus size (guide §2.3 "aggregate
    before you shuffle") — where the per-doc feature table's
    (side, id, bucket) aggregate shuffled corpus-proportional rows
    and its eager checkpoint pinned them (~428 MiB per call at sf1,
    never freed, with a 1-task AQE-coalesced materialization stage —
    the measured multi-10s stall; OPTIMIZATION_r14.md).

    Eagerly localCheckpointed: ≤B rows, two consumers (the totals
    collect and the λ projection) — the same one-eager-checkpoint-per
    multi-consumer-subtree rule as everywhere else."""
    tagged = raw_docs.select(
        F.col(text_col), F.lit("r").alias("__side")
    ).unionByName(
        target_docs.select(F.col(text_col), F.lit("t").alias("__side"))
    )
    g = gram_rows(tagged, text_col, ["__side"])
    return (
        g.select("__side", _bucket_of(F.col("gram"), n_buckets, hasher))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__side") == "t", F.lit(1))).alias("ct"),
            F.sum(F.when(F.col("__side") == "r", F.lit(1))).alias("cr"),
        )
        .localCheckpoint(eager=True)
    )


def _lam_from_both_lazy(
    both: DataFrame,
    n_buckets: int,
    alpha: float,
) -> DataFrame:
    """:func:`_lam_from_both` with the corpus totals attached as a
    broadcast 1-row cross join instead of a driver ``collect`` — the
    whole fit stays LAZY, so a consumer that also references the
    fit's input subtree (``dsir_select``'s scoring pass) compiles
    into ONE physical plan and Spark's ReusedExchange computes the
    shared corpus exchange once. Arithmetic is IEEE-identical to the
    collect path: the totals are exact longs (< 2⁵³), cast to double
    and added to the same ``alpha * n_buckets`` literal, feeding the
    same log-ratio expression — pinned by equivalence test."""
    # corpus totals as UNPARTITIONED window sums over the ≤B-row
    # aggregate (not a collect — that would force a second action and
    # kill cross-consumer stage reuse; not a broadcast cross join —
    # that adds two sequential stage materializations to the λ
    # broadcast's critical path, measured +0.3-0.5 s on the bench
    # row). A single-partition window over ≤4096 rows is KBs of work.
    wall = W.partitionBy()
    j = both.select(
        "bucket",
        "ct",
        "cr",
        F.sum("ct").over(wall).alias("__t_tot"),
        F.sum("cr").over(wall).alias("__r_tot"),
    )
    denom_t = F.coalesce(F.col("__t_tot"), F.lit(0)).cast(
        "double"
    ) + F.lit(alpha * n_buckets)
    denom_r = F.coalesce(F.col("__r_tot"), F.lit(0)).cast(
        "double"
    ) + F.lit(alpha * n_buckets)
    lam = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(alpha))
        / denom_t
    ) - F.log(
        (F.coalesce(F.col("cr"), F.lit(0)).cast("double") + F.lit(alpha))
        / denom_r
    )
    return j.select("bucket", lam.alias("lam"))


def dsir_logratio_shared(
    raw_feats: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    hasher: str = "md5",
) -> DataFrame:
    """Fit λ with the RAW side derived from an existing per-doc
    feature table (``doc_bucket_counts`` output) instead of a second
    raw-corpus gram pass, fully lazily: cr = Σ_doc c re-aggregated
    from ``raw_feats`` (map-side partials collapse it to ≤B rows per
    mapper), ct from one target gram pass, unioned and re-grouped to
    the same (bucket, ct, cr) table :func:`fused_bucket_totals`
    produces — identical integer counts by commutativity of the sums,
    identical NULL semantics (a bucket absent on one side sums to
    NULL → coalesce(·, 0), exactly the tagged-union conditional
    sums). No checkpoint and no collect anywhere in the subtree: when
    the caller ALSO consumes ``raw_feats`` (scoring), both references
    canonicalize to the same exchange and the raw corpus is tokenized
    ONCE per action (plan-pinned in tests)."""
    tgt_grams = (
        gram_rows(target_docs, text_col, [])
        .select(_bucket_of(F.col("gram"), n_buckets, hasher))
        # same canonicalization no-op as doc_bucket_counts: keep every
        # copy of this subtree identical whether or not a join pushes
        # isnotnull(bucket) into it, so AQE stage reuse always fires
        .where(F.col("bucket").isNotNull())
        .select("bucket", F.lit(1).cast("long").alias("c"),
                F.lit("t").alias("__side"))
    )
    raw_bucket_counts = raw_feats.select(
        "bucket", "c", F.lit("r").alias("__side")
    )
    # ONE conditional-sum aggregate over the tagged union — the same
    # (bucket, ct, cr) arithmetic as fused_bucket_totals (map-side
    # partials collapse each mapper to ≤B rows), with the raw side
    # riding the scoring pass's per-doc aggregate instead of a second
    # gram pass. sum(when(side, c)) leaves a bucket unseen on one side
    # NULL → the λ arithmetic's coalesce(·, 0), exactly the tagged
    # gram-stream form.
    both = (
        tgt_grams.unionByName(raw_bucket_counts)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__side") == "t", F.col("c"))).alias("ct"),
            F.sum(F.when(F.col("__side") == "r", F.col("c"))).alias("cr"),
        )
    )
    return _lam_from_both_lazy(both, n_buckets, alpha)


def dsir_logratio_direct(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    hasher: str = "md5",
    return_floor: bool = False,
):
    """Fit λ directly from the two corpora: :func:`fused_bucket_totals`
    + the shared λ arithmetic. Identical model to
    ``dsir_logratio_fused(fused_bucket_counts(...))`` — the conditional
    sums commute with the per-doc aggregation (integer counts) — pinned
    by test and by the registry hash."""
    both = fused_bucket_totals(
        raw_docs, target_docs, text_col, n_buckets, hasher
    )
    return _lam_from_both(both, n_buckets, alpha, return_floor)


def dsir_scores(
    raw_feats: DataFrame,
    logratio: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weight: (id, n_grams, logw) with
    logw = Σ c·λ rounded to 6 dp (the cross-engine determinism policy —
    sum order is partition-dependent at ~1e-13). The λ table is
    broadcast; one aggregate keyed on the document id."""
    return (
        raw_feats.join(F.broadcast(logratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("lam")), 6).alias("logw"),
        )
    )


def gumbel_key(id_expr, salt: str = "dsir") -> Column:
    """Deterministic Gumbel(0,1) draw per id: u from the md5 of
    (salt‖id) — first 8 hex chars → 32-bit int h, u = (h + 0.5)/2³²
    (the +0.5 keeps u strictly inside (0,1)) — then g = −ln(−ln u),
    rounded to 6 dp. Content-derived like every other random draw in
    this engine (see module docstring): stable under retries,
    repartitioning, and engines."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), _c(id_expr).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**32))
    return F.round(-F.log(-F.log(u)), 6)


def dsir_resample(
    scores: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k sampling without replacement: keep the k rows with
    the largest round(logw,6)/temperature + g, g the deterministic
    Gumbel key. Adds ``g``, ``score`` and ``rank`` (1-based).

    temperature→0⁺ degenerates to exact top-k by logw; temperature→∞
    approaches a uniform k-subset. Selection is orderBy().limit(k) —
    Spark plans TakeOrdered (per-partition heap + k-row merge), NOT a
    global sort; the rank window then runs over k rows only (bounded
    by construction, documented single partition)."""
    g = gumbel_key(F.col(id_col), salt)
    score = F.round(F.col("logw") / F.lit(float(temperature)) + F.col("g"), 6)
    top = (
        scores.withColumn("g", g)
        .withColumn("score", score)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = W.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir",
    temperature: float = 1.0,
    hasher: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """End-to-end DSIR: returns (selected, logratio) — the k selected
    raw documents (id, n_grams, logw, g, score, rank) and the fitted
    ≤B-row λ table (kept so callers can audit / reuse the model).

    Composition (round-14 continuation — the one-plan shared-exchange
    fit; the fused per-doc-checkpoint and direct-2-tokenize histories
    are in OPTIMIZATION_r14.md and the rejected-variant table in
    scripts/bench_dsir_row_ab.py):

    - scoring features: :func:`doc_bucket_counts` over the raw
      corpus, lazy — the one corpus-keyed (id, bucket) shuffle.
    - λ fit: :func:`dsir_logratio_shared` — the raw side is that SAME
      per-doc subtree re-aggregated to (bucket, cr) (map-side partials
      → ≤B rows per mapper); the target side is one gram pass; the
      corpus totals ride a broadcast 1-row cross join instead of a
      driver collect, so NOTHING here is eager.
    - everything — fit, broadcast-λ scoring join, Gumbel TakeOrdered —
      compiles into ONE physical plan per consuming action, and
      Spark's ReusedExchange/AQE stage reuse computes the corpus
      exchange once: the raw corpus is tokenized ONCE (plan-pinned).

    History (both measured, scripts/bench_dsir_row_ab.py): the
    round-12/14 form tokenized once into an eagerly-checkpointed
    per-doc feature table — at sf1 that pinned ~428 MiB per call
    (never freed across calls) and materialized through an
    AQE-coalesced 1-task stage, erratic 12-88 s stalls on a ~4.5 s
    row. The round-14-close form fixed the pin by re-tokenizing the
    raw corpus for the fit — steal-quiet that costs +1.0-1.3 s on a
    2.7 s row at sf0.1 (the md5 gram pass IS the row's dominant
    cost). This form has neither: the sharing rides the shuffle files
    the scoring pass writes anyway — disk-backed, multi-task,
    lifecycle-managed by the shuffle machinery, valid at any corpus
    size."""
    from ..session import spread_for_cpu

    # Input spread (round-14 continuation; see spread_for_cpu's
    # adoption protocol): a compact parquet corpus lands as ONE input
    # split, so the gram explode + per-gram hash — the row's dominant
    # cost — ran single-task on an idle 32-core box. The round-12
    # decline of this spread applied to the CHECKPOINTED composition
    # (the RoundRobin text shuffle interleaved with the eager per-doc
    # checkpoint write); this composition is one lazy plan with one
    # action, the spread shuffle moves only the raw input bytes, and
    # the gate makes it a no-op whenever the scan's own splits already
    # cover the cores (any real 100 TB layout).
    raw_docs = spread_for_cpu(raw_docs)
    target_docs = spread_for_cpu(target_docs)
    raw_feats = doc_bucket_counts(
        raw_docs, text_col, id_col, n_buckets, hasher
    )
    lam = dsir_logratio_shared(
        raw_feats, target_docs, text_col, n_buckets, alpha, hasher
    )
    scores = dsir_scores(raw_feats, lam, id_col)
    return dsir_resample(scores, k, id_col, salt, temperature), lam


def dense_lambda(logratio: DataFrame, n_buckets: int, floor: float = 0.0) -> list[float]:
    """Collect the λ table into a dense length-B vector — THE MODEL,
    B·8 bytes of driver traffic (32 KB at the default B=4096; this is
    the k·dim-centroid-sized collect the scale rules allow). Buckets
    absent from the table (seen in neither fitted corpus) get
    ``floor`` — the both-sides smoothed value from
    ``dsir_logratio(..., return_floor=True)`` — so NEW documents that
    hit them at inference time score by the model's actual smoothing
    rather than silently dropping grams."""
    dense = [float(floor)] * n_buckets
    for r in logratio.collect():
        dense[int(r["bucket"])] = float(r["lam"])
    return dense


def dsir_score_rows(
    docs: DataFrame,
    lam_dense: list[float],
    text_col: str = "text",
    n_buckets: int = 4096,
    hasher: str = "md5",
) -> DataFrame:
    """Row-local scoring against a trained dense λ model: adds
    ``n_grams`` and ``logw`` (6 dp) to every row. ZERO shuffles and
    ZERO state — the model rides as a length-B array literal and the
    per-document sum is an in-row fold — so the same call scores a
    batch frame or a readStream (a stateless streaming map: no
    watermark, no output-mode constraints; this is the
    score-at-ingest shape a production pipeline runs).

    Three deliberate divergences from the batch join path
    (:func:`dsir_scores`), each in this path's favor at inference:

    - grams hashing to buckets the fit never saw score the smoothing
      floor instead of being dropped by the inner join — correct for
      new documents (on the fitted raw corpus itself the two paths
      agree exactly; pinned by test);
    - the fold is interpreted per element (the price of statelessness
      — there is no explode/agg to keep codegen scalar), so batch
      jobs at rest should prefer :func:`dsir_scores`; this path is
      for streams and for frames that must stay row-shaped;
    - zero-token documents keep their row with ``n_grams = 0`` and
      ``logw = NULL`` (the batch path omits them) — NULL, not 0.0,
      so a quality gate can't mistake "nothing to score" for a score.

    B is bounded by expression size (the literal array): fine through
    ~64k buckets, beyond that ship the model as a broadcast map join
    (which reintroduces the aggregate and forfeits statelessness)."""
    lam_arr = F.array(*[F.lit(float(x)) for x in lam_dense])
    tk = docs.withColumn("__dsir_tk", tokens(F.lower(F.col(text_col))))
    bigrams = F.when(
        F.size("__dsir_tk") >= 2,
        F.zip_with(
            F.slice(F.col("__dsir_tk"), F.lit(1), F.size("__dsir_tk") - 1),
            F.slice(F.col("__dsir_tk"), F.lit(2), F.size("__dsir_tk") - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = tk.withColumn("__dsir_grams", F.concat(F.col("__dsir_tk"), bigrams))
    _check_hasher(hasher)
    if hasher == "xxhash64":
        buckets = F.transform(
            F.col("__dsir_grams"),
            lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)),
        )
    else:
        buckets = F.transform(
            F.col("__dsir_grams"),
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
            .cast("long") % F.lit(n_buckets),
        )
    # third divergence (round-6 advice): a zero-token document scores
    # logw NULL here, not 0.0 — the batch join path omits such
    # documents entirely (no feature rows), and 0.0 is a real score a
    # caller would otherwise rank on
    logw = F.when(
        F.size("__dsir_grams") > 0,
        F.round(
            F.aggregate(
                buckets,
                F.lit(0.0),
                lambda acc, b: acc + F.element_at(lam_arr, (b + 1).cast("int")),
            ),
            6,
        ),
    )
    return (
        grams.withColumn("n_grams", F.size("__dsir_grams").cast("long"))
        .withColumn("logw", logw)
        .drop("__dsir_tk", "__dsir_grams")
    )
