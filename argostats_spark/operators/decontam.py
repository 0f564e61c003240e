"""Corpus contamination hygiene: n-gram overlap between a training
corpus and an evaluation/benchmark set, plus corpus-INTERNAL
duplicated-passage detection (the window-hash form of exact substring
dedup, Lee et al. 2021).

Green-field scope beyond the reference (training-data pipeline family,
same tier as dedup/similarity): before a corpus feeds a training run,
every document sharing word n-grams with a held-out benchmark must be
flagged — the published practice is exact n-gram collision against the
eval sets (GPT-3 appendix C and The Pile both describe 13-gram exact
overlap; the operator takes ``n`` as a parameter and the tests/queries
use 3-grams because the synthetic docs are short).

Scale shape (100 TB posture):
- The benchmark side is SMALL by definition (eval sets are thousands of
  documents, the corpus is billions) → its distinct n-gram set is
  broadcast; the corpus-side n-gram stream hash-joins against it with
  NO full-table shuffle of the corpus.
- Corpus n-grams are produced by the same zero-extra-shuffle
  slice/arrays_zip/explode pattern as the minhash path; per-document
  totals come from ``F.size(array_distinct(...))`` — a scalar
  expression, not a second aggregation.
- The only exchange is the groupBy(doc_id) over the *matched* n-gram
  stream, which is benchmark-bounded (each corpus n-gram survives the
  broadcast join only if it appears in the eval set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
    advisor: bool = False,
    advisor_opts: dict | None = None,
    advisor_record: dict | None = None,
    advisor_store=None,
    advisor_fingerprints: tuple[str, str] | None = None,
) -> DataFrame:
    """Flag corpus documents that collide with benchmark n-grams.

    Returns one row per corpus document: ``(id, n_grams, n_hits,
    hit_ratio, contaminated)`` where ``n_hits`` counts DISTINCT corpus
    n-grams that appear anywhere in the benchmark set.

    Scale note (round-6 analysis, revised round 9): the broadcast side
    is the 8-byte hash per DISTINCT benchmark n-gram — ~1 GB per 10⁸
    n-grams, fine for any real benchmark suite, so this plain
    broadcast-join form stays the default. When the eval side DOES
    outgrow the broadcast, :mod:`.bloom` now provides the pre-gate
    this note once rejected (Spark's bloom_filter_agg is indeed not
    user-callable, but the public bitmap_construct_agg family builds
    the same artifact): a row-local literal-bloom membership test
    prunes the definitely-clean n-gram mass with zero joins, and only
    candidates reach this exact verify join — false positives cost
    candidate rows, never wrong flags, because the verify join still
    decides. The decontaminate driver limb pins gate→verify ==
    plain-join every round.

    ``advisor=True`` (VERDICT r12 item 4 — the join advisor's first
    production consumer): instead of the hard-coded benchmark
    broadcast, the corpus-gram ⋈ benchmark-gram join strategy comes
    from :func:`..joinsize.choose_join_strategy` — broadcast when the
    benchmark's distinct-gram table fits the row budget (the usual
    outcome, identical plan to the default), SALTED when the
    benchmark outgrows it and a hot corpus n-gram (stop-word grams
    are real skew) dominates a partition, plain + AQE otherwise. The
    pre-flight costs two extra eager CMS scans at call time — one of
    them corpus-shaped — which is why it is opt-in: pay it when the
    benchmark side's size is not known small. ``advisor_opts``
    forwards to choose_join_strategy (broadcast_rows, skew_factor,
    eps, ...); pass an empty dict as ``advisor_record`` to receive
    the decision record (strategy, est, reason, ...) for audit.

    ``advisor_store`` (a :class:`..joinsize.SketchStore`) makes the
    pre-flight FREE on repeat calls (VERDICT r13 item 4): the two CMS
    sketches are loaded from the store when present and built+saved
    when not, keyed as ``("corpus_grams", "g", fp_corpus)`` /
    ``("bench_grams", "g", fp_bench)`` with the fingerprints from
    ``advisor_fingerprints`` — REQUIRED alongside the store, because
    they are the data-version contract: a stale sketch silently
    mis-advises, so the caller must bump the fingerprint whenever the
    corpus or benchmark changes (an epoch, a snapshot id). With a warm
    store the advisor path runs ZERO extra scans (job-count-pinned in
    tests)."""
    sh = F.array_distinct(word_ngrams(text_col, n))
    bench_grams = (
        benchmark.select(F.explode(sh).alias("g")).distinct()
    )
    docs = corpus.select(
        F.col(id_col), sh.alias("sh"), F.size(sh).alias("n_grams")
    )
    gram_stream = docs.select(id_col, F.explode("sh").alias("g"))
    if advisor:
        from .joinsize import apply_join_strategy, choose_join_strategy

        opts = dict(advisor_opts or {})
        if advisor_store is not None:
            if advisor_fingerprints is None:
                raise ValueError(
                    "advisor_store requires advisor_fingerprints="
                    "(fp_corpus, fp_bench) — the sketch cache has no "
                    "way to detect stale data itself"
                )
            fp_c, fp_b = advisor_fingerprints
            geo = {
                k: opts.get(k, d)
                for k, d in (("eps", 0.001), ("confidence", 0.99),
                             ("seed", 42))
            }
            opts["sketch_a"] = advisor_store.get_or_build(
                gram_stream, "g", "corpus_grams", fp_c, **geo
            )
            opts["sketch_b"] = advisor_store.get_or_build(
                bench_grams, "g", "bench_grams", fp_b, **geo
            )
        decision = choose_join_strategy(
            gram_stream, "g", bench_grams, "g", **opts
        )
        if advisor_record is not None:
            advisor_record.update(decision)
        matched = apply_join_strategy(
            gram_stream, bench_grams, ["g"], decision, how="inner"
        )
    else:
        matched = gram_stream.join(F.broadcast(bench_grams), "g")
    hits = (
        matched
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return (
        docs.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_grams").cast("int").alias("n_grams"),
            n_hits.cast("int").alias("n_hits"),
            F.round(
                n_hits.cast("double") / F.greatest(F.col("n_grams"), F.lit(1)), 6
            ).alias("hit_ratio"),
            (n_hits >= min_hits).cast("int").alias("contaminated"),
        )
    )


def _passage_windows(
    corpus: DataFrame,
    window: int,
    stride: int,
    id_col: str,
    text_col: str,
    hasher: str,
) -> DataFrame:
    """(id, tok_start, h) for every full `window`-token span at `stride`
    — entirely row-local (the token array is staged as a projected
    column so the transform lambda does not re-inline tokenization per
    element; see SCALE.md's repetition-stats pitfall). Documents shorter
    than `window` yield no spans."""
    from ..functions.text import tokens

    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got {window}, {stride}")
    if hasher not in ("xxhash64", "md5"):
        raise ValueError(f'hasher must be "xxhash64" or "md5", got {hasher!r}')
    hfn = F.xxhash64 if hasher == "xxhash64" else F.md5
    n = F.size("__toks")
    starts = F.when(
        n >= window, F.sequence(F.lit(0), n - window, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    span = lambda s: F.array_join(  # noqa: E731
        F.slice(F.col("__toks"), s + 1, window), " "
    )
    return (
        corpus.withColumn("__toks", tokens(F.col(text_col)))
        .select(
            id_col,
            F.explode(
                F.transform(
                    starts,
                    lambda s: F.struct(
                        s.cast("long").alias("tok_start"),
                        hfn(span(s)).alias("h"),
                    ),
                )
            ).alias("p"),
        )
        .select(id_col, F.col("p.tok_start").alias("tok_start"), F.col("p.h").alias("h"))
    )


def duplicate_passages(
    corpus: DataFrame,
    window: int = 50,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 2,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Corpus-INTERNAL duplicated-passage detection — the window-hash
    form of exact substring deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", public:
    any span repeated anywhere in the corpus is a dedup candidate; the
    suffix-array construction is replaced by fixed `window`-token
    rolling spans, which is the shape a distributed engine can run as
    one scan + one uniform shuffle).

    Returns one row per duplicated span text: ``(h, n_docs,
    n_occurrences, first_doc_id)`` for spans occurring >=
    ``min_occurrences`` times corpus-wide (within-document repeats
    count — same as Lee et al.).

    Scale shape (100 TB posture): span generation is row-local
    (Σ(tokens-window+1)/stride output rows — linear in corpus tokens,
    `stride` is the recall/cost dial); the single exchange keys on the
    64-bit span hash — uniform by construction, no skew. Counts and a
    min-id exemplar are the only aggregates; nothing reaches the
    driver. ``hasher="md5"`` swaps in the DuckDB-shared family for
    oracle parity (same convention as simhash)."""
    p = _passage_windows(corpus, window, stride, id_col, text_col, hasher)
    return (
        p.groupBy("h")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(id_col).alias("first_doc_id"),
        )
        .filter(F.col("n_occurrences") >= min_occurrences)
    )


def flag_duplicate_passages(
    corpus: DataFrame,
    window: int = 50,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-passage stats — the actionable curation
    metric: ``(id, n_windows, n_dup_windows, dup_frac, has_dup)``
    where a window is duplicated when its span text occurs >= 2 times
    corpus-wide (any document, including this one).

    Plan shape: span stream → count(*) OVER (PARTITION BY span hash)
    → groupBy(document). Two exchanges total (span hash, then id) —
    the per-hash window avoids materializing + joining back a
    duplicate-span table, and both keys are uniform."""
    from pyspark.sql import Window as W

    p = _passage_windows(corpus, window, stride, id_col, text_col, hasher)
    c = F.count(F.lit(1)).over(W.partitionBy("h"))
    per_win = p.withColumn("c", c)
    n_dup = F.sum((F.col("c") >= 2).cast("int"))
    n_win = F.count(F.lit(1))
    return per_win.groupBy(id_col).agg(
        n_win.cast("int").alias("n_windows"),
        n_dup.cast("int").alias("n_dup_windows"),
        F.round(n_dup.cast("double") / n_win, 6).alias("dup_frac"),
        (n_dup >= 1).cast("int").alias("has_dup"),
    )


def _line_table(
    corpus: DataFrame, id_col: str, text_col: str, hasher: str
) -> DataFrame:
    """(id, line_no, h) for every line whose TRIMMED text is non-empty
    — entirely row-local (split + posexplode). ``line_no`` indexes the
    raw split array (blank lines keep their slots so the removal form
    can rebuild by index). Normalization is a full whitespace trim
    (regexp, not F.trim — which strips spaces only), so trailing '\\r'
    from CRLF corpora and tab indentation fold away and the hash is
    line-ending-agnostic."""
    if hasher not in ("xxhash64", "md5"):
        raise ValueError(f'hasher must be "xxhash64" or "md5", got {hasher!r}')
    hfn = F.xxhash64 if hasher == "xxhash64" else F.md5
    return (
        corpus.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "ln"),
        )
        .withColumn("__lt", F.regexp_replace("ln", r"^\s+|\s+$", ""))
        .filter(F.col("__lt") != "")
        .select(id_col, "line_no", hfn("__lt").alias("h"))
    )


def duplicate_lines(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 2,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Corpus-wide duplicated-LINE census — the paragraph/line-hash
    dedup family of CCNet (Wenzek et al. 2020, paragraph SHA-1 dedup)
    and RefinedWeb (Penedo et al. 2023, exact line dedup): any line
    (trimmed, blank lines ignored) occurring >= ``min_occurrences``
    times anywhere in the corpus is boilerplate (nav bars, cookie
    banners, footers) or cross-site template text.

    Returns one row per duplicated line hash: ``(h, n_docs,
    n_occurrences, first_doc_id)``. Lines are the natural unit between
    the token-window passage form (:func:`duplicate_passages` — exact
    substring semantics, window-size dial) and whole-document exact
    dedup: they need no window parameter and align with how web
    boilerplate actually repeats.

    Scale shape (100 TB posture): line generation is row-local (split +
    posexplode, zero shuffle); the single exchange keys on the line
    hash — uniform by construction. Identical plan family to
    :func:`duplicate_passages`."""
    p = _line_table(corpus, id_col, text_col, hasher)
    return (
        p.groupBy("h")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(id_col).alias("first_doc_id"),
        )
        .filter(F.col("n_occurrences") >= min_occurrences)
    )


def remove_duplicate_lines(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 2,
    keep_first: bool = True,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Line-level dedup, REMOVAL form — the CCNet/RefinedWeb curation
    step: every line occurring >= ``min_occurrences`` times corpus-wide
    is cut from its documents. ``keep_first=True`` (CCNet semantics)
    retains the canonical first occurrence (min by (id, line_no));
    ``keep_first=False`` (boilerplate-strip semantics, the usual choice
    with min_occurrences > 2) removes EVERY occurrence. Blank lines are
    never duplicates and never removed; line hashing trims whitespace
    so CRLF and indentation variants collide, but the REBUILT text
    preserves each kept line's original bytes.

    Adds ``text_dedup`` (kept lines re-joined with '\\n'), ``n_lines``
    (non-blank lines in the input), and ``n_lines_removed``; all input
    columns carried. Documents with no duplicated lines pass through
    with ``text_dedup == text`` whenever the input used plain '\\n'
    endings.

    Plan shape (same family as :func:`remove_duplicate_passages`, minus
    the interval merge — lines cannot overlap): line stream →
    row_number + count over the line-hash window (one uniform exchange)
    → per-doc cut-index collect (one id exchange) → ONE join back to
    the corpus; the rebuild is an in-row filter over the split array.
    No full text ever travels through the line pipeline (hashes only),
    and nothing is quadratic in corpus size."""
    from pyspark.sql import Window as W

    p = _line_table(corpus, id_col, text_col, hasher)
    w_h = W.partitionBy("h")
    occ = p.select(
        id_col,
        "line_no",
        F.row_number()
        .over(w_h.orderBy(F.col(id_col).asc(), F.col("line_no").asc()))
        .alias("rnk"),
        F.count(F.lit(1)).over(w_h).alias("c"),
    )
    cond = F.col("c") >= min_occurrences
    if keep_first:
        cond = cond & (F.col("rnk") >= 2)
    cuts = (
        occ.where(cond)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("line_no")).alias("__cuts"))
    )
    n_nonblank = lambda arr: F.size(  # noqa: E731
        F.filter(arr, lambda l: F.regexp_replace(l, r"^\s+|\s+$", "") != "")
    )
    out = (
        corpus.join(cuts, id_col, "left")
        .withColumn("__lines", F.split(F.col(text_col), "\n"))
        .withColumn(
            "__cuts", F.coalesce(F.col("__cuts"), F.array().cast("array<int>"))
        )
        .withColumn(
            "__kept",
            F.filter(
                F.col("__lines"), lambda l, i: ~F.array_contains(F.col("__cuts"), i)
            ),
        )
    )
    return (
        out.withColumn("text_dedup", F.array_join("__kept", "\n"))
        .withColumn("n_lines", n_nonblank(F.col("__lines")).cast("long"))
        .withColumn(
            "n_lines_removed",
            (F.size("__lines") - F.size("__kept")).cast("long"),
        )
        .drop("__cuts", "__lines", "__kept")
    )


def remove_duplicate_passages(
    corpus: DataFrame,
    window: int = 50,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "xxhash64",
) -> DataFrame:
    """Exact substring dedup, REMOVAL form (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    step after :func:`flag_duplicate_passages`'s metrics): every
    ``window``-token span occurring >= 2 times corpus-wide keeps only
    its CANONICAL first occurrence (min by (id, tok_start)); all other
    occurrences' token ranges are cut from their documents. Adds
    ``text_dedup`` (the rebuilt text, tokens joined by single spaces —
    whitespace normalizes) and ``n_tokens_removed``; all input columns
    carried. Documents shorter than ``window`` pass through unchanged.

    A repeated L-token passage (L >= window) at stride 1 yields
    L-window+1 duplicated spans in the non-canonical copy; their
    overlapping [s, s+window) ranges MERGE into one interval
    row-locally before the keep-filter, so the per-token test is
    O(merged intervals), not O(spans) — dense self-overlap (the
    stride-1 worst case) collapses instead of multiplying.

    Downstream caveat (r8, reproduced): ``text_dedup`` is a
    higher-order COLUMN EXPRESSION (filter/exists over the token
    array). Feeding it to a scalar pandas UDF and then FILTERING on
    that UDF's output trips a Spark 4.1 optimizer bug (predicate
    pushdown substitutes the UDF-with-lambda-args into the Filter →
    INTERNAL_ERROR "Cannot evaluate expression"). Scorers built on
    ``mapInPandas`` (compression_ratio_rows) are immune — the opaque
    boundary forces the expression to evaluate below them; for scalar
    pandas-UDF scorers, materialize first (write/localCheckpoint).

    Plan shape: span stream -> row_number + count over the span-hash
    window (one uniform exchange) -> per-doc collect of non-canonical
    starts (one id exchange) -> ONE join back to the corpus on id;
    interval merge + rebuild are in-row expressions. Nothing is ever
    quadratic in corpus size and no full text travels through the
    span pipeline (hashes only)."""
    from pyspark.sql import Window as W

    from ..functions.text import tokens

    p = _passage_windows(corpus, window, stride, id_col, text_col, hasher)
    w_h = W.partitionBy("h")
    occ = p.select(
        id_col, "tok_start",
        F.row_number().over(
            w_h.orderBy(F.col(id_col).asc(), F.col("tok_start").asc())
        ).alias("rnk"),
        F.count(F.lit(1)).over(w_h).alias("c"),
    )
    cuts = (
        occ.where((F.col("c") >= 2) & (F.col("rnk") >= 2))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("tok_start")).alias("__cuts"))
    )
    out = corpus.join(cuts, id_col, "left").withColumn(
        "__toks", tokens(F.col(text_col))
    )
    iv = lambda lo, hi: F.struct(  # noqa: E731
        lo.cast("int").alias("lo"), hi.cast("int").alias("hi")
    )
    merged = F.aggregate(
        F.col("__cuts"),
        F.array().cast("array<struct<lo:int,hi:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["hi"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(iv(
                    F.element_at(acc, -1)["lo"],
                    F.greatest(F.element_at(acc, -1)["hi"], s + window),
                )),
            ),
        ).otherwise(F.concat(acc, F.array(iv(s, s + window)))),
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("__iv"), lambda r: (i >= r["lo"]) & (i < r["hi"])
        ),
    )
    return (
        out.withColumn("__iv", F.coalesce(
            merged, F.array().cast("array<struct<lo:int,hi:int>>")
        ))
        .withColumn("__kept", kept)
        .withColumn("text_dedup", F.array_join("__kept", " "))
        .withColumn(
            "n_tokens_removed",
            (F.size("__toks") - F.size("__kept")).cast("long"),
        )
        .drop("__cuts", "__toks", "__iv", "__kept")
    )
