"""Deterministic splitting & sampling for training-data pipelines.

Green-field scope (no reference counterpart): the operations that sit
between dedup and tokenization in a 100 TB corpus build — carving
train/val/test, drawing per-language development subsets, and doing both
REPRODUCIBLY so a re-run of the pipeline yields byte-identical splits.

Design rules at scale:
- Randomness is *content-derived*, never rand(): ``rand()`` re-executes
  nondeterministically across stage retries and changes with
  partitioning; an md5-derived bucket of a stable key is deterministic
  on any cluster, any partitioning, any engine (DuckDB computes the
  identical assignment — that is the oracle).
- The split/bucket operators are pure row-local expressions: zero
  shuffles, full whole-stage codegen, trivially pushdown-friendly.
- Exact stratified sampling costs one shuffle (window over the strata
  key). Heavily skewed strata make that window's partitions skewed too;
  for approximate-is-fine use cases prefer ``df.sampleBy`` (row-local,
  no shuffle) — provided here as the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def hash_bucket(key: Column | str, n_buckets: int = 100, salt: str = "") -> Column:
    """Deterministic [0, n_buckets) bucket from the md5 of a key.

    First 8 hex chars → 32-bit int → mod. md5 exists with identical
    output in Spark and DuckDB (lowercase hex), so cross-engine
    assignments agree exactly — unlike hash()/xxhash64, which DuckDB
    lacks."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 8), 16, 10)
    return (h.cast("long") % n_buckets).alias("bucket")


def train_test_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test'/...) by hash bucket.

    Content-addressed and salt-versioned: the same key lands in the same
    split on every run, every engine, every cluster size; changing the
    salt re-deals the assignment. Pure expression — no shuffle."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    bucket = hash_bucket(key_col, 10_000, salt)
    # ascending cumulative cut points; first matching WHEN wins
    hi = 0.0
    expr = None
    for name, frac in fractions.items():
        hi += frac / total
        clause_cut = F.lit(int(round(hi * 10_000)))
        expr = (
            F.when(bucket < clause_cut, F.lit(name))
            if expr is None
            else expr.when(bucket < clause_cut, F.lit(name))
        )
    return df.withColumn("split", expr)


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """EXACT per-stratum fraction: keep ceil(fraction·|stratum|) rows,
    chosen by md5-hash order (deterministic, engine-independent).

    One shuffle (window over the stratum). For skew-tolerant approximate
    sampling at extreme scale use :func:`stratified_sample_approx`."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = W.partitionBy(strata_col).orderBy(h)
    n = F.count(F.lit(1)).over(W.partitionBy(strata_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_take", F.ceil(n * F.lit(fraction)))
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    target_rows: int | None = None,
    salt: str = "mix",
) -> DataFrame:
    """α-temperature domain mixing — the standard pretraining mixture
    reweighting (public practice: GPT-3's mixture weights, The Pile's
    epoch factors, multilingual BERT's exponential smoothing): stratum
    ``s`` receives sampling weight p_s ∝ n_s^α, so α<1 flattens the
    mixture (small domains over-represented relative to their raw
    share) and α=1 is proportional. Keeps ``k_s = min(n_s,
    ceil(round(target·p_s, 6)))`` rows per stratum, chosen in
    deterministic md5-hash order; ``target_rows`` defaults to the
    corpus size. The round-before-ceil absorbs cross-engine float
    summation-order differences in Σ n^α (repo convention).

    Scale shape: one tiny counts aggregation (|strata| rows to the
    driver — domains, not documents), the per-stratum quota attached
    as a literal map (no join), then the same single stratum-window
    exchange as the exact sampler. Clamped quotas are NOT
    redistributed (no waterfilling) — deterministic and one-pass;
    callers wanting the exact target after clamping re-run with a
    higher target."""
    import math

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
    }
    if not counts:
        return df
    z = sum(c ** alpha for _, c in sorted(counts.items(), key=lambda kv: str(kv[0])))
    target = sum(counts.values()) if target_rows is None else target_rows
    ks = {
        s: min(c, math.ceil(round(target * (c ** alpha) / z, 6)))
        for s, c in counts.items()
    }
    quota = F.create_map(*[
        x for s, k in sorted(ks.items(), key=lambda kv: str(kv[0]))
        for x in (F.lit(s), F.lit(int(k)))
    ])
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = W.partitionBy(strata_col).orderBy(h)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.element_at(quota, F.col(strata_col)))
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "wsamp",
    strata_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, "Weighted random sampling with a reservoir"): every row draws
    u ∈ (0, 1] and ranks by u^(1/w); the top-``k`` ranked rows are a
    weight-proportional sample without replacement — the standard way
    to draw a quality- or length-weighted corpus subset in one pass.

    Randomness is *content-derived* (repo rule): u comes from the md5
    of ``salt``+key — deterministic on any cluster, any partitioning,
    any engine, and re-dealt by changing the salt. u = (h48 + 1)/2^48
    where h48 is the first 48 md5 bits: exact in a double (division by
    a power of two), u > 0 so ln is finite. Ranking uses ln(u)/w
    (monotone in u^(1/w)), ROUNDED to 12 decimals with a key tie-break
    — the repo's round-before-compare convention absorbing any
    cross-engine libm last-ulp drift in ln.

    Rows with NULL, NaN, or non-positive weight carry zero probability
    mass and are excluded (E-S requires w > 0; NaN needs its own guard
    — in Spark ``NaN > 0`` is TRUE and ``ln(u)/NaN = NaN`` sorts FIRST
    under descending order, so an unfiltered NaN weight from a 0/0
    upstream score would silently seize the top sample slots).

    Scale shape: the key is a row-local expression; global top-k plans
    as TakeOrderedAndProject (per-partition heaps, never a global
    sort); with ``strata_col`` the per-stratum top-k costs the same
    single window exchange as the exact stratified sampler."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**48))
    wd = F.col(weight_col).cast("double")
    es_key = F.round(F.log(u) / wd, 12)
    pool = df.filter(
        F.col(weight_col).isNotNull() & ~F.isnan(wd) & (wd > 0)
    ).withColumn("__es", es_key)
    if strata_col is None:
        return pool.orderBy(
            F.col("__es").desc(), F.col(key_col).asc()
        ).limit(k).drop("__es")
    w = W.partitionBy(strata_col).orderBy(
        F.col("__es").desc(), F.col(key_col).asc()
    )
    return (
        pool.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "__es")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str,
    salt: str = "cap",
    skip_under_cap: bool = True,
) -> DataFrame:
    """Head-group downsampling: keep at most ``cap`` rows per group,
    chosen by a deterministic content-derived priority — the
    crawl-curation step that stops a handful of mega-hosts from
    dominating the corpus (RefinedWeb caps URLs per domain, Dolma caps
    documents per source; same shape as C4's per-domain limits). The
    kept subset is md5-ranked, so it is a uniform random ``cap``-subset
    of each over-cap group, identical on every run/engine/partitioning,
    and re-dealt by changing ``salt``.

    Scale shape — the naive plan windows EVERY row by ``group_col``,
    and a mega-host is then ONE window partition: a single task sorting
    (and spilling) the whole host — measured 63.7 s worst-run vs a flat
    ~4 s for this path at a 6M-row mega-host (SCALE.md cap probe,
    scripts/bench_cap_scale.py); at a 500M-row host the single sort is
    a wall, full stop. row_number cannot salt without changing its
    answer, but SELECTION can — the priority here is an md5 string, so
    its leading byte is a uniform radix over each group. With
    ``skip_under_cap`` (default) the plan is a distributed
    radix-select:

    1. one counts aggregate (map-side partial combine) finds the
       over-cap groups; rows in under-cap groups — the Zipf tail, most
       of a crawl — pass through UNTOUCHED via a null-safe anti join.
       The over-cap list is FORCE-broadcast (hard precondition: the
       head is a small set of groups — the Zipf premise; left to the
       static planner, the null-safe join against a checkpointed table
       of unknown size plans a SortMergeJoin ON THE SKEWED HOST KEY,
       measured 23 s vs 1.4 s). A non-Zipf input where MOST groups
       exceed the cap breaks that premise — use
       ``skip_under_cap=False`` there: with no dominant group the
       plain window has no hot partition to fear;
    2. per over-cap group, counts by the priority's first byte (≤256
       rows per group, map-side combined) + a cumulative window over
       that TINY table find each group's threshold bucket: buckets
       wholly before it keep every row, buckets after it drop, and
       only the ONE threshold bucket — ~1/256th of the group — is
       ranked to fill the remaining slots;
    3. the final window therefore sorts ~group/256 rows per mega-host
       instead of the whole host, at any host size.

    Equivalent by construction to the plain single-window form
    (``skip_under_cap=False``): the priority string orders as (first
    byte, rest), so per-bucket selection composes to exactly the
    global per-group top-``cap`` (pinned by test). NULL groups are one
    group in both engines and both code paths (the joins are
    null-safe). ``key_col`` must be non-NULL (it is an id): a NULL key
    has no priority and the two engines order NULLs differently.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    pri = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = W.partitionBy(group_col).orderBy(pri.asc(), F.col(key_col).asc())
    if not skip_under_cap:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )
    salt_col = F.substring(pri, 1, 2)

    # pass 1: per-group counts -> the over-cap head (a TINY table at
    # any Zipf shape; checkpointed so no consumer re-aggregates the
    # corpus — measured: the un-checkpointed DAG re-ran this agg 4x)
    over = (
        df.groupBy(F.col(group_col).alias("__g"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > cap)
        .select("__g")
        .localCheckpoint(eager=False)
    )
    cond = F.col(group_col).eqNullSafe(F.col("__g"))
    # the control tables MUST broadcast: left to the static planner,
    # the null-safe join against a lazily-checkpointed table plans as
    # a SortMergeJoin on the group key — a full corpus shuffle whose
    # hottest key IS the mega-host (measured: 23 s vs 1.4 s at the 5M
    # probe shape). The Zipf premise bounds both tables (over-cap
    # groups, <=256 buckets each).
    passed = df.join(F.broadcast(over), cond, "left_anti")

    # pass 2: radix histogram of the HEAD only, by (group, first
    # priority byte) — <=256 rows per over-cap group regardless of
    # group size (histogramming every group instead would make this
    # table corpus-sized on a billion-host tail). Buckets wholly
    # before the threshold keep all rows, the ONE threshold bucket
    # (~1/256th of the group) gets ranked, later buckets never join;
    # all window work happens on this tiny table, not the corpus.
    wcum = (
        W.partitionBy("__g")
        .orderBy(F.col("__salt").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    actions = (
        df.join(F.broadcast(over), cond, "left_semi")
        .groupBy(F.col(group_col).alias("__g"), salt_col.alias("__salt"))
        .agg(F.count(F.lit(1)).alias("__bn"))
        .withColumn(
            "__before", F.coalesce(F.sum("__bn").over(wcum), F.lit(0))
        )
        .filter(F.col("__before") < cap)
        .select(
            "__g",
            F.col("__salt").alias("__asalt"),
            (F.lit(cap) - F.col("__before")).alias("__rem"),
            "__bn",
        )
        .localCheckpoint(eager=False)
    )
    acond = cond & (salt_col == F.col("__asalt"))
    keep_whole = df.join(
        F.broadcast(actions.filter(F.col("__rem") >= F.col("__bn"))),
        acond, "left_semi",
    )
    threshold = (
        df.join(
            F.broadcast(actions.filter(F.col("__rem") < F.col("__bn"))),
            acond, "inner",
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__rem"))
        .drop("__g", "__asalt", "__rem", "__bn", "__rn")
    )
    return passed.unionByName(keep_whole).unionByName(threshold)


def mixture_order(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "mixorder",
    round_digits: int = 9,
) -> DataFrame:
    """Deterministic weighted interleave of sources — stride scheduling
    (Waldspurger & Weihl 1995) applied to training-order construction:
    the i-th document of source s (1-based, md5-priority order) gets
    ``mix_key`` = i / w_s, and reading rows in ``mix_key`` order yields
    every source at its mixture weight IN EVERY PREFIX (|prefix count −
    w_s·L| ≤ ~1 per source), not just in expectation over the whole
    epoch. This is how a pipeline materializes "70% web / 20% code /
    10% books" so that training sees that ratio from step one — a
    shuffled union only promises it asymptotically.

    ``weights`` maps source → positive weight (normalized internally);
    sources absent from the map are DROPPED (explicit curation
    contract). ``weights=None`` uses weights ∝ source counts: a
    maximally even round-robin of the corpus as-is. When a source
    exhausts, its stride simply stops firing and the remaining sources
    fill the ratio gap proportionally — no rebalancing pass needed.

    Adds ``mix_pos`` (per-source 1-based md5 rank) and ``mix_key``
    (double, rounded to ``round_digits`` — the repo's round-before-
    compare convention so cross-engine ordering agrees exactly; break
    remaining ties on (source, key) downstream).

    Scale shape: one window exchange (rank within source) + a broadcast
    literal weight map. The global order is intentionally NOT
    materialized as a row number (that is a single-partition window);
    write with ``repartitionByRange(mix_key) + sortWithinPartitions``
    and the files ARE the schedule."""
    if weights is None:
        counts = {
            r[0]: r[1]
            for r in df.groupBy(source_col).count().collect()
            if r[0] is not None
        }
        if not counts:
            raise ValueError("mixture_order: no non-null sources")
        total = float(sum(counts.values()))  # int sum: order-free, exact
        # one division per source, no normalizing re-sum — the weight
        # doubles are reproducible by any engine as n_s / n_total
        norm = {s: c / total for s, c in counts.items()}
    else:
        if not weights:
            raise ValueError("mixture_order: empty weight map")
        bad = {s: w for s, w in weights.items() if not w > 0}
        if bad:
            raise ValueError(f"mixture_order: non-positive weights {bad}")
        # sum in sorted-source order so normalization is deterministic
        z = float(sum(w for _, w in sorted(weights.items())))
        norm = {s: w / z for s, w in weights.items()}

    pri = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = W.partitionBy(source_col).orderBy(pri.asc(), F.col(key_col).asc())
    wmap = F.create_map(
        *[F.lit(x) for s, v in sorted(norm.items()) for x in (s, float(v))]
    )
    out = (
        df.filter(F.col(source_col).isin(*norm.keys()))
        .withColumn("mix_pos", F.row_number().over(w).cast("long"))
        .withColumn(
            "mix_key",
            F.round(
                F.col("mix_pos").cast("double") / wmap[F.col(source_col)],
                round_digits,
            ),
        )
    )
    return out


def stratified_sample_approx(
    df: DataFrame, strata_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Row-local Bernoulli per stratum (Spark ``sampleBy``): no shuffle,
    no skew sensitivity — the 100 TB path when ±sqrt(n) wobble in the
    per-stratum count is acceptable. Not oracle-able (engine RNG)."""
    strata = [r[0] for r in df.select(strata_col).distinct().collect()]
    return df.sampleBy(strata_col, {s: fraction for s in strata}, seed=seed)


def pack_chunks(
    df: DataFrame,
    token_col: str,
    budget: int,
    strata_col: str,
    order_col: str | list[str],
) -> DataFrame:
    """Deterministic sequence-packing index: assign each document to the
    training chunk where its stratum's running token total lands —
    ``chunk_id = floor(exclusive_prefix_sum(tokens) / budget)``.

    This is the *assignment* half of sequence packing (concatenate-and-
    split does the byte work downstream); it is deterministic, engine-
    independent, and one window shuffle. The window partitions by the
    stratum (shard/language), never globally — a global running sum is
    a single-partition scale antipattern; packing within shards is both
    the realistic pipeline shape and the scalable one.

    ``order_col`` may be a list for composite orderings (e.g.
    ``["doc_id", "window_id"]`` when packing document chunks)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        W.partitionBy(strata_col)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "chunk_id", F.floor(cum_excl / F.lit(float(budget))).cast("long")
    )


def materialize_packs(
    df: DataFrame,
    text_col: str,
    strata_col: str,
    pack_col: str = "chunk_id",
    order_col: str | list[str] = "doc_id",
    separator: str = "<|endoftext|>",
) -> DataFrame:
    """The byte half of sequence packing (``pack_chunks`` is the
    assignment half): concatenate each pack's member texts, in the SAME
    deterministic order the assignment used, into one training-sequence
    row ``(strata, pack, n_members, pack_text)``.

    Scale shape: ONE groupBy((strata, pack)) exchange; member order is
    restored inside the row (sort_array over (order-key, text) structs
    — no window, no second shuffle). Per-row size is bounded by the
    packing budget (a pack holds ≈ budget tokens by construction), so
    collect_list cannot accumulate more than one training sequence —
    the property that makes in-row concatenation safe at any corpus
    size. The separator defaults to the conventional EOS sentinel."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    key = F.struct(*[F.col(c) for c in order_cols], F.col(text_col).alias("__t"))
    ordered = F.array_sort(F.collect_list(key))
    return (
        df.groupBy(strata_col, pack_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_members"),
            F.array_join(
                F.transform(ordered, lambda s: s.getField("__t")),
                separator,
            ).alias("pack_text"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    stride: int | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into fixed-size (optionally overlapping) token
    windows — the long-document preprocessing step before packing /
    embedding: one output row per chunk with
    (id_col, chunk_id, tok_start, tok_end, chunk_text, n_chunk_tokens).

    ``stride`` is the distance between chunk starts (default =
    chunk_tokens, i.e. disjoint windows; stride < chunk_tokens gives
    overlap). tok_start/tok_end are 0-based token offsets [start, end).
    The final chunk may be short; documents with no tokens yield no
    rows.

    Scale shape: entirely row-local — tokenize once (projected column,
    evaluated once per row), posexplode the per-document start index
    array, slice+join per chunk. No shuffle, no Python; output row
    count is Σ ceil(tokens/stride), so a corpus scan chunks at scan
    speed and downstream operators see ordinary string rows.

    ``carry_cols`` projects additional input columns (language, shard,
    source) through to every chunk row — row-local, so downstream
    per-stratum operators never join back to the corpus for them.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride} vs {chunk_tokens}"
        )
    from ..functions.text import tokens

    n = F.size("__toks")
    # 0-based chunk starts: 0, stride, 2·stride, ... < n  (empty when n=0)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    carry = list(carry_cols)
    return (
        df.withColumn("__toks", tokens(F.col(text_col)))
        .select(
            id_col,
            *carry,
            F.col("__toks"),
            F.posexplode(starts).alias("chunk_id", "tok_start"),
        )
        .select(
            id_col,
            *carry,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("tok_start").cast("long").alias("tok_start"),
            F.least(
                F.col("tok_start") + F.lit(chunk_tokens), F.size("__toks")
            ).cast("long").alias("tok_end"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("tok_start") + 1, F.lit(chunk_tokens)),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size("__toks") - F.col("tok_start")
            ).cast("long").alias("n_chunk_tokens"),
        )
    )


def chunk_documents_cdc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 16,
    max_tokens: int = 128,
    divisor: int = 32,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Content-defined chunking (the rsync / LBFS / FastCDC boundary
    idea at token granularity): cut AFTER any token whose content hash
    satisfies ``hash % divisor == 0``, subject to ``min_tokens`` /
    ``max_tokens`` run bounds. Same output shape as
    :func:`chunk_documents` (one row per chunk: id, chunk_id,
    tok_start, tok_end, chunk_text, n_chunk_tokens).

    Why it exists next to the fixed-window chunker: fixed windows are
    EDIT-FRAGILE — insert one token near the front of a document and
    every downstream window shifts, so every chunk hash changes and
    chunk-level dedup sees an entirely new document. CDC boundaries
    are decided by token CONTENT, so an edit only perturbs the chunk
    containing it (and at most its successor via the run bounds);
    every later boundary re-synchronizes and downstream chunk hashes
    are IDENTICAL — the property that makes chunk-level near-dup
    storage and delta-compression work (pinned by the resync test).

    Expected chunk length ≈ min_tokens + divisor; max_tokens caps
    pathological runs with no boundary token (degenerate/repetitive
    text). Boundary hash = first 8 hex chars of md5 of the BARE token
    (the corpus-wide hash family), so the boundary decision for a
    token is global — the same token cuts everywhere, which is what
    re-synchronizes two documents after a divergence.

    Scale shape: entirely row-local — one fold over the token-hash
    array builds the per-document start list, one posexplode emits the
    chunks. No shuffle, no Python, composes with ``pack_chunks``
    exactly like the fixed-window chunker.
    """
    if not 1 <= min_tokens <= max_tokens:
        raise ValueError(f"need 1 <= min_tokens <= max_tokens, got {min_tokens}, {max_tokens}")
    if divisor < 1:
        raise ValueError(f"divisor must be >= 1, got {divisor}")
    from ..functions.text import tokens

    toks = F.col("__toks")
    n = F.size(toks)
    # (hash, next_start) per position: the fold needs the position of
    # the token AFTER a cut, so zip the boundary hash with index+1
    hp = F.transform(
        toks,
        lambda t, i: F.struct(
            (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
             % F.lit(divisor)).alias("h"),
            (i + 1).alias("nxt"),
        ),
    )
    acc0 = F.struct(
        F.array(F.lit(0)).cast("array<int>").alias("starts"),
        F.lit(0).alias("run"),
    )
    step = lambda acc, s: F.when(  # noqa: E731 — inline fold step
        ((acc.run + 1 >= F.lit(min_tokens)) & (s.h == 0))
        | (acc.run + 1 >= F.lit(max_tokens)),
        F.struct(
            F.concat(acc.starts, F.array(s.nxt.cast("int"))).alias("starts"),
            F.lit(0).alias("run"),
        ),
    ).otherwise(F.struct(acc.starts.alias("starts"), (acc.run + 1).alias("run")))
    # drop a trailing cut exactly at the end (it would emit an empty
    # chunk); zero-token docs contribute no rows via the n > 0 gate
    starts = F.aggregate(
        hp, acc0, step,
        lambda acc: F.filter(acc.starts, lambda st: st < n),
    )
    bounds = F.concat(starts, F.array(n.cast("int")))
    carry = list(carry_cols)
    return (
        df.withColumn("__toks", tokens(F.col(text_col)))
        .where(n > 0)
        .withColumn("__bounds", bounds)
        .select(
            id_col,
            *carry,
            F.col("__toks"),
            F.col("__bounds"),
            F.posexplode(F.slice("__bounds", 1, F.size("__bounds") - 1)).alias(
                "chunk_id", "tok_start"
            ),
        )
        .withColumn(
            "__tok_end", F.element_at("__bounds", F.col("chunk_id") + 2)
        )
        .select(
            id_col,
            *carry,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("tok_start").cast("long").alias("tok_start"),
            F.col("__tok_end").cast("long").alias("tok_end"),
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    F.col("tok_start") + 1,
                    F.col("__tok_end") - F.col("tok_start"),
                ),
                " ",
            ).alias("chunk_text"),
            (F.col("__tok_end") - F.col("tok_start")).cast("long")
            .alias("n_chunk_tokens"),
        )
    )


def pack_chunks_bestfit(
    df: DataFrame,
    token_col: str,
    budget: int,
    strata_col: str,
    order_col: str | list[str],
    max_hist_rows: int = 1_000_000,
) -> DataFrame:
    """Non-splitting best-fit packing (histogram form — Krell et al.
    2021, "Efficient Sequence Packing without Cross-contamination"):
    assign each item to a ``pack_id`` such that no pack exceeds
    ``budget`` tokens and padding waste is near-optimal, WITHOUT
    splitting any item across packs (``pack_chunks`` is the splitting
    form — items straddle boundaries there; here every sequence stays
    whole, the shape attention-masked training packs need).

    Scale design — the bin-packing itself never sees the corpus:

    1. ONE aggregate collects the per-stratum LENGTH HISTOGRAM —
       per stratum at most ``budget`` distinct lengths, so the collect
       is strata × budget rows no matter the corpus size. That is only
       driver-safe for COARSE strata (language, domain bucket, split —
       dozens to thousands of groups): ``strata_col`` must NOT be a
       natural high-cardinality key like the raw URL host (millions of
       hosts × up-to-budget lengths = a multi-GB collect). The collect
       is hard-capped at ``max_hist_rows`` (the limit bounds the
       driver transfer itself) and raises with the remedy named when
       exceeded — pre-bucket the strata, e.g.
       ``F.pmod(F.xxhash64(host), F.lit(1024))``, or raise the cap;
    2. the driver runs best-fit-decreasing over the histogram in BULK
       (strategies = (length-multiset, multiplicity) pairs, split on
       partial fills) — O(distinct-lengths²) worst case, independent
       of item count;
    3. assignment is distributed: items rank within
       (stratum, length) via one window, then a broadcast slot table
       (one row per strategy×length, histogram-bounded) maps each rank
       range to its packs arithmetically. One window shuffle + one
       broadcast join — same exchange count as the splitting packer.

    Items LONGER than the budget each get a singleton pack (the
    caller should have chunked first; flagged ``oversize = true``).
    Deterministic: ranks order by ``order_col``, strategies by
    creation order — independent of partitioning (pinned by test).
    Output adds ``pack_id`` (long, unique within stratum) and
    ``oversize`` (boolean).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    hist = (
        df.groupBy(strata_col, token_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .limit(max_hist_rows + 1)
        .collect()
    )
    if len(hist) > max_hist_rows:
        raise ValueError(
            f"pack_chunks_bestfit: (stratum, length) histogram exceeds "
            f"max_hist_rows={max_hist_rows} — '{strata_col}' is too "
            f"fine-grained for a driver-side packing plan. Coarsen the "
            f"strata first (e.g. bucket hosts: F.pmod(F.xxhash64("
            f"'{strata_col}'), F.lit(1024))) or raise max_hist_rows if "
            f"the driver has the memory."
        )
    by_stratum: dict = {}
    for r in hist:
        by_stratum.setdefault(r[strata_col], {})[int(r[token_col])] = int(r["c"])

    # driver-side bulk best-fit-decreasing per stratum
    # slot table rows: (stratum, length, rank_start, rank_end_excl,
    #                   slots_per_pack, pack_base)
    slot_rows = []
    for stratum, counts in by_stratum.items():
        # strategies: [remaining, multiplicity, {length: slots}]
        strategies: list[list] = []
        next_rank: dict[int, int] = {}
        for L in sorted(counts, reverse=True):
            c = counts[L]
            if L > budget:  # singleton oversize packs
                strategies.append([0, c, {L: 1}])
                continue
            while c > 0:
                # best fit: tightest remaining capacity that still fits
                best = None
                for s in strategies:
                    if L <= s[0] and (best is None or s[0] < best[0]):
                        best = s
                if best is None:
                    # fresh packs: as many whole-L slots as fit
                    slots = budget // L
                    mult = max(c // slots, 1)
                    take_items = min(c, mult * slots)
                    # partial last pack folds into the same strategy —
                    # ranks map arithmetically regardless
                    mult = -(-take_items // slots)
                    strategies.append(
                        [budget - slots * L, mult, {L: slots}]
                    )
                    c -= take_items
                else:
                    take = min(c, best[1])
                    if take < best[1]:  # split multiplicity
                        rest = [best[0], best[1] - take, dict(best[2])]
                        best[1] = take
                        strategies.append(rest)
                    best[0] -= L
                    best[2][L] = best[2].get(L, 0) + 1
                    c -= take
        pack_base = 0
        for s in strategies:
            _, mult, slot_map = s
            for L, slots in slot_map.items():
                start = next_rank.get(L, 0)
                n_items = min(slots * mult, counts[L] - start)
                if n_items <= 0:
                    continue
                slot_rows.append(
                    (stratum, L, start, start + n_items, slots, pack_base)
                )
                next_rank[L] = start + n_items
            pack_base += mult

    spark = df.sparkSession
    stype = df.schema[strata_col].dataType.simpleString()
    slots_df = spark.createDataFrame(
        slot_rows,
        f"{strata_col} {stype}, __len long, __rs long, __re long, "
        "__spp long, __base long",
    )
    rw = W.partitionBy(strata_col, token_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    ranked = df.withColumn("__rank", F.row_number().over(rw) - 1)
    # eqNullSafe on the stratum: a NULL stratum (undetermined lang,
    # URL-less crawl rows) is a real packing group — a null-rejecting
    # equality would silently DROP every such item (review finding r7)
    joined = ranked.join(
        F.broadcast(slots_df),
        ranked[strata_col].eqNullSafe(slots_df[strata_col])
        & (F.col(token_col).cast("long") == F.col("__len"))
        & (F.col("__rank") >= F.col("__rs"))
        & (F.col("__rank") < F.col("__re")),
    ).drop(slots_df[strata_col])
    return joined.select(
        *df.columns,
        (
            F.col("__base") + ((F.col("__rank") - F.col("__rs")) / F.col("__spp"))
            .cast("long")
        ).alias("pack_id"),
        (F.col("__len") > budget).alias("oversize"),
    )


def chunk_documents_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sentence-bounded greedy chunking — the RAG / training-prep
    chunker that never cuts mid-sentence: sentences
    (functions/text.py::sentences) fill a chunk until the NEXT sentence
    would push it past ``max_tokens``, then a new chunk starts at that
    sentence boundary. A single sentence longer than the budget becomes
    its own oversize chunk (callers gate or re-split those; flagged by
    n_chunk_tokens > max_tokens) — splitting it here would defeat the
    operator's one guarantee.

    Same output shape as the other chunkers (one row per chunk: id,
    chunk_id, sent_start, sent_end, chunk_text, n_chunk_tokens), so it
    composes with ``pack_chunks``/``pack_chunks_bestfit`` unchanged.
    Token counts are NON-EMPTY whitespace tokens of each trimmed
    sentence (the empty-string filter matters: Spark's trim strips only
    spaces, so a newline-prefixed sentence would otherwise count a
    phantom token) — reflowing the text preserves them.

    Scale shape: entirely row-local — one regexp pass to split
    sentences, one fold over (token-count, index) pairs builds the
    per-document chunk-start list, one posexplode emits the chunks. No
    shuffle, no Python; the greedy fold is replayed exactly by DuckDB's
    list_reduce in the pack_sequences 'sent' oracle limb."""
    from ..functions.text import sentences

    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    sents = F.col("__sents")
    n = F.size(sents)
    # filter-nonempty: leading non-space whitespace (Spark trim strips
    # only spaces) would otherwise add a phantom empty token per sentence
    ncol = F.transform(
        sents,
        lambda s: F.size(F.filter(F.split(s, "\\s+"), lambda t: t != ""))
    )
    sp = F.transform(
        ncol, lambda c, i: F.struct(c.alias("n"), i.alias("i"))
    )
    acc0 = F.struct(
        F.array(F.lit(0)).cast("array<int>").alias("starts"),
        F.lit(0).alias("run"),
    )
    step = lambda acc, s: F.when(  # noqa: E731 — inline fold step
        (acc.run > 0) & (acc.run + s.n > F.lit(max_tokens)),
        F.struct(
            F.concat(acc.starts, F.array(s.i.cast("int"))).alias("starts"),
            s.n.alias("run"),
        ),
    ).otherwise(
        F.struct(acc.starts.alias("starts"), (acc.run + s.n).alias("run"))
    )
    starts = F.aggregate(sp, acc0, step, lambda acc: acc.starts)
    bounds = F.concat(starts, F.array(n.cast("int")))
    carry = list(carry_cols)
    return (
        df.withColumn("__sents", sentences(F.col(text_col)))
        .where(n > 0)
        .withColumn("__ns", ncol)
        .withColumn("__bounds", bounds)
        .select(
            id_col,
            *carry,
            "__sents", "__ns", "__bounds",
            F.posexplode(F.slice("__bounds", 1, F.size("__bounds") - 1)).alias(
                "chunk_id", "sent_start"
            ),
        )
        .withColumn(
            "__sent_end", F.element_at("__bounds", F.col("chunk_id") + 2)
        )
        .select(
            id_col,
            *carry,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("sent_start").cast("long").alias("sent_start"),
            F.col("__sent_end").cast("long").alias("sent_end"),
            F.array_join(
                F.slice(
                    F.col("__sents"),
                    F.col("sent_start") + 1,
                    F.col("__sent_end") - F.col("sent_start"),
                ),
                " ",
            ).alias("chunk_text"),
            F.aggregate(
                F.slice(
                    F.col("__ns"),
                    F.col("sent_start") + 1,
                    F.col("__sent_end") - F.col("sent_start"),
                ),
                F.lit(0),
                lambda a, x: a + x,
            ).cast("long").alias("n_chunk_tokens"),
        )
    )
