"""Distributed k-means over embedding columns + semantic deduplication.

Green-field scope beyond the reference (training-data pipeline family):
clustering an embedding corpus is the backbone of semantic curation —
domain mixing, per-cluster sampling quotas, and SemDeDup-style semantic
dedup (Abbas et al. 2023, public: cluster the corpus, then prune
near-identical pairs *within* clusters so the pair search never goes
corpus × corpus).

Scale shape (100 TB posture):
- Lloyd's iteration = ONE shuffle per round: assign each vector to its
  nearest centroid with a JVM column expression (broadcast-literal
  centroids, ``similarity._nearest_centroid``), then
  ``posexplode(embedding) → groupBy(cell, dim) → sum/count`` — a
  partial-aggregatable (map-side combine) update. Only k·dim numbers
  ever reach the driver, once per round.
- The driver loop holds centroids only — exactly the GraphX/MLlib
  contract. No ``.collect()`` of data rows anywhere.
- Semantic dedup self-joins WITHIN clusters (cell is the equi-join
  key), so pair generation is bucketed, never all-pairs; near-dup pairs
  then feed the same connected-components → keep-flag machinery as the
  text dedup family (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity
from .similarity import _nearest_centroid


def _init_centroids(
    corpus: DataFrame, k: int, vec_col: str, seed: int
) -> list[list[float]]:
    """Deterministic seed centroids: the k smallest md5(vec_id) rows —
    content-addressed (stable across partitioning/retries), spread by
    hash uniformity, and a single top-k job (TakeOrdered, no shuffle of
    the corpus)."""
    rows = (
        corpus.select(vec_col, F.md5(F.concat_ws("|", F.lit(seed), F.col(vec_col).cast("string"))).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 42,
    tol: float = 1e-6,
    init: str = "hash",
) -> list[list[float]]:
    """Distributed Lloyd's: returns the trained centroid table (k·dim —
    the only artifact). One shuffle per iteration; empty clusters keep
    their previous centroid (the standard fix).

    ``init``: "hash" (content-addressed top-k — deterministic, one
    cheap job, quality of random init) or "kmeans||" (Bahmani et al.
    2012 — O(log n) extra corpus passes for k-means++-quality seeding;
    the right default when Lloyd rounds are the expensive part).

    With init="hash" the whole fit is PARTITION-INDEPENDENT: the init
    is content-addressed and the Lloyd sums are exact DECIMAL, so the
    same corpus yields bit-identical centroids in any session/layout
    (pinned by test; the model-parquet oracle guard relies on it)."""
    import numpy as np

    if init == "kmeans||":
        cents = kmeans_parallel_init(corpus, k, vec_col, seed)
    elif init == "hash":
        cents = _init_centroids(corpus, k, vec_col, seed)
    else:
        raise ValueError(f'init must be "hash" or "kmeans||", got {init!r}')
    vecs = corpus.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        assigned = vecs.withColumn("cell", _nearest_centroid("v", cents))
        # per-(cell, dim) partial sums: map-side combine shrinks the
        # exchange to ≤ tasks·k·dim rows regardless of corpus size.
        # DECIMAL sum, not double: each element is rounded ONCE to 14 dp
        # by the cast (deterministic per value) and decimal addition is
        # exact, so the trained centroids are independent of partition
        # layout / reduction order — the property that lets the
        # oracle-ordering guard (queries_documents.ensure_model_parquets)
        # regenerate the SAME model in a different session. The n_bad
        # column turns the cast's silent NULL on |x| ≥ 1e14 (non-ANSI
        # mode) into a loud error instead of a skewed mean.
        xd = F.col("x").cast("decimal(28,14)")
        sums = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                F.sum(xd).alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.sum(xd.isNull().cast("int")).alias("n_bad"),
            )
            .collect()
        )
        bad = sum(r["n_bad"] for r in sums)
        if bad or any(r["s"] is None for r in sums):
            raise ValueError(
                f"kmeans_fit: {bad} embedding element(s) outside "
                "DECIMAL(28,14) range (|x| >= 1e14) — clean or rescale "
                "the corpus; a silent NULL here would skew the centroid"
            )
        new = np.array(cents, dtype="f8")
        counts = {}
        for r in sums:
            new[r["cell"], r["dim"]] = float(r["s"]) / r["n"]
            counts[r["cell"]] = r["n"]
        shift = float(np.abs(new - np.array(cents)).max())
        cents = [row.tolist() for row in new]
        if shift < tol:
            break
    return cents


def assign_clusters(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach the nearest-centroid cell id (JVM expression, no UDF)."""
    return corpus.withColumn("cell", _nearest_centroid(vec_col, centroids))


def semantic_near_pairs(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup pair generation: cosine ≥ threshold pairs WITHIN each
    k-means cell. The cell equi-join bounds the pair space to
    Σ_c |cell_c|² — the clustering is what makes 100 TB semantic dedup
    tractable (vs corpus² for the exact form)."""
    a = assign_clusters(corpus, centroids, vec_col).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "cell"
    )
    b = assign_clusters(corpus, centroids, vec_col).select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cell"
    )
    return (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cell", F.round("cosine", 6).alias("cosine"))
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full SemDeDup: within-cell near pairs → connected components →
    per-vector keep flags (canonical = min id per duplicate group)."""
    from .graph import duplicate_groups

    pairs = semantic_near_pairs(corpus, centroids, threshold, id_col, vec_col)
    return duplicate_groups(corpus, pairs.select("id_a", "id_b"), id_col=id_col)


def kmeans_parallel_init(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    seed: int = 42,
    rounds: int = 5,
    oversample: int | None = None,
) -> list[list[float]]:
    """k-means|| initialization (Bahmani et al. 2012, public): the
    distributed k-means++ replacement. Per round, every point is
    sampled with probability min(1, ℓ·d²(x,C)/Σd²) — expected ℓ new
    candidates per round, O(log n) rounds — then the ≤ rounds·ℓ
    candidates are weighted by how many corpus points they are nearest
    to and reduced to k with a driver-side weighted k-means++ (the
    candidate set is tiny, so the driver step is k·ℓ·rounds work, not
    corpus work).

    Scale shape: each round is ONE corpus pass — the running
    min-distance column is updated against only the round's NEW
    candidates (`least(d2, dist-to-ΔC)`), so the per-round expression
    is O(ℓ) literal arrays regardless of how many candidates have
    accumulated, and each round's frame is persisted (then explicitly
    unpersisted — see the in-code comment: exactly ONE corpus copy in
    executor storage, where eager checkpoints would pin rounds+1).
    Driver traffic per round: Σd² (8 bytes) + the sampled candidate
    vectors. The final weighting pass assigns against ALL accumulated
    candidates, so it uses the flat transform/array_position argmin
    (`_nearest_centroid` switches shape above 32 candidates) — the
    when-chain fold at rounds·ℓ ≈ 10⁴ blocks would stall codegen.

    Expression-size bound: ℓ (default 2k) literal centroid arrays per
    round block — fine to k ≈ 128; beyond that, run a two-level
    (hierarchical) init instead.

    Determinism: candidate sampling thresholds come from a CONTENT hash
    of the vector (murmur3 of the array + round-salted seed), not
    F.rand — per-row rand streams depend on partition layout, which
    would make the init (and its tests) vary with cluster shape. Exactly
    k centroids are always returned: degenerate corpora with fewer than
    k distinct points pad by cycling candidates (Lloyd's empty-cell
    rule keeps duplicates harmless).
    """
    import numpy as np

    ell = oversample or 2 * k
    rng = np.random.default_rng(seed)

    def d2_to(cands: list[list[float]]):
        v = F.col("v")
        expr = F.lit(float("inf"))
        for c in cands:
            carr = F.array(*[F.lit(float(x)) for x in c])
            d = F.aggregate(
                F.zip_with(v, carr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            expr = F.least(expr, d)
        return expr

    first = _init_centroids(corpus, 1, vec_col, seed)
    cands: list[list[float]] = list(first)
    # persist (not localCheckpoint): each round's frame is derived from
    # the previous, so an explicit unpersist keeps exactly ONE corpus
    # copy in executor storage — eager checkpoints would pin rounds+1
    # copies until the context cleaner got around to them
    vecs = corpus.select(F.col(vec_col).alias("v")).withColumn("d2", d2_to(first))
    vecs.persist()
    vecs.count()
    for r in range(rounds):
        tot = vecs.agg(F.sum("d2").alias("s")).first()["s"]
        if not tot or tot <= 0.0:  # corpus fully covered already
            break
        # content-addressed uniform in [0,1): partition-layout-independent
        u = (
            F.pmod(F.hash("v", F.lit(seed + 1 + r)), F.lit(2**31 - 1)).cast("double")
            / F.lit(float(2**31 - 1))
        )
        p = F.least(F.lit(1.0), F.lit(float(ell)) * F.col("d2") / F.lit(float(tot)))
        new_rows = vecs.filter(u < p).select("v").collect()
        new = [[float(x) for x in row["v"]] for row in new_rows]
        if not new:
            continue
        cands.extend(new)
        nxt_vecs = vecs.withColumn("d2", F.least(F.col("d2"), d2_to(new)))
        nxt_vecs.persist()
        nxt_vecs.count()
        vecs.unpersist()
        vecs = nxt_vecs

    # weights: corpus points nearest to each candidate (one pass)
    assigned = vecs.select(
        F.col("v"), _nearest_centroid("v", cands).alias("cell")
    )
    wrows = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("w")).collect()
    vecs.unpersist()
    weights = np.zeros(len(cands))
    for row in wrows:
        weights[row["cell"]] = row["w"]

    # driver-side weighted k-means++ over the small candidate set
    C = np.array(cands, dtype="f8")
    chosen = [int(np.argmax(weights))]
    d2 = ((C - C[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(cands)):
        probs = weights * d2  # chosen indices have d2 == 0.0 exactly,
        s = probs.sum()       # so rng.choice can never re-draw them
        if s <= 0:  # fewer distinct candidates than k: pad by weight rank
            remaining = [i for i in np.argsort(-weights) if i not in chosen]
            chosen.extend(remaining[: k - len(chosen)])
            break
        nxt = int(rng.choice(len(cands), p=probs / s))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((C - C[nxt]) ** 2).sum(axis=1))
    out = [C[i].tolist() for i in chosen[:k]]
    while len(out) < k:  # exact-k contract for degenerate corpora
        out.append(out[len(out) % max(len(chosen), 1)])
    return out
