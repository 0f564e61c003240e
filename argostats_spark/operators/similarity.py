"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the query set
against a full scan, exact, O(N·Q). Scale paths:

- IVF (inverted-file) — coarse-quantize every vector to its nearest
  centroid; queries probe only the closest ``nprobe`` centroid
  partitions. The centroid table is tiny (broadcast); the partition
  assignment is the shuffle key, so a 100 TB corpus is pruned to
  nprobe/ncentroids of itself before any exact math.
- Random-hyperplane LSH bucketing — deterministic pseudo-random planes
  derived from a seed (no stored model), sign-pattern bucket as the
  equi-join key.

Everything below is JVM column expressions (zip_with/aggregate dot
products); no Python in the per-row path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity, dot_product


def cosine_pairs(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    return pairs.withColumn("cosine", cosine_similarity(a_col, b_col))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    q_vec_col: str = "qv",
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k: broadcast queries × full corpus scan + ranking
    window. ``vec_col`` may hold any numeric array (cosine casts
    element-wise to double), so the quantized SQ8 code column ranks
    through the same path. ``round_digits`` rounds the similarity
    BEFORE ranking (round-before-compare: cross-engine ties then break
    identically on vec_id)."""
    q = F.broadcast(queries.select(F.col(q_id_col).alias("qid"), F.col(q_vec_col).alias("qv")))
    sim = cosine_similarity("qv", vec_col)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    pairs = q.join(corpus, F.col(id_col) != F.col("qid")).select(
        "qid",
        F.col(id_col).alias("vec_id"),
        sim.alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


# ---------------------------------------------------------------------------
# IVF: train centroids (driver-side k-means on a sample), assign, probe
# ---------------------------------------------------------------------------


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Tiny k-means on a driver-side sample — the centroid table is the
    only thing that ever leaves the cluster, and it is O(k·dim).

    The sample is a Bernoulli ``.sample()`` across ALL partitions (a
    ``.limit()`` would take the first rows of the first partitions — not
    a sample; centroids would be trained on one corner of the corpus).
    No ``.limit()`` after the sample either: limit stops pulling once
    the earliest partitions supply enough rows, which systematically
    excludes the corpus tail — we accept the ~sample_rows·(1±ε) the
    Bernoulli draw yields instead. The count() that sizes the fraction
    is metadata-cheap on Parquet."""
    import numpy as np

    total = corpus.count()
    sampled = corpus.select(vec_col)
    if total > sample_rows:
        fraction = min(1.0, sample_rows / total)
        sampled = sampled.sample(fraction=fraction, seed=seed)
    sample = sampled.toPandas()[vec_col].to_numpy()
    x = np.stack(sample).astype("f8")
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return [c.tolist() for c in cents]


def _sq_dist_fold(v: Column, carr: Column) -> Column:
    """Σ(a-b)² as a zip_with fold in index order — the ONE distance
    expression every argmin shape (and pq.py's block encoder) builds
    on, so oracle bit-parity claims hold for all of them at once."""
    return F.aggregate(
        F.zip_with(v, carr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_chain(v: Column, centroids: list[list[float]]) -> Column:
    """when/least-chain argmin: first strict minimum wins (lowest index
    on exact ties); an all-NULL distance row yields index 0 (NULLs never
    beat the running best)."""
    best_id = F.lit(0)
    best_d = F.lit(float("inf"))
    for i, c in enumerate(centroids):
        d = _sq_dist_fold(v, F.array(*[F.lit(float(x)) for x in c]))
        best_id = F.when(d < best_d, F.lit(i)).otherwise(best_id)
        best_d = F.least(best_d, d)
    return best_id


def _argmin_flat(v: Column, centroids: list[list[float]]) -> Column:
    """Flat transform + array_min + array_position argmin over one
    literal array-of-arrays. Same semantics as the chain: array_min
    skips NULL distances and array_position takes the FIRST equal
    element (NULL elements never match), and the coalesce pins the
    all-NULL row to index 0 exactly like the chain."""
    cents_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    darr = F.transform(cents_lit, lambda c: _sq_dist_fold(v, c))
    pos = (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
    return F.coalesce(pos, F.lit(0))


def _nearest_centroid(vec_col: str, centroids: list[list[float]]) -> Column:
    """argmin over centroid squared distances, JVM-side, first minimum
    wins (lowest index on exact ties).

    Two shapes with identical semantics AND identical per-distance
    arithmetic (`_sq_dist_fold`): the when/least chain for small
    centroid lists (≤32 — the plan tests pin this shape for the
    IVF/k-means demos), and the flat transform shape beyond that — the
    chain nests one aggregate per centroid inside a growing
    conditional, and its analysis/codegen cost is superlinear
    (MEASURED, SCALE.md: 64 candidates 74.5 s vs 6.6 s flat; 128:
    237 s vs 5.2 s), while k-means|| weighting legitimately assigns
    against rounds·ℓ ≈ 10⁴ candidates. Shape equivalence incl. the
    tie and NULL rules is pinned by test."""
    v = F.col(vec_col)
    if len(centroids) > 32:
        return _argmin_flat(v, centroids)
    return _argmin_chain(v, centroids)


def ivf_assign(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach the IVF partition id. Persist/partitionBy('ivf_cell') when
    writing — queries then prune whole partitions."""
    return corpus.withColumn("ivf_cell", _nearest_centroid(vec_col, centroids))


def ivf_topk(
    corpus_assigned: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    q_vec_col: str = "qv",
) -> DataFrame:
    """Approximate top-k probing only the ``nprobe`` nearest IVF cells
    per query: queries explode to (qid, cell) pairs, equi-join on cell
    replaces the full scan."""
    import numpy as np

    qpdf = queries.select(
        F.col(q_id_col).alias("qid"), F.col(q_vec_col).alias("qv")
    )
    cents = np.asarray(centroids, dtype="f8")

    # driver-side probe list per query (query set is small by definition)
    qrows = qpdf.collect()
    probe_rows = []
    for r in qrows:
        v = np.asarray(r.qv, dtype="f8")
        d = ((cents - v[None, :]) ** 2).sum(axis=1)
        for c in np.argsort(d)[:nprobe]:
            probe_rows.append((r.qid, list(map(float, r.qv)), int(c)))
    spark = corpus_assigned.sparkSession
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "qid long, qv array<double>, ivf_cell int")
    )

    pairs = probes.join(corpus_assigned, on="ivf_cell").filter(
        F.col(id_col) != F.col("qid")
    ).select(
        "qid",
        F.col(id_col).alias("vec_id"),
        cosine_similarity("qv", vec_col).alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def probe_cells(
    vec_col: str, centroids: list[list[float]], nprobe: int
) -> Column:
    """Top-``nprobe`` nearest IVF cells as a pure column expression:
    per-centroid squared distances folded into (dist, cell) structs,
    sort_array (struct order = first field first), slice, project.
    The array length is the centroid count — small by design — so the
    interpreted higher-order functions touch k elements per row, not
    the embedding dimension times a Python round-trip."""
    v = F.col(vec_col)
    entries = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        entries.append(F.struct(d.alias("d"), F.lit(i).alias("cell")))
    ranked = F.slice(F.sort_array(F.array(*entries)), 1, nprobe)
    return F.transform(ranked, lambda s: s["cell"])


def ivf_topk_scalable(
    corpus_assigned: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    q_vec_col: str = "qv",
    round_digits: int | None = None,
) -> DataFrame:
    """``ivf_topk`` with NO driver round-trip: the probe list is the
    ``probe_cells`` column expression exploded to (qid, cell) rows, so a
    query *table* of millions flows straight into the cell equi-join
    (SCALE.md open item closed). Same answers as ivf_topk — both argmin
    the same centroid distances (pinned by test).

    At ``nprobe == len(centroids)`` every cell is probed, so the result
    is EXACTLY brute-force top-k — the property the driver's derived
    oracle hashes. ``round_digits`` rounds the similarity BEFORE the
    ranking window so tie-breaking is reproducible across engines
    (float→double accumulation differences live far below 1e-5).

    Skew note: a hot cell concentrates both corpus rows and probes; AQE
    skew-join splits it, and raising n_centroids shrinks cell mass —
    the same two knobs as the collected variant."""
    probes = queries.select(
        F.col(q_id_col).alias("qid"),
        F.col(q_vec_col).alias("qv"),
        F.explode(probe_cells(q_vec_col, centroids, nprobe)).alias("ivf_cell"),
    )
    sim = cosine_similarity("qv", vec_col)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    pairs = probes.join(corpus_assigned, on="ivf_cell").filter(
        F.col(id_col) != F.col("qid")
    ).select(
        "qid",
        F.col(id_col).alias("vec_id"),
        sim.alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


# ---------------------------------------------------------------------------
# Random-hyperplane LSH bucket
# ---------------------------------------------------------------------------


def _pseudo_plane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish plane from (seed, plane_idx)
    — reproducible on every executor with no model artifact."""
    import numpy as np

    rng = np.random.default_rng(seed * 1_000_003 + plane_idx)
    v = rng.standard_normal(dim)
    return (v / math.sqrt(float((v * v).sum()))).tolist()


def hyperplane_bucket(
    vec_col: str, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Sign-pattern bucket id over ``n_planes`` pseudo-random hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in _pseudo_plane(dim, i, seed)])
        sign = F.when(dot_product(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(F.shiftleft(sign.cast("long"), i))
    return bucket


# ---------------------------------------------------------------------------
# MRL: Matryoshka prefix-dimension retrieval
# ---------------------------------------------------------------------------


def mrl_truncate(vec_col: str | Column, d: int) -> Column:
    """First-``d``-dimensions prefix of an embedding (Kusupati et al.
    2022, "Matryoshka Representation Learning" — MRL-trained encoders
    pack a usable low-dim embedding into every prefix). Pure
    ``slice``: one column expression, no recompute, no re-embed.

    The retrieval pattern at corpus scale is two-stage: score
    candidates on a short prefix (d/64ths of the bytes through the
    scan; with the prefix materialized as its own column, column
    pruning means the full vector is read only for the re-rank set),
    then re-rank survivors at full dimension. Cosine works unchanged —
    prefix norms are what they are; cosine_similarity normalizes per
    row."""
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.slice(c, 1, d)


def mrl_topk(
    corpus: DataFrame,
    queries: DataFrame,
    d: int,
    k: int = 10,
    rerank_full: bool = False,
    expand: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    q_vec_col: str = "qv",
    round_digits: int | None = None,
) -> DataFrame:
    """Top-k by cosine over the first ``d`` dimensions; with
    ``rerank_full`` the prefix stage keeps ``expand * k`` candidates
    and the full-dimension cosine re-ranks just those (the standard
    funnel: cheap wide stage, exact narrow stage). Deterministic
    (score desc, vec_id) tie-break throughout."""
    from pyspark.sql import Window as W

    from ..functions.arrays import cosine_similarity

    q = F.broadcast(
        queries.select(
            F.col(q_id_col).alias("qid"),
            mrl_truncate(q_vec_col, d).alias("qp"),
            F.col(q_vec_col).alias("qv"),
        )
    )
    stage_k = expand * k if rerank_full else k
    sim = cosine_similarity("qp", mrl_truncate(vec_col, d))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    pairs = q.join(corpus, F.col(id_col) != F.col("qid")).select(
        "qid", "qv", F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"), sim.alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    head = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= stage_k)
        .drop("rn")
    )
    if not rerank_full:
        return head.drop("qv", "cv")
    full_sim = cosine_similarity("qv", "cv")
    if round_digits is not None:  # round-before-compare holds in BOTH stages
        full_sim = F.round(full_sim, round_digits)
    full = head.withColumn("cosine", full_sim).drop("qv", "cv")
    return (
        full.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    on: list[str],
    rank_col: str = "rank",
    k: int = 60,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR
    2009; the Elasticsearch/OpenSearch hybrid-search default): fuse
    N retrievers' rankings into one score per key,

        rrf(key) = Σ_lists 1 / (k + rank_in_list)

    Returns (*on, rrf_score, n_lists) for every key present in at
    least one list — rank-based fusion needs no score calibration
    across retrievers (BM25 scores and cosine similarities live on
    incomparable scales; ranks don't), which is exactly why it is the
    standard lexical+dense combiner. ``k`` damps the head (k=60 is the
    paper's constant); ``n_lists`` exposes single-list stragglers so
    callers can require corroboration.

    Scale shape: one unionByName + one keyed aggregate over the
    CANDIDATE rows (each retriever's top-k × queries — never corpus-
    sized). Score rounded to ``round_digits`` (the cross-engine
    determinism policy: the sum over ≤N reciprocal terms is
    partition-order-dependent at ~1e-17)."""
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    u = None
    for r in rankings:
        part = r.select(*on, F.col(rank_col).alias("__rk"))
        u = part if u is None else u.unionByName(part)
    return u.groupBy(*on).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__rk"))),
            round_digits,
        ).alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
