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
) -> list[list[float]]:
    """Distributed Lloyd's: returns the trained centroid table (k·dim —
    the only artifact). One shuffle per iteration; empty clusters keep
    their previous centroid (the standard fix)."""
    import numpy as np

    cents = _init_centroids(corpus, k, vec_col, seed)
    vecs = corpus.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        assigned = vecs.withColumn("cell", _nearest_centroid("v", cents))
        # per-(cell, dim) partial sums: map-side combine shrinks the
        # exchange to ≤ tasks·k·dim rows regardless of corpus size
        sums = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = np.array(cents, dtype="f8")
        counts = {}
        for r in sums:
            new[r["cell"], r["dim"]] = r["s"] / r["n"]
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
