"""Distributed k-means + SemDeDup (operators/clustering.py) — blob
recovery for both init paths, the k-means|| quality bound, and the
within-cluster semantic dedup contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    kmeans_parallel_init,
    semantic_dedup,
    semantic_near_pairs,
)

DIM = 8
CENTERS = np.array([
    [5.0] * DIM,
    [-5.0] * DIM,
    [5.0] * 4 + [-5.0] * 4,
])


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for label, c in enumerate(CENTERS):
        for _ in range(120):
            rows.append((vid, label, (c + rng.normal(0, 0.5, DIM)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    return df.cache()


def _inertia(df, cents):
    a = assign_clusters(df, cents)
    pdf = a.select("embedding", "cell").toPandas()
    C = np.array(cents)
    vec = np.stack(pdf["embedding"].to_numpy())
    return float(((vec - C[pdf["cell"].to_numpy()]) ** 2).sum())


def _recovers_centers(cents):
    C = np.array(cents)
    for true in CENTERS:
        d = np.abs(C - true).max(axis=1).min()
        if d > 1.0:
            return False
    return True


def test_kmeans_recovers_blobs_with_parallel_init(spark, blobs):
    """k-means|| seeding recovers all three planted centers. Hash
    (random-quality) seeding demonstrably does NOT on this dataset —
    with this seed all 3 seeds land in one blob and Lloyd's cannot
    split out of it — which is precisely the failure mode k-means||
    exists to prevent; hash init is only asserted shape-valid."""
    cents = kmeans_fit(blobs, k=3, iters=15, seed=5, init="kmeans||")
    assert len(cents) == 3 and all(len(c) == DIM for c in cents)
    assert _recovers_centers(cents), np.array(cents)

    hash_cents = kmeans_fit(blobs, k=3, iters=15, seed=5, init="hash")
    assert len(hash_cents) == 3 and all(len(c) == DIM for c in hash_cents)
    # document the motivating gap: on this seed, hash init converges to
    # a strictly worse optimum than k-means|| init
    assert _inertia(blobs, cents) < _inertia(blobs, hash_cents)


def test_kmeans_parallel_init_quality(spark, blobs):
    """k-means|| seeding must start at least as well as hash seeding
    ends up after ONE Lloyd round — the point of the expensive init."""
    para = kmeans_parallel_init(blobs, k=3, seed=5)
    assert len(para) == 3
    hash1 = kmeans_fit(blobs, k=3, iters=1, seed=5, init="hash")
    assert _inertia(blobs, para) <= _inertia(blobs, hash1) * 1.5
    # and the full fit from k-means|| is never worse than from hash
    f_para = kmeans_fit(blobs, k=3, iters=15, seed=5, init="kmeans||")
    f_hash = kmeans_fit(blobs, k=3, iters=15, seed=5, init="hash")
    assert _inertia(blobs, f_para) <= _inertia(blobs, f_hash) * 1.05


def test_kmeans_fit_rejects_unknown_init(spark, blobs):
    with pytest.raises(ValueError, match="init"):
        kmeans_fit(blobs, k=3, init="random")


def test_semantic_dedup_within_clusters(spark, blobs):
    """Planted near-identical vectors land in the same cell and dedup
    into one group with min-id canonical; distinct blobs never pair."""
    base = blobs
    twins = base.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "label",
        F.transform("embedding", lambda x: x * 1.0000001).alias("embedding"),
    )
    corpus = base.unionByName(twins).cache()
    cents = kmeans_fit(corpus, k=3, iters=10, seed=5, init="kmeans||")

    pairs = semantic_near_pairs(corpus, cents, threshold=0.999999).toPandas()
    planted = {(i, i + 10_000) for i in range(3)}
    assert planted <= set(zip(pairs.id_a, pairs.id_b))

    groups = semantic_dedup(corpus, cents, threshold=0.999999).toPandas()
    for i in range(3):
        g = groups[groups.vec_id.isin([i, i + 10_000])]
        assert g.comp_id.nunique() == 1
        assert set(g[g.keep == 1].vec_id) == {i}
    # non-planted vectors keep themselves
    singles = groups[~groups.vec_id.isin([x for p in planted for x in p])]
    assert (singles.keep == 1).all()
    corpus.unpersist()


def test_kmeans_parallel_init_exact_k_on_degenerate_corpus(spark):
    """A corpus with fewer distinct points than k still yields exactly
    k centroids (padded by cycling) — downstream per-cluster code
    relies on the k-length contract, and Lloyd's empty-cell rule keeps
    duplicate centroids harmless."""
    rows = [(i, [1.0] * DIM if i % 2 else [-1.0] * DIM) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_parallel_init(df, k=6, seed=3)
    assert len(cents) == 6
    distinct = {tuple(c) for c in cents}
    assert distinct <= {tuple([1.0] * DIM), tuple([-1.0] * DIM)}
    assert len(distinct) == 2  # both real points found before padding


def test_kmeans_fit_partition_independent(spark, blobs):
    """The trained model is a deterministic function of the corpus:
    content-hash init + exact DECIMAL Lloyd sums, so the centroids are
    bit-identical under any partitioning — the property the
    model-parquet oracle guard (queries_documents.ensure_model_parquets)
    relies on to regenerate the SAME model in a different session."""
    a = kmeans_fit(blobs.repartition(7), k=3, iters=4, seed=5)
    b = kmeans_fit(blobs.repartition(2), k=3, iters=4, seed=5)
    assert a == b  # exact float equality, not allclose


def test_nearest_centroid_shapes_agree(spark, blobs):
    """_nearest_centroid dispatches to the when/least chain (<=32
    candidates) or the flat transform/array_position argmin. Both
    shapes must agree with each other AND a NumPy truth, including
    first-minimum ties and the all-NULL-distance rule."""
    from argostats_spark.operators.similarity import (
        _argmin_chain, _argmin_flat,
    )

    rng = np.random.default_rng(3)
    # candidates: the true centers, random decoys, then EXACT
    # duplicates of the true centers appended LAST — every blob point
    # ties its center's distance bit-for-bit with the duplicate, so the
    # first-minimum rule decides every single row
    cands = CENTERS.tolist() + rng.normal(0, 4, (34, DIM)).tolist()
    cands += CENTERS.tolist()               # indices 37, 38, 39
    dup_idx = set(range(len(cands) - 3, len(cands)))

    both = blobs.select(
        "vec_id",
        _argmin_chain(F.col("embedding"), cands).alias("chain"),
        _argmin_flat(F.col("embedding"), cands).alias("flat"),
    ).collect()
    pdf = blobs.select("vec_id", "embedding").toPandas()
    C = np.array(cands)
    vec = np.stack(pdf["embedding"].to_numpy())
    d = ((vec[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    expect = dict(zip(pdf["vec_id"].tolist(), d.argmin(axis=1).tolist()))
    for r in both:
        assert r["chain"] == r["flat"] == expect[r["vec_id"]], r
        assert r["chain"] not in dup_idx  # first minimum wins the tie


def test_nearest_centroid_null_vector_pins_to_zero(spark):
    """A NULL element makes every distance NULL; both shapes must
    resolve to index 0 (chain: NULL never beats the running best;
    flat: coalesce over the NULL array_position)."""
    from argostats_spark.operators.similarity import (
        _argmin_chain, _argmin_flat,
    )

    df = spark.createDataFrame(
        [(1, [None, 1.0, 2.0]), (2, [7.0, 1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    cands = [[7.0, 1.0, 2.0], [0.0, 0.0, 0.0], [9.0, 9.0, 9.0]]
    rows = {r["vec_id"]: r for r in df.select(
        "vec_id",
        _argmin_chain(F.col("embedding"), cands).alias("chain"),
        _argmin_flat(F.col("embedding"), cands).alias("flat"),
    ).collect()}
    assert rows[1]["chain"] == rows[1]["flat"] == 0   # all-NULL row
    assert rows[2]["chain"] == rows[2]["flat"] == 0   # exact match row
