"""Corpus-overlap AUDIT via Theta sketches — estimate
|A ∩ B| / |A ∪ B| / |A \\ B| between corpora WITHOUT a join.

Green-field scope (no reference counterpart): the exact
decontamination operators (operators/decontam.py, blocklist.py) find
and REMOVE contaminated rows — a keyed join per benchmark. What they
can't do affordably is the AUDIT question asked across many pairs at
once: "how much do these 40 sources / snapshot versions / benchmark
suites overlap with each other?" — 40×39/2 exact joins over 100 TB.
Theta sketches (Dasgupta, Lang, Rhodes & Thaler, "Theta-Sketch
Framework", 2016; the Apache DataSketches family Spark 4 exposes
natively) answer it with ONE scan per corpus: unlike HLL, a theta
sketch supports set INTERSECTION and DIFFERENCE estimation, so the
whole pairwise overlap matrix is row-local arithmetic over a
|sources|-row state table of kilobyte sketches.

Mergeable like the rest of the state family (operators/aggstate.py):
theta union is the sketch's native merge, so per-shard/per-snapshot
sketches fold into per-corpus sketches without rescans, and the state
table persists for next month's audit.

Error model: a theta sketch with 2^lg_k nominal entries estimates any
single set with rsd ≈ 1/√(2^lg_k − 2) (~1.6% at the default lg_k=12).
Intersection error is RELATIVE TO THE UNION, not the intersection —
tiny overlaps of huge sets estimate with wide relative error (the
published caveat, stated here so callers size lg_k for the contrast
they need). The stats_suite 'overlap' driver limb pins exact anchors
cross-engine and the estimates as guarantee booleans, never sketch
bits (the approx-family policy).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theta_state(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key mergeable theta-sketch state over the DISTINCT values
    of ``value_col``: (keys..., theta, n). Like distinct_state but
    set-operable: two theta states intersect/difference, HLLs don't.
    Non-integral/non-string values canonicalize through CAST AS STRING
    (the distinct_state convention). One groupBy, map-side partial
    sketches — the exchange carries KBs per partition."""
    from pyspark.sql.types import BinaryType, IntegerType, LongType, StringType

    v = F.col(value_col)
    if not isinstance(
        df.schema[value_col].dataType,
        (IntegerType, LongType, StringType, BinaryType),
    ):
        v = v.cast("string")
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(v, lg_k).alias("theta"),
        F.count(value_col).alias("n"),
    )


def merge_theta_states(
    keys: list[str], *states: DataFrame, lg_k: int = 12
) -> DataFrame:
    """state(A) ⊎ state(B) = state(A ∪ B): theta union is the sketch's
    native merge. Cost is state-table rows, never the corpora."""
    if not states:
        raise ValueError("merge_theta_states: no states to merge")
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.theta_union_agg(F.col("theta"), lg_k).alias("theta"),
        F.sum("n").alias("n"),
    )


def overlap_matrix(states: DataFrame, key_col: str) -> DataFrame:
    """The pairwise overlap audit: for every unordered pair (a < b) of
    keys in a theta state table, row-local set-operation estimates:

    (a, b, est_a, est_b, est_union, est_inter, est_diff_ab,
     jaccard_est, containment_a, containment_b)

    where containment_a = |A∩B|/|A| (how much of A is inside B — the
    contamination rate when A is a benchmark and B a training corpus).
    The self-join runs over the STATE table (|keys| rows, broadcast);
    no corpus is touched. Estimates are doubles; jaccard/containment
    are NULL when the denominator estimates to 0 (two empty sets)."""
    a = states.select(
        F.col(key_col).alias("a"),
        F.col("theta").alias("__ta"),
    )
    b = states.select(
        F.col(key_col).alias("b"),
        F.col("theta").alias("__tb"),
    )
    pairs = a.join(F.broadcast(b), F.col("a") < F.col("b"))
    est_a = F.theta_sketch_estimate(F.col("__ta"))
    est_b = F.theta_sketch_estimate(F.col("__tb"))
    est_union = F.theta_sketch_estimate(
        F.theta_union(F.col("__ta"), F.col("__tb"))
    )
    est_inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("__ta"), F.col("__tb"))
    )
    est_diff = F.theta_sketch_estimate(
        F.theta_difference(F.col("__ta"), F.col("__tb"))
    )
    out = pairs.select(
        "a", "b",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_union.alias("est_union"),
        est_inter.alias("est_inter"),
        est_diff.alias("est_diff_ab"),
    )
    nz = lambda d: F.when(d > 0, d)  # noqa: E731
    return out.withColumn(
        "jaccard_est", F.col("est_inter") / nz(F.col("est_union"))
    ).withColumn(
        "containment_a", F.col("est_inter") / nz(F.col("est_a"))
    ).withColumn(
        "containment_b", F.col("est_inter") / nz(F.col("est_b"))
    )
