"""Mergeable aggregate state — incremental corpus statistics without
rescans (the batch half of the lambda architecture; the streaming half
is streaming/events.py's algebraic incremental means).

Green-field scope: a 100 TB corpus updates monthly; recomputing
count/sum/min/max/mean/variance over the whole corpus per refresh
re-reads 100 TB. Instead, persist a per-key STATE table (count, sum,
sum-of-squares, min, max — all associative+commutative), compute the
same state over just the increment, and MERGE: state(A) ⊎ state(B) =
state(A ∪ B), exactly. Deletions are handled by merging the deleted
slice with negated count/sums (min/max then need a rebuild only if the
deleted slice touched them — flagged, not silently wrong).

Exactness is what makes the merge law hold on any cluster: sums
accumulate in DECIMAL (Spark decimal aggregation is exact and
order-independent, the same mechanism the quality classifier and
PageRank use for partition-independent fits), so merging snapshots in
any order, any grouping, yields bit-identical state — pinned by the
stats_suite 'aggstate' driver limb, whose oracle computes the UNSPLIT
aggregate directly while Spark merges two half-corpus states.

Scale shape: building a state is one groupBy (map-side partials); a
merge is a groupBy over the CONCATENATED STATES — state-table-sized,
not corpus-sized. Finalize (mean/variance) is row-local arithmetic on
the state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 14 integer digits of headroom for sums; squares get a wider type
_SUM_T = "decimal(28,14)"
_SUMSQ_T = "decimal(38,6)"

STATE_COLS = ("n", "n_overflow", "s", "sq", "mn", "mx")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key mergeable state over ``value_col``: n (non-null count),
    s (exact decimal sum), sq (exact decimal sum of squares), mn, mx,
    and n_overflow — values too large for the decimal sum type
    (|v| >= 10^14). The cast is try_cast, so behavior is identical
    under ANSI and legacy modes: the row is excluded from s/sq and
    REPORTED (a plain cast would THROW under ANSI and silently NULL
    under legacy — neither is a usable cross-cluster contract). A
    nonzero n_overflow means the state's sums exclude those rows —
    callers must treat it as a contract violation, not a statistic. NULL values contribute nothing (SQL aggregate
    semantics)."""
    v = F.col(value_col)
    vc = v.try_cast(_SUM_T)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        (F.count(v) - F.count(vc)).alias("n_overflow"),
        F.sum(vc).alias("s"),
        F.sum((vc * vc).try_cast(_SUMSQ_T)).alias("sq"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def merge_agg_states(keys: list[str], *states: DataFrame) -> DataFrame:
    """state(A) ⊎ state(B) ⊎ ... = state(A ∪ B ∪ ...), exactly: counts
    and decimal sums add, min/max fold. Cost is proportional to the
    STATE tables (per-key rows), never the corpora behind them.

    State schema contract: ``s`` is decimal(38,14) and ``sq``
    decimal(38,6) — the SUM-WIDENED types ``agg_state`` already emits
    (Spark's decimal sum adds 10 integer digits, capped at 38). The
    merge keeps them as-is: an earlier version narrowed ``s`` back to
    decimal(28,14), which silently NULLed (legacy) or threw (ANSI) once
    a merged total crossed 10^14 — exactly the multi-snapshot regime
    this operator exists for — with no n_overflow-style report. Sums
    stay exact to 10^24; per-value overflow is still caught and
    reported at ``agg_state`` time via n_overflow."""
    if not states:
        raise ValueError("merge_agg_states: no states to merge")
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("n_overflow").alias("n_overflow"),
        F.sum("s").alias("s"),
        F.sum("sq").alias("sq"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def distinct_state(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key MERGEABLE distinct-count state (round 9 — the n_distinct
    column agg_state deliberately omits, because exact distinct is the
    one classic statistic that does NOT merge: |A ∪ B| ≠ |A| + |B|).
    State = an Apache DataSketches HLL sketch per key
    (``hll_sketch_agg``, 2^lg_k registers, ~4 KiB at the default
    lg_k=12, rsd ≈ 1.04/√2^lg_k ≈ 1.6%). Register values are maxima
    over per-item hashes, so the sketch of a multiset is
    order/partitioning-independent and snapshots merge exactly like
    the decimal sums: union in any order, any grouping.

    ``hll_sketch_agg`` accepts INT/BIGINT/STRING/BINARY only; other
    types are canonicalized through CAST(... AS STRING) — Spark's
    shortest-roundtrip repr, injective per distinct value (one
    documented edge: -0.0 and 0.0 stringify differently and count as
    two, where countDistinct normalizes them to one)."""
    from pyspark.sql.types import BinaryType, IntegerType, LongType, StringType

    v = F.col(value_col)
    if not isinstance(
        df.schema[value_col].dataType,
        (IntegerType, LongType, StringType, BinaryType),
    ):
        v = v.cast("string")
    return (
        df.groupBy(*keys)
        .agg(
            F.hll_sketch_agg(v, lg_k).alias("hll"),
            F.count(value_col).alias("n"),
        )
    )


def merge_distinct_states(keys: list[str], *states: DataFrame) -> DataFrame:
    """state(A) ⊎ state(B) = state(A ∪ B): HLL union takes per-register
    maxima, so merging snapshot sketches yields the SAME sketch (and
    estimate) as one pass over the union — pinned by test. Cost is
    state-table rows × ~4 KiB, never a corpus rescan."""
    if not states:
        raise ValueError("merge_distinct_states: no states to merge")
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.hll_union_agg(F.col("hll")).alias("hll"),
        F.sum("n").alias("n"),
    )


def finalize_distinct(state: DataFrame) -> DataFrame:
    """Row-local estimate from the sketch: adds ``n_distinct_est``
    (long). Error model: relative standard deviation ≈ 1.04/√2^lg_k
    (~1.6% at lg_k=12); the stats_suite 'aggstate' driver limb pins
    the 3σ-ish 5% bound against the exact distinct as an oracle
    boolean."""
    return state.withColumn(
        "n_distinct_est", F.hll_sketch_estimate(F.col("hll"))
    )


def finalize_state(state: DataFrame) -> DataFrame:
    """Row-local derived statistics: mean and (population) variance
    from the exact sums — var = sq/n − (s/n)², clamped at 0 against
    the tiny negative residue the subtraction can leave for constant
    groups after the double cast. Groups with n=0 finalize to NULLs."""
    n = F.col("n").cast("double")
    mean = F.when(F.col("n") > 0, F.col("s").cast("double") / n)
    var = F.when(
        F.col("n") > 0,
        F.greatest(
            F.col("sq").cast("double") / n - mean * mean, F.lit(0.0)
        ),
    )
    return state.withColumn("mean", mean).withColumn("var", var)
