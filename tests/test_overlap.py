"""Theta-sketch corpus-overlap audit (operators/overlap.py): set
operations on mergeable sketches, accuracy against exact sets, and
the merge law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.overlap import (
    merge_theta_states,
    overlap_matrix,
    theta_state,
)


@pytest.fixture(scope="module")
def sets(spark):
    # three keyed value sets with KNOWN relations:
    #  A = 0..3999, B = 2000..5999 (|A∩B|=2000, |A∪B|=6000),
    #  C = 10000..10999 (disjoint from both)
    rows = (
        [("A", v) for v in range(0, 4000)]
        + [("B", v) for v in range(2000, 6000)]
        + [("C", v) for v in range(10000, 11000)]
    )
    return spark.createDataFrame(rows, "src string, v long").cache()


def test_overlap_matrix_accuracy(spark, sets):
    st = theta_state(sets, ["src"], "v")
    m = {(r["a"], r["b"]): r for r in overlap_matrix(st, "src").collect()}
    assert set(m) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = m[("A", "B")]
    # 5% relative tolerance — 3x the ~1.6% rsd at lg_k=12
    assert abs(ab["est_a"] - 4000) <= 200
    assert abs(ab["est_b"] - 4000) <= 200
    assert abs(ab["est_union"] - 6000) <= 300
    assert abs(ab["est_inter"] - 2000) <= 300  # inter err ~ union-scaled
    assert abs(ab["est_diff_ab"] - 2000) <= 300
    assert abs(ab["jaccard_est"] - 2000 / 6000) <= 0.05
    assert abs(ab["containment_a"] - 0.5) <= 0.06
    # disjoint pairs estimate ~0 intersection
    for p in (("A", "C"), ("B", "C")):
        assert m[p]["est_inter"] <= 60
        assert m[p]["jaccard_est"] <= 0.012


def test_theta_merge_law(spark, sets):
    # sketches built per shard then merged estimate like one pass
    parts = [
        theta_state(sets.filter(F.col("v") % 3 == r), ["src"], "v")
        for r in range(3)
    ]
    merged = merge_theta_states(["src"], *parts)
    direct = theta_state(sets, ["src"], "v")
    em = {
        r["src"]: (r["n"], r["est"]) for r in _with_est(merged).collect()
    }
    ed = {
        r["src"]: (r["n"], r["est"]) for r in _with_est(direct).collect()
    }
    assert set(em) == set(ed)
    for k in ed:
        assert em[k][0] == ed[k][0]  # exact n adds up
        # estimates agree within the error bound of each other
        assert abs(em[k][1] - ed[k][1]) <= 0.05 * max(ed[k][1], 1)
    with pytest.raises(ValueError, match="no states"):
        merge_theta_states(["src"])


def _with_est(st):
    return st.withColumn(
        "est", F.theta_sketch_estimate(F.col("theta"))
    )


def test_overlap_subset_containment(spark):
    # B ⊂ A: containment_b ≈ 1 (everything in B is inside A)
    rows = [("A", v) for v in range(3000)] + [("B", v) for v in range(500)]
    df = spark.createDataFrame(rows, "src string, v long")
    st = theta_state(df, ["src"], "v")
    r = overlap_matrix(st, "src").collect()[0]
    assert r["containment_b"] >= 0.9
    assert r["est_diff_ab"] >= 2300  # |A \ B| = 2500


def test_theta_state_casts_doubles(spark):
    df = spark.createDataFrame(
        [("x", 1.5), ("x", 1.5), ("x", 2.5), ("y", None)],
        "src string, v double",
    )
    st = _with_est(theta_state(df, ["src"], "v"))
    got = {r["src"]: (r["n"], round(r["est"])) for r in st.collect()}
    assert got["x"] == (3, 2)  # 2 distinct, 3 non-null rows
    assert got["y"][0] == 0
