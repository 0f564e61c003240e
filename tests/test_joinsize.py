"""CMS inner-product join-size pre-flight (operators/joinsize.py):
one-sided error bounds against exact join sizes, skew behavior, and
the geometry contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.joinsize import (
    join_size_estimate,
    key_sketch,
    preflight_join_size,
)


@pytest.fixture(scope="module")
def sides(spark):
    # side A: key j appears j times (j=1..40); side B: uniform 3 each
    a = [(i, j) for j in range(1, 41) for i in range(j)]
    b = [(i, j) for j in range(1, 41) for i in range(3)]
    dfa = spark.createDataFrame(
        [(x, k) for x, (_, k) in enumerate(a)], "id long, k long"
    ).cache()
    dfb = spark.createDataFrame(
        [(x, k) for x, (_, k) in enumerate(b)], "id long, k long"
    ).cache()
    # exact join size = sum_j j*3
    return dfa, dfb, sum(j * 3 for j in range(1, 41))


def test_estimate_brackets_exact_size(spark, sides):
    dfa, dfb, exact = sides
    r = preflight_join_size(dfa, "k", dfb, "k", eps=0.001)
    assert r["n_a"] == dfa.count() and r["n_b"] == dfb.count()
    assert r["est"] >= exact                      # never underestimates
    assert r["est"] <= exact + r["upper_slack"]   # one-sided bound
    # at eps=0.001 over distinct small keys the estimate is EXACT
    # (no hash collisions within width=ceil(2/eps)=2000 columns for
    # 40 keys is not guaranteed, but the bound is tiny): within 1%
    assert r["est"] <= exact * 1.01
    # cross-check against the real join
    true = dfa.join(dfb, "k").count()
    assert true == exact


def test_skewed_key_dominates_estimate(spark):
    # one hot key with multiplicity 1000 on both sides: join size is
    # ~10^6, dwarfing the 100 uniform keys — the pre-flight must see it
    hot = [(i, 0) for i in range(1000)]
    cold = [(1000 + j, 1 + j % 100) for j in range(1000)]
    df = spark.createDataFrame(hot + cold, "id long, k long")
    r = preflight_join_size(df, "k", df, "k", eps=0.001)
    exact = 1000 * 1000 + sum(
        c * c for c in [10] * 100
    )  # 100 cold keys x10 each
    assert r["est"] >= exact
    assert r["est"] <= exact + r["upper_slack"]
    assert r["est"] >= 1_000_000  # the blast radius is visible


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, None), (3, None)], "id long, k long"
    )
    s = key_sketch(df, "k")
    r = join_size_estimate(s, s)
    assert r["n_a"] == 1  # NULLs never join, never counted


def test_geometry_mismatch_is_loud(spark, sides):
    dfa, dfb, _ = sides
    a = key_sketch(dfa, "k", eps=0.001)
    b_eps = key_sketch(dfb, "k", eps=0.01)
    with pytest.raises(ValueError, match="geometry or"):
        join_size_estimate(a, b_eps)
    b_seed = key_sketch(dfb, "k", eps=0.001, seed=7)
    with pytest.raises(ValueError, match="geometry or"):
        join_size_estimate(a, b_seed)
    with pytest.raises(ValueError, match="too short"):
        join_size_estimate(b"xx", b"xx")


def test_inner_product_exact_past_int64(spark):
    """Overflow hardening: synthetic tables with counts ~2^33 would
    overflow an int64 product — the decoder path must stay exact."""
    import struct

    import numpy as np

    from argostats_spark.operators.joinsize import join_size_estimate

    depth, width = 2, 4
    big = 1 << 33
    header = struct.pack(">iqii", 1, big * width, depth, width)
    hashes = np.arange(depth, dtype=">i8").tobytes()
    table = np.full((depth, width), big, dtype=">i8").tobytes()
    raw = header + hashes + table
    r = join_size_estimate(raw, raw)
    assert r["est"] == width * big * big  # 4 * 2^66 — exact, positive


# ---------------------------------------------------------------- round 12
# choose_join_strategy / apply_join_strategy — the advisor that turns
# the pre-flight from a diagnostic into a planner input (VERDICT r11
# item 4).


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def test_advisor_broadcasts_small_side(spark, sides):
    from argostats_spark.operators.joinsize import (
        apply_join_strategy,
        choose_join_strategy,
    )

    dfa, dfb, _ = sides  # b has 120 rows
    d = choose_join_strategy(dfa, "k", dfb, "k", broadcast_rows=500)
    assert d["strategy"] == "broadcast_b" and "broadcast" in d["reason"]
    out = apply_join_strategy(dfa, dfb, ["k"], d)
    assert out.count() == dfa.join(dfb, ["k"]).count()
    assert "BroadcastHashJoin" in _plan(out)


def test_advisor_salts_partition_dominating_hot_key(spark):
    from argostats_spark.operators.joinsize import (
        apply_join_strategy,
        choose_join_strategy,
    )

    # fact: one key holds 50k of 52k rows; dim: 200 keys x 2 rows,
    # too many rows for the (deliberately tiny) broadcast budget
    fact = spark.range(52_000).select(
        F.col("id"),
        F.when(F.col("id") < 50_000, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(200))).alias("k"),
    ).cache()
    dim = spark.createDataFrame(
        [(k, r) for k in range(200) for r in range(2)], "k long, tag long"
    ).cache()
    d = choose_join_strategy(
        fact, "k", dim, "k", broadcast_rows=100, shuffle_partitions=32
    )
    assert d["strategy"] == "salted" and d["salt_side"] == "a"
    assert d["n_salts"] and d["n_salts"] > 1
    # the fmax upper bound must actually see the hot key
    assert d["fmax_ub_a"] >= 50_000
    assert d["trusted"]  # slack far below the (hot-key-dominated) est
    out = apply_join_strategy(fact, dim, ["k"], d)
    assert out.count() == fact.join(dim, ["k"]).count()
    # plan pin: the join condition carries the salt column, i.e. the
    # executed join IS the salted one, not a plain re-join
    assert "__argostats_salt" in _plan(out)


def test_advisor_plain_when_uniform_and_plain_when_both_sides_big(spark):
    from argostats_spark.operators.joinsize import choose_join_strategy

    uni_a = spark.range(20_000).select(
        F.col("id"), F.pmod(F.col("id"), F.lit(500)).alias("k")
    ).cache()
    uni_b = spark.range(20_000).select(
        F.col("id"), F.pmod(F.col("id") * 3, F.lit(500)).alias("k")
    ).cache()
    d = choose_join_strategy(
        uni_a, "k", uni_b, "k", broadcast_rows=100, shuffle_partitions=32
    )
    assert d["strategy"] == "plain" and "AQE" in d["reason"]
    # both sides big AND both skewed on the same hot key: salting would
    # replicate a large side — advisor declines, names the fallback
    hot_a = spark.range(30_000).select(
        F.col("id"), F.lit(1).alias("k")
    ).cache()
    hot_b = spark.range(25_000).select(
        F.col("id"), F.lit(1).alias("k")
    ).cache()
    d2 = choose_join_strategy(
        hot_a, "k", hot_b, "k", broadcast_rows=100, shuffle_partitions=32
    )
    assert d2["strategy"] == "plain" and "skew" in d2["reason"]


def test_advisor_untrusted_when_slack_swallows_estimate(spark, sides):
    from argostats_spark.operators.joinsize import choose_join_strategy

    dfa, dfb, _ = sides
    # eps so coarse the one-sided bound admits true ~ 0
    d = choose_join_strategy(
        dfa, "k", dfb, "k", broadcast_rows=1, eps=0.9, confidence=0.5
    )
    assert d["trusted"] is False
    assert d["upper_slack"] >= d["est"]


def test_apply_rejects_b_side_salt_with_right_and_full_join(spark, sides):
    """right/full stay rejected (the salted side's unmatched rows are
    genuinely not preserved); left is now expressible (VERDICT r12
    item 6 — see the property test below)."""
    from argostats_spark.operators.joinsize import apply_join_strategy

    dfa, dfb, _ = sides
    fake = {"strategy": "salted", "salt_side": "b", "n_salts": 4}
    for how in ("right", "full"):
        with pytest.raises(ValueError, match="inner.*left"):
            apply_join_strategy(dfa, dfb, ["k"], fake, how=how)
    with pytest.raises(ValueError, match="unknown strategy"):
        apply_join_strategy(dfa, dfb, ["k"], {"strategy": "bogus"})


def test_apply_b_side_salt_left_join_matches_plain(spark):
    """VERDICT r12 item 6: b-side salt + how='left' via a-side
    reframing must be row-for-row identical to the plain left join on
    a skewed fixture — multiplicities, unmatched-left rows (including
    NULL-key rows), duplicate a rows, and column order."""
    from argostats_spark.operators.joinsize import apply_join_strategy

    # a: matched keys, never-matched keys, a NULL key, and a literal
    # duplicate row; b: skewed on k=7 (most rows one key) plus keys a
    # doesn't have
    a_rows = (
        [(7, f"hot{i}") for i in range(5)]
        + [(1, "one"), (2, "two"), (99, "lonely"), (None, "nullk"),
           (2, "two")]
    )
    dfa = spark.createDataFrame(a_rows, "k long, a_val string")
    b_rows = [(7, float(i)) for i in range(2000)] + [
        (1, -1.0), (1, -2.0), (55, -3.0)
    ]
    dfb = spark.createDataFrame(b_rows, "k long, b_val double")
    dec = {"strategy": "salted", "salt_side": "b", "n_salts": 8}
    out = apply_join_strategy(dfa, dfb, ["k"], dec, how="left")
    plain = dfa.join(dfb, ["k"], "left")
    assert out.columns == plain.columns
    key = lambda t: tuple((x is None, x) for x in t)
    assert sorted(map(tuple, out.collect()), key=key) == sorted(
        map(tuple, plain.collect()), key=key
    )
    # the executed matched branch IS salted (not a plain re-join)
    assert "__argostats_salt" in _plan(out)


def test_apply_b_side_salt_preserves_column_order(spark):
    """Review finding r12: the b-side salt swaps operands internally;
    the output must still match dfa.join(dfb, on) column ORDER (and
    rows), and ambiguous non-key names must raise, not mis-select."""
    from argostats_spark.operators.joinsize import apply_join_strategy

    dfa = spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, a_val string"
    )
    dfb = spark.createDataFrame(
        [(1, 10.0), (1, 11.0)], "k long, b_val double"
    )
    dec = {"strategy": "salted", "salt_side": "b", "n_salts": 4}
    out = apply_join_strategy(dfa, dfb, ["k"], dec)
    plain = dfa.join(dfb, ["k"])
    assert out.columns == plain.columns
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )
    dup = spark.createDataFrame([(1, "z")], "k long, a_val string")
    with pytest.raises(ValueError, match="duplicate non-key"):
        apply_join_strategy(dfa, dup, ["k"], dec)


@pytest.mark.filterwarnings(
    # benign: py4j's callback threads change the recursion limit while
    # hypothesis runs; same artifact as the other Spark+hypothesis pins
    "ignore:The recursion limit will not be reset",
    "ignore::pytest.PytestUnraisableExceptionWarning",
)
def test_apply_b_side_salt_left_join_property_random(spark):
    """Hypothesis pin for the left-salt reframing: random key
    multisets on both sides (NULLs, duplicates, disjoint keys, empty
    sides) and random n_salts must reproduce the plain left join
    exactly — rows, multiplicities, column order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from argostats_spark.operators.joinsize import apply_join_strategy

    keys = st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
        min_size=0, max_size=24,
    )

    @settings(max_examples=8, deadline=None)
    @given(a_keys=keys, b_keys=keys,
           n_salts=st.integers(min_value=1, max_value=9))
    def check(a_keys, b_keys, n_salts):
        dfa = spark.createDataFrame(
            [(k, i) for i, k in enumerate(a_keys)] or [(None, -1)],
            "k long, a_val long",
        )
        dfb = spark.createDataFrame(
            [(k, float(i)) for i, k in enumerate(b_keys)] or [(None, -1.0)],
            "k long, b_val double",
        )
        dec = {"strategy": "salted", "salt_side": "b", "n_salts": n_salts}
        out = apply_join_strategy(dfa, dfb, ["k"], dec, how="left")
        plain = dfa.join(dfb, ["k"], "left")
        assert out.columns == plain.columns
        norm = lambda t: tuple((x is None, x) for x in t)
        assert sorted(map(tuple, out.collect()), key=norm) == sorted(
            map(tuple, plain.collect()), key=norm
        )

    check()


def test_sketch_store_roundtrip_and_reuse(spark, sides, tmp_path):
    """VERDICT r13 item 4: SketchStore persists a key sketch keyed by
    (table, column, fingerprint); a warm get_or_build runs ZERO Spark
    jobs and returns byte-identical sketch bytes; choose_join_strategy
    fed the cached sketches reproduces the scan-path decision exactly;
    geometry mismatches and fingerprint bumps miss (never a wrong
    hit)."""
    from argostats_spark.operators.joinsize import (
        SketchStore,
        choose_join_strategy,
        key_sketch,
    )

    dfa, dfb, _ = sides
    store = SketchStore(str(tmp_path / "sketches"))
    cold = store.get_or_build(dfa, "k", "ta", "fp1")
    assert cold == key_sketch(dfa, "k")  # deterministic build, saved
    # warm path: byte-identical AND zero jobs
    sc = spark.sparkContext
    sc.setJobGroup("sketch_warm", "warm get_or_build")
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup("sketch_warm"))
    warm = store.get_or_build(dfa, "k", "ta", "fp1")
    after = set(tracker.getJobIdsForGroup("sketch_warm"))
    sc.setJobGroup(None, None)
    assert warm == cold
    assert before == after, "warm sketch load ran a Spark job"
    # cached sketches drive the advisor to the identical decision
    skb = store.get_or_build(dfb, "k", "tb", "fp1")
    from_scan = choose_join_strategy(dfa, "k", dfb, "k",
                                     broadcast_rows=500)
    from_cache = choose_join_strategy(
        dfa, "k", dfb, "k", broadcast_rows=500,
        sketch_a=warm, sketch_b=skb,
    )
    assert from_cache == from_scan
    # staleness contract: a new fingerprint misses (rebuilds)...
    assert store.get("ta", "k", "fp2", 0.001, 0.99, 42) is None
    # ...and other geometry params miss rather than mix
    assert store.get("ta", "k", "fp1", 0.01, 0.99, 42) is None
    assert store.get("ta", "k", "fp1", 0.001, 0.99, 7) is None


def test_apply_b_side_salt_left_join_reuses_a_exchange(spark):
    """VERDICT r13 item 2: the left-salt reframing computes `flagged`
    (a ⋈ b's distinct keys) twice — matched + unmatched filter
    branches — relying on AQE exchange reuse to evaluate the a-side
    subplan ONCE. Pin that the reuse actually happens in the executed
    plan: both the a-side exchange and the b-keys exchange must show
    up as ReusedExchange in the final adaptive plan, and the a-side
    scan must appear exactly once in the final plan. If a Spark
    upgrade breaks reuse here, the path silently doubles a
    corpus-sized join — this test turns that into a loud failure.
    (The reuse is also what makes the two branches read ONE evaluation
    of dfa, which the determinism note in apply_join_strategy's
    docstring leans on.)"""
    from argostats_spark.operators.joinsize import apply_join_strategy

    # Broadcast would elide the a-side exchange entirely (nothing to
    # reuse); force shuffle joins so the reuse path is what executes —
    # which is also the only shape that exists at corpus scale.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dfa = spark.range(0, 7777).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("a_val")
        )
        dfb = spark.range(0, 5000).select(
            (F.col("id") % 3000).alias("k"),
            (F.col("id") * 2).alias("b_val"),
        )
        dec = {"strategy": "salted", "salt_side": "b", "n_salts": 4}
        out = apply_join_strategy(dfa, dfb, ["k"], dec, how="left")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # a-side exchange reused by the unmatched branch, b-keys
        # exchange reused by its second consumer
        assert final.count("ReusedExchange") >= 2, final
        # the distinctive a-side scan is evaluated exactly once
        assert final.count("Range (0, 7777") == 1, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_choose_strategy_record_shape_is_fixed(spark, sides):
    """fair_share (and every documented key) is present on EVERY
    decision, including broadcast ones (review finding r12)."""
    from argostats_spark.operators.joinsize import choose_join_strategy

    dfa, dfb, _ = sides
    d = choose_join_strategy(dfa, "k", dfb, "k", broadcast_rows=500)
    assert d["strategy"] == "broadcast_b"
    for key in ("est", "upper_slack", "n_a", "n_b", "fmax_ub_a",
                "fmax_ub_b", "trusted", "salt_side", "n_salts",
                "fair_share", "reason"):
        assert key in d, key
