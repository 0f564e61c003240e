"""Mergeable aggregate state (operators/aggstate.py): the merge law
state(A) ⊎ state(B) == state(A ∪ B) must hold EXACTLY — any split,
any merge order, any partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.aggstate import (
    agg_state,
    finalize_state,
    merge_agg_states,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"k{i % 5}", float(((i * 7919) % 1000) - 500) / 7.0)
        for i in range(5000)
    ] + [(9000 + i, "k0", None) for i in range(10)]  # NULL values
    return spark.createDataFrame(rows, "id long, k string, v double").cache()


def _rows(df):
    return sorted(
        (r["k"], r["n"], r["n_overflow"], r["s"], r["sq"], r["mn"], r["mx"])
        for r in df.collect()
    )


def test_merge_law_exact_any_split(corpus):
    direct = agg_state(corpus, ["k"], "v")
    for mod in (2, 3, 7):
        parts = [
            agg_state(corpus.filter(F.col("id") % mod == r), ["k"], "v")
            for r in range(mod)
        ]
        merged = merge_agg_states(["k"], *parts)
        assert _rows(merged) == _rows(direct), f"split mod {mod}"
    # merge order must not matter either
    a, b, c = (
        agg_state(corpus.filter(F.col("id") % 3 == r), ["k"], "v")
        for r in range(3)
    )
    m1 = merge_agg_states(["k"], a, b, c)
    m2 = merge_agg_states(["k"], merge_agg_states(["k"], c, a), b)
    assert _rows(m1) == _rows(m2) == _rows(direct)


def test_finalize_matches_direct_aggregates(corpus):
    got = {
        r["k"]: (r["n"], r["mean"], r["var"])
        for r in finalize_state(agg_state(corpus, ["k"], "v")).collect()
    }
    want = {
        r["k"]: (r["n"], r["mean"], r["var"])
        for r in corpus.groupBy("k").agg(
            F.count("v").alias("n"),
            F.avg("v").alias("mean"),
            F.var_pop("v").alias("var"),
        ).collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
        assert got[k][2] == pytest.approx(want[k][2], rel=1e-9)
    # NULL values never entered the state: k0 count is the non-null one
    assert got["k0"][0] == corpus.filter("k = 'k0' AND v IS NOT NULL").count()


def test_merge_validation_and_constant_group(spark):
    df = spark.createDataFrame([(1, "a", 2.5), (2, "a", 2.5)],
                               "id long, k string, v double")
    st = finalize_state(agg_state(df, ["k"], "v")).first()
    assert st["var"] == 0.0  # clamp kills the negative residue
    with pytest.raises(ValueError, match="no states"):
        merge_agg_states(["k"])


def test_overflowing_values_are_loud_not_silent(spark):
    from argostats_spark.operators.aggstate import agg_state

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 1e15), (3, "a", 3.0)],
        "id long, k string, v double",
    )
    st = agg_state(df, ["k"], "v").first()
    # the 1e15 value cannot fit decimal(28,14): it is EXCLUDED from the
    # sums and REPORTED, never silently blended into a wrong mean
    assert st["n"] == 3 and st["n_overflow"] == 1
    assert float(st["s"]) == 5.0


def test_merged_totals_past_1e14_stay_exact(spark):
    """ADVICE r8: the merge must NOT narrow s back to decimal(28,14) —
    snapshots each under the per-value 10^14 bound can still merge to a
    total past it, and that total must come through exact (the
    multi-snapshot 100TB regime), not NULL/throw."""
    big = 9.0e13  # fits decimal(28,14) per value
    dfs = [
        spark.createDataFrame([(i, "a", big)], "id long, k string, v double")
        for i in range(3)
    ]
    states = [agg_state(d, ["k"], "v") for d in dfs]
    merged = merge_agg_states(["k"], *states)
    row = merged.first()
    assert row["n_overflow"] == 0
    assert row["s"] is not None and float(row["s"]) == 2.7e14
    # schema contract: merge output types == agg_state output types, so
    # re-merging a merged state is schema-stable
    assert dict(merged.dtypes)["s"] == dict(states[0].dtypes)["s"]
    assert dict(merged.dtypes)["sq"] == dict(states[0].dtypes)["sq"]


def test_distinct_state_merge_law(spark, corpus):
    """HLL distinct state: union of split-sketches == whole-corpus
    sketch (same estimate), independent of split/merge order and
    partitioning; estimate within 5% of exact."""
    from argostats_spark.operators.aggstate import (
        distinct_state,
        finalize_distinct,
        merge_distinct_states,
    )

    whole = {
        r["k"]: (r["n_distinct_est"], r["n"])
        for r in finalize_distinct(
            distinct_state(corpus, ["k"], "v")
        ).collect()
    }
    for mod in (2, 5):
        parts = [
            distinct_state(corpus.filter(F.col("id") % mod == r), ["k"], "v")
            for r in range(mod)
        ]
        merged = {
            r["k"]: (r["n_distinct_est"], r["n"])
            for r in finalize_distinct(
                merge_distinct_states(["k"], *parts)
            ).collect()
        }
        assert merged == whole, f"split mod {mod}"
    shuf = {
        r["k"]: (r["n_distinct_est"], r["n"])
        for r in finalize_distinct(
            distinct_state(corpus.repartition(17), ["k"], "v")
        ).collect()
    }
    assert shuf == whole
    exact = {
        r["k"]: r["d"]
        for r in corpus.groupBy("k").agg(
            F.countDistinct("v").alias("d")
        ).collect()
    }
    for k, (est, _) in whole.items():
        assert abs(est - exact[k]) <= 0.05 * exact[k] + 1, (k, est, exact[k])
    with pytest.raises(ValueError, match="no states"):
        merge_distinct_states(["k"])


def test_topk_state_merge_bounds_and_guarantees(spark):
    """Misra-Gries/SpaceSaving merge (Agarwal et al. 2013): for every
    value the merged interval [est, est+err] must contain the true
    global count, est must be exact for values every shard kept, and
    any value with true count > sum-of-shard-bounds must survive the
    merge. Zipf-ish data split adversarially (round-robin AND by-value
    skewed) so shards disagree about the tail."""
    import random

    from argostats_spark.operators.aggstate import (
        merge_topk_states,
        topk_state,
    )

    rng = random.Random(11)
    # zipf-ish: value j appears ~ 3000/j times, two key groups
    rows = []
    i = 0
    for g in ("a", "b"):
        for j in range(1, 40):
            for _ in range(1200 // j):
                rows.append((i, g, f"v{j:02d}"))
                i += 1
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, g string, v string").cache()
    true = {
        (r["g"], r["v"]): r["c"]
        for r in df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c")).collect()
    }

    for splitter in (
        lambda r: F.col("id") % 3,                       # round-robin
        lambda r: F.pmod(F.xxhash64("v"), F.lit(3)),     # by-value (skewed)
    ):
        shards = [df.filter(splitter(None) == s) for s in range(3)]
        states = [topk_state(s, ["g"], "v", k_state=15) for s in shards]
        bounds = {}
        for st in states:
            for r in st.select("g", "bound").distinct().collect():
                bounds[r["g"]] = bounds.get(r["g"], 0) + r["bound"]
        merged = merge_topk_states(["g"], *states).collect()
        seen = set()
        for r in merged:
            key = (r["g"], r["v"])
            seen.add(key)
            t = true[key]
            assert r["est"] <= t <= r["est"] + r["err"], (key, r, t)
        # guaranteed presence: true count above the total bound
        for key, t in true.items():
            if t > bounds[key[0]]:
                assert key in seen, (key, t, bounds)
    # exactness when nothing is dropped: k_state >= cardinality
    full = [topk_state(s, ["g"], "v", k_state=100)
            for s in (df.filter(F.col("id") % 2 == r) for r in range(2))]
    fm = merge_topk_states(["g"], *full).collect()
    assert all(r["err"] == 0 for r in fm)
    assert {(r["g"], r["v"]): r["est"] for r in fm} == true


def test_topk_state_k_cut_and_validation(spark):
    from argostats_spark.operators.aggstate import (
        merge_topk_states,
        topk_state,
    )

    df = spark.createDataFrame(
        [(i, "g", f"v{i % 7}") for i in range(700)] + [(999, "g", None)],
        "id long, g string, v string",
    )
    st = topk_state(df, ["g"], "v", k_state=5)
    assert st.count() == 5  # NULLs excluded, state truncated
    top3 = merge_topk_states(["g"], st, k=3).collect()
    assert len(top3) == 3
    with pytest.raises(ValueError, match="k_state"):
        topk_state(df, ["g"], "v", 0)
    with pytest.raises(ValueError, match="no states"):
        merge_topk_states(["g"])
    with pytest.raises(ValueError, match="k must"):
        merge_topk_states(["g"], st, k=0)


def test_topk_state_deterministic_under_repartition(spark):
    from argostats_spark.operators.aggstate import (
        merge_topk_states,
        topk_state,
    )

    df = spark.createDataFrame(
        [(i, "g", f"v{(i * 13) % 23}") for i in range(2000)],
        "id long, g string, v string",
    )
    a = sorted(map(tuple, merge_topk_states(
        ["g"], topk_state(df, ["g"], "v", 10), k=5).collect()))
    b = sorted(map(tuple, merge_topk_states(
        ["g"], topk_state(df.repartition(13), ["g"], "v", 10), k=5).collect()))
    assert a == b


def test_topk_state_null_key_group(spark):
    """Review finding (r9): NULL key groups must carry their bound and
    survive the merge — an equi-join on the keys would silently zero
    the bound (NULL != NULL) and then drop the group entirely."""
    from argostats_spark.operators.aggstate import (
        merge_topk_states,
        topk_state,
    )

    rows = []
    i = 0
    for g in ("a", None):
        for j in range(1, 10):
            for _ in range(40 // j):
                rows.append((i, g, f"v{j}")); i += 1
    df = spark.createDataFrame(rows, "id long, g string, v string").cache()
    true = {(r["g"], r["v"]): r["c"] for r in
            df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c")).collect()}
    states = [topk_state(df.filter(F.col("id") % 2 == r), ["g"], "v", 4)
              for r in range(2)]
    # the NULL group's state rows exist with a NONZERO bound (9 values
    # > k_state=4, so something was dropped)
    for st in states:
        nulls = [r for r in st.collect() if r["g"] is None]
        assert nulls and all(r["bound"] > 0 for r in nulls)
    merged = merge_topk_states(["g"], *states).collect()
    null_rows = {r["v"]: r for r in merged if r["g"] is None}
    assert null_rows, "NULL key group vanished from the merge"
    for v, r in null_rows.items():
        t = true[(None, v)]
        assert r["est"] <= t <= r["est"] + r["err"], (v, r, t)


# ---------------------------------------------------------------- round 12
# fold_topk_states — the re-mergeable top-K closure (VERDICT r11
# item 5): the family's last leg now composes shard → region → global.


def test_fold_topk_states_exactly_associative_without_truncation(spark):
    from argostats_spark.operators.aggstate import (
        fold_topk_states,
        topk_state,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", f"v{(i * 7) % 11}") for i in range(900)],
        "id long, g string, v string",
    ).cache()
    a, b, c = (
        topk_state(df.filter(F.col("id") % 3 == r), ["g"], "v", k_state=5)
        for r in range(3)
    )
    flat = sorted(map(tuple, fold_topk_states(["g"], a, b, c).collect()))
    nested = sorted(map(tuple, fold_topk_states(
        ["g"], fold_topk_states(["g"], a, b), c
    ).collect()))
    assert flat == nested  # exact associativity, no truncation
    with pytest.raises(ValueError, match="no states"):
        fold_topk_states(["g"])
    with pytest.raises(ValueError, match="k_state"):
        fold_topk_states(["g"], a, k_state=0)


def test_fold_topk_states_interval_law_every_level_property(spark):
    """The Misra-Gries invariant — kept v: c <= true <= c + bound;
    absent v: true <= bound; any v with true > bound is kept — must
    hold at EVERY level of a truncated 3-level hierarchy (4 shards ->
    2 regions -> global) AND for the flat truncated fold, on zipf-ish
    data split both round-robin and by-value. finalize_topk's (est,
    err) view carries the same interval."""
    from argostats_spark.operators.aggstate import (
        finalize_topk,
        fold_topk_states,
        topk_state,
    )

    rows = []
    i = 0
    for g in ("a", "b"):
        for j in range(1, 40):
            for _ in range(1200 // j):
                rows.append((i, g, f"v{j:02d}"))
                i += 1
    df = spark.createDataFrame(rows, "id long, g string, v string").cache()

    def truth_of(sub):
        return {
            (r["g"], r["v"]): r["c"]
            for r in sub.groupBy("g", "v").agg(
                F.count(F.lit(1)).alias("c")
            ).collect()
        }

    def check_state(state_rows, true):
        # a state's invariant is relative to the multiset it COVERS:
        # leaf vs its shard, region vs its shards' union, global/flat
        # vs the whole corpus
        seen = {}
        bound_of = {}
        for r in state_rows:
            seen[(r["g"], r["v"])] = (r["c"], r["bound"])
            bound_of[r["g"]] = r["bound"]
        for key, (c, bd) in seen.items():
            t = true[key]
            assert c <= t <= c + bd, (key, c, bd, t)
        for key, t in true.items():
            if key not in seen:
                assert t <= bound_of[key[0]], (key, t, bound_of)
        # heavy-hitter guarantee is the contrapositive of the absent
        # bound, checked explicitly:
        for key, t in true.items():
            if t > bound_of[key[0]]:
                assert key in seen, (key, t)

    global_true = truth_of(df)
    for splitter in (
        lambda: F.col("id") % 4,
        lambda: F.pmod(F.xxhash64("v"), F.lit(4)),
    ):
        shards = [df.filter(splitter() == s) for s in range(4)]
        leaves = [topk_state(s, ["g"], "v", k_state=10) for s in shards]
        for s, lf in zip(shards, leaves):
            check_state(lf.collect(), truth_of(s))
        # region level: truncated folds of shard pairs
        r1 = fold_topk_states(["g"], leaves[0], leaves[1], k_state=10)
        r2 = fold_topk_states(["g"], leaves[2], leaves[3], k_state=10)
        check_state(r1.collect(), truth_of(shards[0].unionAll(shards[1])))
        check_state(r2.collect(), truth_of(shards[2].unionAll(shards[3])))
        # global level, and the flat fold for comparison
        glob = fold_topk_states(["g"], r1, r2, k_state=10)
        check_state(glob.collect(), global_true)
        flat = fold_topk_states(["g"], *leaves, k_state=10)
        check_state(flat.collect(), global_true)
        # finalize view: same interval, top-k cut applies
        fin = finalize_topk(glob, ["g"], k=3).collect()
        assert len(fin) == 6  # 3 per key group
        for r in fin:
            t = global_true[(r["g"], r["v"])]
            assert r["est"] <= t <= r["est"] + r["err"]
    with pytest.raises(ValueError, match="k must"):
        finalize_topk(flat, ["g"], k=0)


def test_fold_topk_states_leaf_equivalence_and_null_keys(spark):
    """Folding ONE leaf state is the identity; NULL key groups ride
    through the fold's NULL-safe join and window bound-bump."""
    from argostats_spark.operators.aggstate import (
        fold_topk_states,
        topk_state,
    )

    rows = []
    i = 0
    for g in ("a", None):
        for j in range(1, 9):
            for _ in range(30 // j):
                rows.append((i, g, f"v{j}"))
                i += 1
    df = spark.createDataFrame(rows, "id long, g string, v string").cache()
    leaf = topk_state(df, ["g"], "v", k_state=4)
    nkey = lambda t: tuple((x is None, str(x)) for x in t)  # NULL-sortable
    assert sorted(map(tuple, fold_topk_states(["g"], leaf).collect()),
                  key=nkey) == sorted(map(tuple, leaf.collect()), key=nkey)
    halves = [topk_state(df.filter(F.col("id") % 2 == r), ["g"], "v", 4)
              for r in range(2)]
    folded = fold_topk_states(["g"], *halves, k_state=4).collect()
    nulls = [r for r in folded if r["g"] is None]
    assert nulls and all(r["bound"] > 0 for r in nulls)


def test_merge_topk_states_folded_inputs_leaf_false_interval_law(spark):
    """VERDICT r12 item 5: merge_topk_states(leaf=False) keeps the
    two-sided law est <= true <= est + err when its inputs are FOLDED
    states (whose c is a lower bound, not exact-within-shard). The
    default leaf=True per-value refinement subtracts present shards'
    bounds, which is only sound for leaf inputs — leaf=False keeps
    the full group bound instead."""
    from argostats_spark.operators.aggstate import (
        fold_topk_states,
        merge_topk_states,
        topk_state,
    )

    rows = []
    i = 0
    for g in ("a", "b"):
        for j in range(1, 30):
            for _ in range(900 // j):
                rows.append((i, g, f"v{j:02d}"))
                i += 1
    df = spark.createDataFrame(rows, "id long, g string, v string").cache()
    true = {
        (r["g"], r["v"]): r["c"]
        for r in df.groupBy("g", "v").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    shards = [df.filter(F.col("id") % 4 == s) for s in range(4)]
    leaves = [topk_state(s, ["g"], "v", k_state=8) for s in shards]
    # two truncated folded regions — their c is no longer exact
    r1 = fold_topk_states(["g"], leaves[0], leaves[1], k_state=8)
    r2 = fold_topk_states(["g"], leaves[2], leaves[3], k_state=8)
    safe = merge_topk_states(["g"], r1, r2, leaf=False).collect()
    assert safe
    for r in safe:
        t = true[(r["g"], r["v"])]
        assert r["est"] <= t <= r["est"] + r["err"], (dict(r.asDict()), t)
    # leaf=False is never tighter than leaf=True — it differs exactly
    # by the present shards' bounds it refuses to subtract
    tight = {
        (r["g"], r["v"]): r["err"]
        for r in merge_topk_states(["g"], r1, r2).collect()
    }
    assert all(
        r["err"] >= tight[(r["g"], r["v"])] for r in safe
    )
    # on LEAF inputs leaf=False also holds (just looser), so it is
    # the always-safe setting
    for r in merge_topk_states(["g"], *leaves, leaf=False).collect():
        t = true[(r["g"], r["v"])]
        assert r["est"] <= t <= r["est"] + r["err"]


def test_fold_topk_states_shard_col_equal_bounds(spark):
    """ADVICE r12: sub-shards carried in ONE frame with EQUAL bounds
    collapse in the group-bound distinct unless shard_col= names the
    distinguishing column — with it, the fold is identical to passing
    the sub-shards as separate positional arguments."""
    from argostats_spark.operators.aggstate import (
        fold_topk_states,
        topk_state,
    )

    # two sub-shards engineered to the SAME per-group bound: identical
    # value distribution, ids offset
    rows = []
    for off, shard in ((0, 0), (10_000, 1)):
        i = off
        for j in range(1, 12):
            for _ in range(60 // j):
                rows.append((i, shard, "a", f"v{j:02d}"))
                i += 1
    df = spark.createDataFrame(
        rows, "id long, shard int, g string, v string"
    ).cache()
    subs = [
        topk_state(df.filter(F.col("shard") == s), ["g"], "v", k_state=4)
        for s in range(2)
    ]
    bounds = [s.select("bound").distinct().collect() for s in subs]
    assert bounds[0] == bounds[1] and bounds[0][0]["bound"] > 0
    one_frame = subs[0].withColumn("shard", F.lit(0)).unionByName(
        subs[1].withColumn("shard", F.lit(1))
    )
    want = sorted(map(tuple, fold_topk_states(["g"], *subs).collect()))
    got = sorted(map(tuple, fold_topk_states(
        ["g"], one_frame, shard_col="shard"
    ).collect()))
    assert got == want
    # the documented hazard, demonstrated: WITHOUT shard_col the equal
    # bounds collapse and B is undercounted by one shard's bound
    collapsed = fold_topk_states(["g"], one_frame).collect()
    assert all(
        r["bound"] == bounds[0][0]["bound"] for r in collapsed
    )  # undercounted: should be 2x
    assert all(r[-1] == 2 * bounds[0][0]["bound"] for r in got)


@pytest.mark.filterwarnings(
    "ignore:The recursion limit will not be reset",
    "ignore::pytest.PytestUnraisableExceptionWarning",
)
def test_fold_topk_states_shard_col_equals_positional_property(spark):
    """Hypothesis pin: for ANY split of a corpus into sub-shards —
    including splits that yield equal bounds, empty sub-shards, and
    skewed value distributions — folding one unioned frame with
    shard_col= equals folding the sub-shards as positional arguments,
    truncated and untruncated."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from argostats_spark.operators.aggstate import (
        fold_topk_states,
        topk_state,
    )

    # 3 examples (round 15, driver-pytest budget): each example runs
    # two full fold hierarchies; the equal-bounds/empty-shard/skew
    # cases hypothesis targets appear within 3
    @settings(max_examples=3, deadline=None)
    @given(
        vals=st.lists(st.integers(min_value=0, max_value=9),
                      min_size=4, max_size=60),
        n_shards=st.integers(min_value=2, max_value=4),
        k_state=st.one_of(st.none(), st.integers(min_value=1, max_value=4)),
    )
    def check(vals, n_shards, k_state):
        df = spark.createDataFrame(
            [(i, "g", f"v{v}") for i, v in enumerate(vals)],
            "id long, g string, v string",
        )
        subs = [
            topk_state(df.filter(F.col("id") % n_shards == s),
                       ["g"], "v", k_state=3)
            for s in range(n_shards)
        ]
        one = None
        for s, sub in enumerate(subs):
            piece = sub.withColumn("sh", F.lit(s))
            one = piece if one is None else one.unionByName(piece)
        nkey = lambda t: tuple((x is None, str(x)) for x in t)
        want = sorted(map(tuple, fold_topk_states(
            ["g"], *subs, k_state=k_state).collect()), key=nkey)
        got = sorted(map(tuple, fold_topk_states(
            ["g"], one, k_state=k_state, shard_col="sh").collect()),
            key=nkey)
        assert got == want

    check()


# ---------------------------------------------------------------- round 11
# quantile_state (KLL) and sample_state (bottom-k) — the fourth and
# fifth mergeable-summary legs.


def test_quantile_state_merge_law_and_accuracy(spark, corpus):
    from argostats_spark.operators.aggstate import (
        finalize_quantiles,
        merge_quantile_states,
        quantile_state,
    )

    parts = [
        quantile_state(corpus.filter(F.col("id") % 3 == r), ["k"], "v")
        for r in range(3)
    ]
    merged = finalize_quantiles(
        merge_quantile_states(["k"], *parts), [0.25, 0.5, 0.75]
    )
    exact = corpus.groupBy("k").agg(
        F.count("v").alias("n_exact"),
        F.expr("percentile(v, array(0.25d, 0.5d, 0.75d))").alias("ex"),
    )
    got = {r["k"]: r for r in merged.join(exact, "k").collect()}
    assert len(got) == 5
    for k, r in got.items():
        assert r["n"] == r["n_exact"], k
        vals = sorted(
            x["v"] for x in corpus.filter(F.col("k") == k)
            .filter(F.col("v").isNotNull()).collect()
        )
        n = len(vals)
        for q, est in ((0.25, r["q25"]), (0.5, r["q50"]), (0.75, r["q75"])):
            # rank-error guarantee: the estimate's exact normalized
            # rank is within 3x the published ~1.65% bound at k=200
            rank = sum(1 for x in vals if x <= est) / n
            assert abs(rank - q) <= 0.05, (k, q, est, rank)
            # KLL returns retained items — the estimate is a value
            # actually present in the group
            assert est in vals, (k, q, est)


def test_quantile_state_empty_group_and_validation(spark):
    from argostats_spark.operators.aggstate import (
        finalize_quantiles,
        merge_quantile_states,
        quantile_state,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None)], "k string, v double"
    )
    fin = finalize_quantiles(
        quantile_state(df, ["k"], "v"), [0.5]
    )
    got = {r["k"]: (r["n"], r["q50"]) for r in fin.collect()}
    assert got["a"][0] == 2 and got["a"][1] in (1.0, 2.0)
    assert got["b"] == (0, None)  # all-NULL group finalizes to NULL
    with pytest.raises(ValueError, match="no states"):
        merge_quantile_states(["k"])


def _sample_rows(df):
    return sorted(
        (r["k"], r["rnk"], r["pri"], r["tb"], r["v"], r["n"])
        for r in df.collect()
    )


def test_sample_state_merge_law_exact(spark, corpus):
    from argostats_spark.operators.aggstate import (
        merge_sample_states,
        sample_state,
    )

    direct = sample_state(corpus, ["k"], "v", ["id"], k=7, hash_family="md5")
    for mod in (2, 3):
        parts = [
            sample_state(
                corpus.filter(F.col("id") % mod == r), ["k"], "v", ["id"],
                k=7, hash_family="md5",
            )
            for r in range(mod)
        ]
        merged = merge_sample_states(["k"], *parts, k=7)
        assert _sample_rows(merged) == _sample_rows(direct), f"mod {mod}"
    # re-mergeable: merge of merges == direct (bottom-k is closed)
    a, b, c = (
        sample_state(
            corpus.filter(F.col("id") % 3 == r), ["k"], "v", ["id"], k=7,
            hash_family="md5",
        )
        for r in range(3)
    )
    m2 = merge_sample_states(
        ["k"], merge_sample_states(["k"], c, a, k=7), b, k=7
    )
    assert _sample_rows(m2) == _sample_rows(direct)


def test_sample_state_is_bottom_k_by_content_hash(spark):
    from argostats_spark.operators.aggstate import (
        _sample_preimage,
        _sample_priority,
        sample_state,
    )

    df = spark.createDataFrame(
        [(i, "g", float(i * 13 % 101)) for i in range(500)],
        "id long, k string, v double",
    )
    got = sample_state(df, ["k"], "v", ["id"], k=5, hash_family="md5")
    # independent mirror: full priority table, k smallest
    full = (
        df.withColumn("__tb", _sample_preimage(["id"], "v"))
        .withColumn("__p", _sample_priority(F.col("__tb"), "md5"))
        .orderBy("__p")
        .limit(5)
        .collect()
    )
    want = sorted((r["__p"], r["v"]) for r in full)
    assert sorted((r["pri"], r["v"]) for r in got.collect()) == want
    ns = {r["n"] for r in got.collect()}
    assert ns == {500}


def test_sample_state_deficiency_guard_is_loud(spark):
    from argostats_spark.operators import aggstate as A

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1000)],
        "id long, k string, v double",
    )
    # force a hopeless threshold: safety such that expected survivors
    # ~0 — monkeypatch the priority space down so the filter keeps
    # nothing (the binomial tail the guard exists for)
    orig = A._PRIORITY_SPACE
    try:
        A._PRIORITY_SPACE = 1  # thresh -> ~0, every row filtered out
        with pytest.raises(ValueError, match="raise safety"):
            # md5 priorities ignore _PRIORITY_SPACE (fixed 48-bit
            # prefix), so shrinking the space starves the threshold —
            # the total-wipeout shape the guard exists for
            A.sample_state(df, ["k"], "v", ["id"], k=5, hash_family="md5")
    finally:
        A._PRIORITY_SPACE = orig


def test_sample_state_small_groups_and_validation(spark):
    from argostats_spark.operators.aggstate import (
        merge_sample_states,
        sample_state,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", None)],
        "id long, k string, v double",
    )
    got = sample_state(df, ["k"], "v", ["id"], k=10)
    rows = got.collect()
    # group 'a' has 2 rows (< k) — keep all; 'b' all-NULL — absent
    assert sorted(r["v"] for r in rows) == [1.0, 2.0]
    assert {r["k"] for r in rows} == {"a"}
    with pytest.raises(ValueError, match=">= 1"):
        sample_state(df, ["k"], "v", ["id"], k=0)
    with pytest.raises(ValueError, match="no states"):
        merge_sample_states(["k"], k=3)


def test_merge_sample_states_rejects_truncated_shards(spark):
    """ADVICE r11: merging a shard built with smaller k (a compacted
    kind='sample' store at k=3 later read at k=5) must raise, not
    silently return rows beyond the shard's retained rank — those are
    not a uniform bottom-k sample. Detection is from the carried
    columns alone: max(rnk) < merge-k while n > max(rnk)."""
    import pytest

    from argostats_spark.operators.aggstate import (
        merge_sample_states,
        sample_state,
    )

    df = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(20)], "id long, k string, v double"
    )
    small = sample_state(df, ["k"], "v", ["id"], k=3)
    big = sample_state(df, ["k"], "v", ["id"], k=5)
    with pytest.raises(ValueError, match="truncated below k=5"):
        merge_sample_states(["k"], small, big, k=5)
    # merging DOWN is always exact; validate passes on full shards
    down = merge_sample_states(["k"], small, big, k=3).collect()
    assert [r["rnk"] for r in sorted(down, key=lambda r: r["rnk"])] == [1, 2, 3]
    # a shard that kept ALL rows of a small group (n <= its k) is not
    # truncated even when max(rnk) < merge-k: exactness holds
    tiny = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0)], "id long, k string, v double"
    )
    full2 = sample_state(tiny, ["k"], "v", ["id"], k=2)
    merged = merge_sample_states(["k"], full2, k=5).collect()
    assert len(merged) == 2
    # validate=False is the documented provenance-known opt-out: the
    # truncated merge goes through (caller's responsibility)
    assert (
        merge_sample_states(["k"], small, big, k=5, validate=False).count()
        == 5
    )


def test_sample_state_validate_false_is_lazy_and_identical(spark):
    """ADVICE r11: validate=False must skip the eager deficiency-guard
    jobs (lazy-builder convention) and return the identical state."""
    from argostats_spark.operators.aggstate import sample_state

    df = spark.createDataFrame(
        [(i, "g", float(i % 7)) for i in range(50)],
        "id long, k string, v double",
    )
    spark.sparkContext.setJobGroup("lazy_probe", "sample_state lazy check")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup("lazy_probe"))
    lazy = sample_state(df, ["k"], "v", ["id"], k=4, validate=False)
    after = set(tracker.getJobIdsForGroup("lazy_probe"))
    spark.sparkContext.setJobGroup(None, None)
    assert before == after  # no Spark job ran at build time
    eager = sample_state(df, ["k"], "v", ["id"], k=4)
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, eager.collect())
    )


def test_full_state_equals_individual_builders(spark, corpus):
    from argostats_spark.operators.aggstate import (
        agg_state,
        distinct_state,
        finalize_distinct,
        finalize_quantiles,
        finalize_state,
        full_state,
        merge_full_states,
    )

    fused = full_state(corpus, ["k"], "v")
    # agg columns bit-equal to agg_state
    a = sorted(
        (r["k"], r["n"], r["n_overflow"], r["s"], r["sq"], r["mn"], r["mx"])
        for r in fused.collect()
    )
    assert a == _rows(agg_state(corpus, ["k"], "v"))
    # distinct estimate equal to distinct_state's (HLL is
    # order-independent, so the sketches agree)
    de = {
        r["k"]: r["n_distinct_est"]
        for r in finalize_distinct(fused).collect()
    }
    want_de = {
        r["k"]: r["n_distinct_est"]
        for r in finalize_distinct(
            distinct_state(corpus, ["k"], "v")
        ).collect()
    }
    assert de == want_de
    # quantile estimates hold the rank bound (sketch bits may differ
    # from a separately-built sketch; the bound is the contract)
    per_key = {}
    for r in corpus.filter(F.col("v").isNotNull()).collect():
        per_key.setdefault(r["k"], []).append(r["v"])
    for r in finalize_quantiles(fused, [0.5]).collect():
        vals = sorted(per_key[r["k"]])
        rank = sum(1 for x in vals if x <= r["q50"]) / len(vals)
        assert abs(rank - 0.5) <= 0.05
    # merge law: fused states over thirds merge to the direct build
    parts = [
        full_state(corpus.filter(F.col("id") % 3 == r), ["k"], "v")
        for r in range(3)
    ]
    merged = merge_full_states(["k"], *parts)
    m = sorted(
        (r["k"], r["n"], r["n_overflow"], r["s"], r["sq"], r["mn"], r["mx"])
        for r in merged.collect()
    )
    assert m == a  # exact families: bit-equal under merge
    mde = {
        r["k"]: r["n_distinct_est"]
        for r in finalize_distinct(merged).collect()
    }
    assert mde == want_de  # HLL merge law
    for r in finalize_quantiles(merged, [0.5]).collect():
        vals = sorted(per_key[r["k"]])
        rank = sum(1 for x in vals if x <= r["q50"]) / len(vals)
        assert abs(rank - 0.5) <= 0.05  # KLL merge keeps the bound
    # finalize_state works on the fused frame directly
    fs = {r["k"]: r["mean"] for r in finalize_state(merged).collect()}
    want_fs = {
        r["k"]: r["mean"]
        for r in finalize_state(agg_state(corpus, ["k"], "v")).collect()
    }
    assert fs == want_fs
    with pytest.raises(ValueError, match="no states"):
        merge_full_states(["k"])


def test_sample_state_property_random_splits(spark):
    """Hypothesis pin for the bottom-k merge law: random keyed value
    multisets, random k, random split arity — the merged shard states
    must equal the direct build EXACTLY, and both must equal a pure-
    Python bottom-k mirror over md5 priorities."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from argostats_spark.operators.aggstate import (
        merge_sample_states,
        sample_state,
    )

    def py_priority(idv: int, v: int) -> tuple[int, str]:
        parts = []
        for x in (idv, v):
            s = str(x)
            parts += [str(len(s)), "|", s, "|", "0", "|"]
        tb = "".join(parts)
        return int(hashlib.md5(tb.encode()).hexdigest()[:12], 16), tb

    # 5 examples (round 15, driver-pytest budget): each example is
    # ~6 s of tiny sequential Spark jobs; 5 still covers the
    # split-arity x k x duplicate-value space the law needs
    @settings(max_examples=5, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=-50, max_value=50),
            ),
            min_size=1, max_size=60,
        ),
        k=st.integers(min_value=1, max_value=6),
        mod=st.sampled_from([2, 3]),
    )
    def check(rows, k, mod):
        # unique ids per row; value as long (cross-engine repr-safe)
        data = [(i, kk, v) for i, (kk, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, k string, v long")
        direct = sorted(
            (r["k"], r["rnk"], r["pri"], r["tb"], r["v"], r["n"])
            for r in sample_state(
                df, ["k"], "v", ["id"], k=k, hash_family="md5"
            ).collect()
        )
        parts = [
            sample_state(
                df.filter(F.col("id") % mod == r), ["k"], "v", ["id"], k=k,
                hash_family="md5",
            )
            for r in range(mod)
        ]
        merged = sorted(
            (r["k"], r["rnk"], r["pri"], r["tb"], r["v"], r["n"])
            for r in merge_sample_states(["k"], *parts, k=k).collect()
        )
        assert merged == direct
        # pure-Python mirror
        want = []
        per_key: dict[str, list] = {}
        for i, kk, v in data:
            pri, tb = py_priority(i, v)
            per_key.setdefault(kk, []).append((pri, tb, v))
        for kk, items in per_key.items():
            items.sort()
            for rnk, (pri, tb, v) in enumerate(items[:k], start=1):
                want.append((kk, rnk, pri, tb, v, len(items)))
        assert sorted(want) == direct

    check()


def test_full_state_plan_single_scan(spark, tmp_path):
    """The fusion's reason to exist: building all three summary
    families costs ONE source scan (plus two state-table-sized
    exchanges), column-pruned to the key/value columns."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, f"k{i % 3}", float(i)) for i in range(100)],
        "id long, k string, v double",
    ).write.parquet(p)
    from argostats_spark.operators.aggstate import (
        full_state,
        merge_full_states,
    )

    df = spark.read.parquet(p)
    tagged = df.withColumn("__half", F.col("id") % 2)
    fused = merge_full_states(
        ["k"], full_state(tagged, ["__half", "k"], "v")
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 2
    # column pruning reached the scan: the untouched wide column would
    # appear in ReadSchema otherwise
    import re

    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "v#" in scan_line or "v," in scan_line or "v]" in scan_line


def test_full_state_null_sketch_shards_merge_gracefully(spark):
    """A shard whose group had only NULL values carries NULL hll/kll
    sketches; merging must skip them (SQL aggregate semantics), not
    throw — and two all-NULL shards finalize to (n=0, est=0, None)."""
    from argostats_spark.operators.aggstate import (
        finalize_distinct,
        finalize_quantiles,
        full_state,
        merge_full_states,
    )

    a = spark.createDataFrame([("k", None), ("k", None)], "k string, v double")
    b = spark.createDataFrame([("k", 1.0), ("k", 2.0)], "k string, v double")
    m = finalize_quantiles(
        finalize_distinct(
            merge_full_states(["k"], full_state(a, ["k"], "v"),
                              full_state(b, ["k"], "v"))
        ),
        [0.5],
    ).collect()[0]
    assert (m["n"], m["n_distinct_est"], m["q50"]) == (2, 2, 1.0)
    m2 = finalize_quantiles(
        finalize_distinct(
            merge_full_states(["k"], full_state(a, ["k"], "v"),
                              full_state(a, ["k"], "v"))
        ),
        [0.5],
    ).collect()[0]
    assert (m2["n"], m2["n_distinct_est"], m2["q50"]) == (0, 0, None)


def test_sample_state_merge_law_default_family(spark, corpus):
    """The xxhash64 production family must hold the same exact merge
    law (it's a content hash too — the law never depended on md5)."""
    from argostats_spark.operators.aggstate import (
        merge_sample_states,
        sample_state,
    )

    direct = _sample_rows(sample_state(corpus, ["k"], "v", ["id"], k=7))
    parts = [
        sample_state(corpus.filter(F.col("id") % 3 == r), ["k"], "v",
                     ["id"], k=7)
        for r in range(3)
    ]
    assert _sample_rows(merge_sample_states(["k"], *parts, k=7)) == direct
    with pytest.raises(ValueError, match="hash_family"):
        sample_state(corpus, ["k"], "v", ["id"], k=7, hash_family="sha9")


def test_sample_state_null_id_rows_are_sampled_not_dropped(spark):
    """Review finding (round 11): a NULL id column must hash like any
    other content — the pre-fix preimage concat NULLed, the priority
    NULLed, and the row silently vanished from the sample."""
    from argostats_spark.operators.aggstate import sample_state

    df = spark.createDataFrame(
        [(1, "g", 10.0), (None, "g", 20.0), (3, "g", 30.0)],
        "id long, k string, v double",
    )
    got = sample_state(df, ["k"], "v", ["id"], k=10)
    rows = got.collect()
    assert sorted(r["v"] for r in rows) == [10.0, 20.0, 30.0]
    ns = {r["n"] for r in rows}
    assert ns == {3}
    # NULL id and empty-string-like content stay distinct preimages
    tbs = {r["tb"] for r in rows}
    assert len(tbs) == 3


def test_finalize_quantiles_name_collision_is_loud(spark):
    from argostats_spark.operators.aggstate import (
        finalize_quantiles,
        quantile_state,
    )

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    st = quantile_state(df, ["k"], "v")
    with pytest.raises(ValueError, match="collide"):
        finalize_quantiles(st, [0.251, 0.254])
