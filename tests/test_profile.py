"""Column profiler (operators/profile.py): stat correctness against
hand-computed values, NULL semantics, approx path, and the drift diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.profile import profile_columns, profile_diff


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 10.0, "a"),
        (2, 20.0, "b"),
        (3, None, "b"),
        (4, 40.0, None),
        (5, 10.0, "c"),
    ]
    return spark.createDataFrame(rows, "id long, v double, s string").cache()


def _stats(df):
    return {
        (r["column"], r["stat"]): (r["sval"], r["nval"]) for r in df.collect()
    }


def test_profile_stats_exact(spark, frame):
    got = _stats(profile_columns(frame))
    assert got[("id", "n")] == (None, 5.0)
    assert got[("id", "n_null")] == (None, 0.0)
    assert got[("id", "n_distinct")] == (None, 5.0)
    assert got[("id", "min")] == (None, 1.0)
    assert got[("id", "max")] == (None, 5.0)
    assert got[("id", "mean")] == (None, 3.0)
    assert got[("v", "n")] == (None, 4.0)
    assert got[("v", "n_null")] == (None, 1.0)
    assert got[("v", "n_distinct")] == (None, 3.0)  # NULL not counted
    assert got[("v", "mean")] == (None, 20.0)       # NULL excluded
    assert got[("s", "n")] == (None, 4.0)
    assert got[("s", "n_null")] == (None, 1.0)
    assert got[("s", "n_distinct")] == (None, 3.0)
    assert got[("s", "min")] == ("a", None)
    assert got[("s", "max")] == ("c", None)
    assert ("s", "mean") not in got  # mean only for numeric columns


def test_profile_validation_and_approx(spark, frame):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(frame, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(frame, [])
    # HLL path: same stat rows, distincts close on tiny input
    approx = _stats(profile_columns(frame, exact_distinct=False))
    assert abs(approx[("id", "n_distinct")][1] - 5.0) <= 1.0
    # single aggregate job either way: one row pre-melt
    assert profile_columns(frame).count() == 6 + 6 + 5


def test_profile_diff_reports_only_drift(spark, frame):
    before = profile_columns(frame)
    after = profile_columns(
        frame.withColumn("v", F.when(F.col("id") == 4, 99.0).otherwise(F.col("v")))
    )
    d = profile_diff(before, after).collect()
    changed = {(r["column"], r["stat"]) for r in d}
    # only v's max/mean/n_distinct move (40 -> 99 keeps 3 distincts? no:
    # {10,20,99} is still 3 -> distinct unchanged; max & mean change)
    assert ("v", "max") in changed and ("v", "mean") in changed
    assert ("id", "n") not in changed and ("s", "min") not in changed
    # rel_tol swallows small numeric drift
    loose = profile_diff(before, after, rel_tol=10.0).collect()
    assert loose == []


# --- key_skew_report / equi_depth_histogram -------------------------------


def test_key_skew_report_finds_the_head(spark):
    from argostats_spark.operators.profile import key_skew_report

    rows = (
        [(i, "mega") for i in range(600)]
        + [(1000 + i, "hot") for i in range(300)]
        + [(2000 + i, f"t{i % 50}") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "id long, host string")
    rep = key_skew_report(df, "host", top=3).collect()
    assert [r["host"] for r in rep] == ["mega", "hot", "t0"]
    assert rep[0]["n_rows"] == 600 and rep[0]["rank"] == 1
    assert rep[0]["share"] == pytest.approx(0.6)
    assert rep[1]["cum_share"] == pytest.approx(0.9)
    with pytest.raises(ValueError, match="top"):
        key_skew_report(df, "host", top=0)


def test_equi_depth_histogram_equal_counts_any_distribution(spark):
    from argostats_spark.operators.profile import equi_depth_histogram

    # heavily skewed values: equi-WIDTH would put ~everything in one
    # bin; equi-depth must still balance
    rows = [(i, "a", float(min(i, 10))) for i in range(1000)] + [
        (5000 + i, "b", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = equi_depth_histogram(df, "v", 4, "id", by=["g"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    for g, n_tot in (("a", 1000), ("b", 100)):
        rows_g = sorted(by_g[g], key=lambda r: r["bucket"])
        assert [r["bucket"] for r in rows_g] == [0, 1, 2, 3]
        for r in rows_g:
            assert abs(r["n"] - n_tot / 4) <= 1
        # buckets tile the value order: lo/hi are non-decreasing
        for x, y in zip(rows_g, rows_g[1:]):
            assert x["hi"] <= y["lo"] or x["hi"] == y["lo"]
    # determinism under repartitioning (the key_col tie-break at work:
    # group 'a' is ~99% duplicate values)
    a = sorted(map(tuple, out))
    b = sorted(map(tuple,
                   equi_depth_histogram(df.repartition(13), "v", 4, "id",
                                        by=["g"]).collect()))
    assert a == b
    with pytest.raises(ValueError, match="k must"):
        equi_depth_histogram(df, "v", 0, "id")


def test_dataset_manifest_order_free_and_additive(spark, sf_dir):
    from argostats_spark.operators.profile import dataset_manifest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "g", F.col("doc_id") % 3
    ).cache()
    base = {r["g"]: (r["n_rows"], r["n_chars"], r["checksum"])
            for r in dataset_manifest(d, "g").collect()}
    # order/partitioning free
    shuf = {r["g"]: (r["n_rows"], r["n_chars"], r["checksum"])
            for r in dataset_manifest(d.repartition(13), "g").collect()}
    assert base == shuf
    # content-sensitive: one flipped char changes exactly that group
    mut = d.withColumn(
        "text",
        F.when(F.col("doc_id") == d.select(F.min("doc_id")).first()[0],
               F.concat(F.col("text"), F.lit("!"))).otherwise(F.col("text")),
    )
    mm = {r["g"]: r["checksum"] for r in dataset_manifest(mut, "g").collect()}
    changed = [g for g in base if mm[g] != base[g][2]]
    assert len(changed) == 1
    # additive: shard manifests sum (mod 2^48) to the union's manifest
    s0 = dataset_manifest(d.filter("doc_id % 2 = 0"), "g").collect()
    s1 = dataset_manifest(d.filter("doc_id % 2 = 1"), "g").collect()
    summed = {}
    for r in list(s0) + list(s1):
        n, c, k = summed.get(r["g"], (0, 0, 0))
        summed[r["g"]] = (n + r["n_rows"], c + r["n_chars"],
                          (k + r["checksum"]) % 2 ** 48)
    assert summed == base


def test_dataset_manifest_preimage_injective(spark):
    """ADVICE r8: with the old space-joined preimage, (id='a',
    text='b c') and (id='a b', text='c') hashed identically — a
    guaranteed (not 48-bit-collision) false equality. The
    length-prefixed encoding must separate them."""
    from argostats_spark.operators.profile import dataset_manifest

    a = spark.createDataFrame([("a", "b c", "g")],
                              "doc_id string, text string, g string")
    b = spark.createDataFrame([("a b", "c", "g")],
                              "doc_id string, text string, g string")
    ka = dataset_manifest(a, "g").first()["checksum"]
    kb = dataset_manifest(b, "g").first()["checksum"]
    assert ka != kb


def test_equi_depth_global_guard_and_approx_path(spark):
    """VERDICT r8 item 4: the exact global form must refuse to plan an
    unbounded single-partition sort (raising with the exact=False
    remedy named), and the approx path must bucket within one step of
    exact on duplicate-free data — with no Window in its plan."""
    import pytest as _pt

    from argostats_spark.operators.profile import equi_depth_histogram
    from argostats_spark.plans.explain import physical_plan

    rows = [(i, float((i * 7919) % 100003)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double").cache()

    with _pt.raises(ValueError, match="exact=False"):
        equi_depth_histogram(df, "v", 8, "id", max_global_rows=1000)

    exact = {r["bucket"]: (r["n"], r["lo"], r["hi"])
             for r in equi_depth_histogram(df, "v", 8, "id").collect()}
    ap = equi_depth_histogram(df, "v", 8, "id", exact=False)
    approx = {r["bucket"]: (r["n"], r["lo"], r["hi"]) for r in ap.collect()}
    assert "Window" not in physical_plan(ap)
    assert set(approx) == set(range(8))
    # distinct values + high accuracy: counts within 1% of n/k + 1
    for b in range(8):
        assert abs(approx[b][0] - 250) <= 250 * 0.01 + 1, (b, approx[b])
    assert exact[0][1] == approx[0][1] and exact[7][2] == approx[7][2]

    # grouped approx path: one row-local bucket per group, no window
    g = df.withColumn("g", (F.col("id") % 3).cast("string"))
    gp = equi_depth_histogram(g, "v", 4, "id", by=["g"], exact=False)
    assert "Window" not in physical_plan(gp)
    got = gp.collect()
    assert {r["g"] for r in got} == {"0", "1", "2"}
    for r in got:
        assert abs(r["n"] - 2000 / 3 / 4) <= 2000 / 3 / 4 * 0.05 + 2


def test_equi_depth_approx_keeps_null_by_group(spark):
    """Review finding (r9): the approx path must keep a NULL `by`
    group like the exact path does (a plain equi-join on the group
    key silently dropped it)."""
    from argostats_spark.operators.profile import equi_depth_histogram

    rows = [(i, None if i % 3 == 0 else f"g{i % 3}", float(i)) for i in range(900)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    exact_groups = {r["g"] for r in
                    equi_depth_histogram(df, "v", 4, "id", by=["g"]).collect()}
    approx_groups = {r["g"] for r in
                     equi_depth_histogram(df, "v", 4, "id", by=["g"],
                                          exact=False).collect()}
    assert None in exact_groups
    assert approx_groups == exact_groups
