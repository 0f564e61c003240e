"""Streaming mergeable-state maintenance (streaming/state.py): the
continuously-maintained state must equal a cold batch rebuild
BIT-EXACTLY (kind='agg', the decimal merge law) / estimate-exactly
(kind='distinct'), survive foreachBatch replay without double
counting, and compact atomically with readable retention.

The replay/compaction/publish tests run twice (VERDICT r9 item 3):
once on a plain local path (the os/shutil fast path) and once on a
``file://`` URI, which routes every store operation — listing, the
commit markers, the CURRENT-pointer OVERWRITE-rename, pruning —
through the Hadoop FileSystem API code path (fsio.HadoopFS), the same
calls an hdfs:///s3a:// store makes at 100 TB."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.aggstate import (
    agg_state,
    distinct_state,
    finalize_distinct,
)
from argostats_spark.streaming.state import (
    compact_state,
    read_state,
    state_increment_writer,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(params=["local", "file_uri"])
def mkstore(request, tmp_path):
    """(store_path_for_engine, plain_path_for_direct_os_asserts)."""
    def make(name):
        plain = str(tmp_path / name)
        if request.param == "file_uri":
            return "file://" + plain, plain
        return plain, plain
    return make


@pytest.fixture()
def feed(spark, tmp_path):
    """Three jsonl files → three micro-batches (maxFilesPerTrigger=1)."""
    d = tmp_path / "feed"
    d.mkdir()
    n = 0
    for part in range(3):
        lines = []
        for i in range(200):
            lines.append(json.dumps(
                {"id": n, "k": f"k{(n * 7) % 5}", "v": ((n * 13) % 97) / 3.0}
            ))
            n += 1
        p = d / f"part-{part:03d}.jsonl"
        p.write_text("\n".join(lines) + "\n")
        # FileStreamSource orders batches by modification time; files
        # written within the same millisecond tie and the order goes
        # nondeterministic (flaked the replay test: "batch 1" was
        # sometimes part-002). Pin mtimes seconds apart.
        os.utime(p, (1_700_000_000 + part, 1_700_000_000 + part))
    return str(d)


def _run_stream(spark, feed, store, ckpt, kind, **kw):
    stream = (
        spark.readStream.schema("id long, k string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
    )
    q = state_increment_writer(
        stream, ["k"], "v", store, ckpt, kind=kind, **kw
    )
    # loud on timeout: a still-running stream would otherwise race the
    # assertions below into a phantom state mismatch
    assert q.awaitTermination(180), "state stream did not terminate"
    return spark.read.schema("id long, k string, v double").json(feed)


def test_streamed_agg_state_equals_batch_rebuild(spark, feed, mkstore, tmp_path):
    (store, plain), ckpt = mkstore("store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "agg")
    got = read_state(spark, store, ["k"])
    want = agg_state(all_rows, ["k"], "v")
    assert _rows(got) == _rows(want)  # bit-exact: decimal merge law
    # three increments landed (one per file), each with its marker
    assert len(os.listdir(os.path.join(plain, "increments"))) == 3
    for d in os.listdir(os.path.join(plain, "increments")):
        assert os.path.exists(
            os.path.join(plain, "increments", d, "_STATE_COMMITTED")
        )


def test_replay_is_idempotent(spark, feed, mkstore, tmp_path):
    """Simulate foreachBatch at-least-once: re-writing a batch's own
    increment partition must leave the merged state unchanged."""
    (store, plain), ckpt = mkstore("store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "agg")
    before = _rows(read_state(spark, store, ["k"]))
    # replay batch 1: the same slice of the feed, written again
    batch1 = all_rows.filter((F.col("id") >= 200) & (F.col("id") < 400))
    agg_state(batch1, ["k"], "v").write.mode("overwrite").parquet(
        store + "/increments/b=1"
    )
    open(os.path.join(plain, "increments", "b=1", "_STATE_COMMITTED"),
         "w").write("1")
    assert _rows(read_state(spark, store, ["k"])) == before


def test_compaction_atomic_with_retention(spark, feed, mkstore, tmp_path):
    (store, plain), ckpt = mkstore("store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "agg")
    want = _rows(agg_state(all_rows, ["k"], "v"))
    v1 = compact_state(spark, store, ["k"])
    assert v1 == 2  # max batch id
    assert _rows(read_state(spark, store, ["k"])) == want
    # no newer increments: compaction is a no-op
    assert compact_state(spark, store, ["k"]) is None
    # new increment after the base → read merges base + increment,
    # second compact folds it and prunes what the PREVIOUS base covers
    extra = spark.createDataFrame(
        [(9001, "k0", 5.0), (9002, "k9", 7.0)], "id long, k string, v double"
    )
    agg_state(extra, ["k"], "v").write.mode("overwrite").parquet(
        store + "/increments/b=7"
    )
    open(os.path.join(plain, "increments", "b=7", "_STATE_COMMITTED"),
         "w").write("1")
    want2 = _rows(agg_state(all_rows.unionByName(extra), ["k"], "v"))
    assert _rows(read_state(spark, store, ["k"])) == want2
    v2 = compact_state(spark, store, ["k"])
    assert v2 == 7
    assert _rows(read_state(spark, store, ["k"])) == want2
    # retention: both v dirs kept (atlas keep=2), covered increments gone
    vdirs = {d for d in os.listdir(plain) if d.startswith("v=")}
    assert vdirs == {"v=2", "v=7"}
    assert os.listdir(os.path.join(plain, "increments")) == ["b=7"]


def test_distinct_kind_matches_one_pass_sketch(spark, feed, tmp_path):
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "distinct")
    got = {
        r["k"]: (r["n_distinct_est"], r["n"])
        for r in finalize_distinct(
            read_state(spark, store, ["k"], kind="distinct")
        ).collect()
    }
    want = {
        r["k"]: (r["n_distinct_est"], r["n"])
        for r in finalize_distinct(
            distinct_state(all_rows, ["k"], "v")
        ).collect()
    }
    assert got == want


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="kind"):
        read_state(spark, str(tmp_path), ["k"], kind="nope")
    with pytest.raises(ValueError, match="no state"):
        read_state(spark, str(tmp_path), ["k"])
    # URI stores now go through fsio.HadoopFS — an EMPTY file:// store
    # reads as no-state (not a scheme rejection), and constructing a
    # URI-store backend without a session raises naming the need
    with pytest.raises(ValueError, match="no state"):
        read_state(spark, "file://" + str(tmp_path), ["k"])
    from argostats_spark.streaming.fsio import store_fs
    with pytest.raises(ValueError, match="SparkSession"):
        store_fs("s3a://bucket/x", None)


def test_atlas_pointer_roundtrip_file_uri(spark, tmp_path):
    """publish_version / current_atlas over a file:// URI: the
    CURRENT-pointer OVERWRITE-rename, version pruning (keep=2), and
    the missing-pointer error all through fsio.HadoopFS."""
    from argostats_spark.streaming.atlas import current_atlas, publish_version

    plain = str(tmp_path / "atlas")
    store = "file://" + plain
    for ver, n in ((1, 3), (2, 5), (3, 7)):
        spark.range(n).write.parquet(f"{store}/v={ver}")
        publish_version(store, ver, spark=spark)
        assert current_atlas(spark, store).count() == n
    vdirs = {d for d in os.listdir(plain) if d.startswith("v=")}
    assert vdirs == {"v=2", "v=3"}  # keep=2 pruned v=1
    with pytest.raises(FileNotFoundError, match="CURRENT"):
        current_atlas(spark, "file://" + str(tmp_path / "empty"))


def test_pointer_read_survives_mid_swap_window(spark, tmp_path):
    """Fault injection for the object-store pointer-swap window
    (VERDICT r10 item 5): rename is copy+delete on s3a/gs, so a reader
    can hit the instant where CURRENT is ABSENT mid-swap. Simulated on
    the HadoopFS path by deleting the pointer before the first read
    and republishing before the retry — read_pointer must return the
    new value, and current_atlas must not raise."""
    from argostats_spark.streaming.atlas import current_atlas, publish_version
    from argostats_spark.streaming.fsio import HadoopFS, read_pointer, store_fs

    plain = str(tmp_path / "atlas")
    store = "file://" + plain
    spark.range(4).write.parquet(f"{store}/v=1")
    publish_version(store, 1, spark=spark)

    class MidSwapFS:
        """First read_text of CURRENT sees the mid-swap window: the
        pointer is REALLY deleted (proving the underlying path returns
        None), then republished so the retry observes the new value."""

        def __init__(self, inner):
            self._inner = inner
            self.tripped = False

        def read_text(self, path):
            if not self.tripped and path.endswith("/CURRENT"):
                self.tripped = True
                self._inner.delete(path)
                got = self._inner.read_text(path)
                assert got is None  # the window is real, not simulated
                self._inner.write_text(path, "1")
                return got
            return self._inner.read_text(path)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    inner = store_fs(store, spark)
    assert isinstance(inner, HadoopFS)
    fs = MidSwapFS(inner)
    assert read_pointer(fs, f"{store}/CURRENT") == "1"
    assert fs.tripped
    # end-to-end: the atlas reader survives the same window
    fs2 = MidSwapFS(inner)
    import argostats_spark.streaming.atlas as atlas_mod
    orig = atlas_mod.store_fs
    atlas_mod.store_fs = lambda s, sp=None: fs2
    try:
        assert current_atlas(spark, store).count() == 4
    finally:
        atlas_mod.store_fs = orig
    assert fs2.tripped
    # a pointer still missing AFTER the retry is genuinely unpublished
    inner.delete(f"{store}/CURRENT")
    assert read_pointer(inner, f"{store}/CURRENT") is None


def test_uncommitted_increment_is_invisible(spark, feed, mkstore, tmp_path):
    """An increment directory without the commit marker (a live or torn
    micro-batch write) must be invisible to read_state AND compaction
    — compacting past it would permanently exclude its rows."""
    (store, plain), ckpt = mkstore("store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "agg")
    before = _rows(read_state(spark, store, ["k"]))
    torn = spark.createDataFrame([(1, "k0", 1.0)], "id long, k string, v double")
    agg_state(torn, ["k"], "v").write.mode("overwrite").parquet(
        store + "/increments/b=99"
    )
    marker = os.path.join(plain, "increments", "b=99", "_STATE_COMMITTED")
    if os.path.exists(marker):
        os.remove(marker)
    assert _rows(read_state(spark, store, ["k"])) == before
    assert compact_state(spark, store, ["k"]) == 2  # not 99


# ---------------------------------------------------------------- round 11
# the two new maintained kinds: sample (bit-identical pin, like agg)
# and quantile (rank-error-bound pin, the approx-family policy).


def test_sample_kind_bit_identical_to_cold_rebuild(
    spark, feed, mkstore, tmp_path
):
    from argostats_spark.operators.aggstate import sample_state

    (store, _plain), ckpt = mkstore("store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(
        spark, feed, store, ckpt, "sample", id_cols=["id"], k=6
    )
    got = sorted(
        (r["k"], r["rnk"], r["pri"], r["tb"], r["v"], r["n"])
        for r in read_state(
            spark, store, ["k"], kind="sample", k=6
        ).collect()
    )
    want = sorted(
        (r["k"], r["rnk"], r["pri"], r["tb"], r["v"], r["n"])
        for r in sample_state(all_rows, ["k"], "v", ["id"], k=6).collect()
    )
    assert got == want  # deterministic: the merge law holds verbatim
    # compaction preserves it exactly too, and stays re-mergeable
    from argostats_spark.streaming.state import compact_state

    ver = compact_state(spark, store, ["k"], kind="sample", k=6)
    assert ver is not None
    after = sorted(
        (r["k"], r["rnk"], r["pri"], r["tb"], r["v"], r["n"])
        for r in read_state(
            spark, store, ["k"], kind="sample", k=6
        ).collect()
    )
    assert after == want


def test_quantile_kind_holds_rank_bound(spark, feed, tmp_path):
    from argostats_spark.operators.aggstate import finalize_quantiles

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "quantile")
    fin = finalize_quantiles(
        read_state(spark, store, ["k"], kind="quantile"), [0.5]
    )
    got = {r["k"]: (r["n"], r["q50"]) for r in fin.collect()}
    per_key = {}
    for r in all_rows.collect():
        per_key.setdefault(r["k"], []).append(r["v"])
    assert set(got) == set(per_key)
    for k, (n, est) in got.items():
        vals = sorted(per_key[k])
        assert n == len(vals)
        rank = sum(1 for x in vals if x <= est) / len(vals)
        assert abs(rank - 0.5) <= 0.05, (k, est, rank)


def test_topk_kind_interval_law_and_compaction(spark, feed, tmp_path):
    """Round 12: heavy hitters join the maintained family. The
    continuously-maintained state is NOT bit-identical to a cold
    rebuild (each increment's truncation adds its bound — by design);
    the contract is the Misra-Gries interval law against the exact
    stream-so-far counts, and CLOSURE: compaction folds increments
    into one state that still satisfies it."""
    from argostats_spark.operators.aggstate import finalize_topk

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(
        spark, feed, store, ckpt, "topk", k_state=8
    )
    true = {
        (r["k"], r["v"]): r["c"]
        for r in all_rows.groupBy("k", "v").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }

    def check(state_rows):
        seen, bound_of = {}, {}
        for r in state_rows:
            seen[(r["k"], r["v"])] = (r["c"], r["bound"])
            bound_of[r["k"]] = r["bound"]
        for key, (c, bd) in seen.items():
            assert c <= true[key] <= c + bd, (key, c, bd, true[key])
        for key, t in true.items():
            if key not in seen:
                assert t <= bound_of[key[0]], (key, t)

    st = read_state(spark, store, ["k"], kind="topk", k_state=8)
    check(st.collect())
    # finalize view carries the same interval
    for r in finalize_topk(st, ["k"], k=3).collect():
        t = true[(r["k"], r["v"])]
        assert r["est"] <= t <= r["est"] + r["err"]
    # compaction: the folded state is a STATE (closed under merge) —
    # readable, still interval-valid, and re-foldable with later
    # increments
    ver = compact_state(spark, store, ["k"], kind="topk", k_state=8)
    assert ver is not None
    check(read_state(spark, store, ["k"], kind="topk", k_state=8).collect())


def test_full_kind_maintains_all_families(spark, feed, tmp_path):
    from argostats_spark.operators.aggstate import (
        finalize_distinct,
        finalize_quantiles,
        full_state,
    )

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "full")
    got = read_state(spark, store, ["k"], kind="full")
    want = full_state(all_rows, ["k"], "v")
    # exact families: bit-identical to a cold rebuild
    g = sorted(
        (r["k"], r["n"], r["n_overflow"], r["s"], r["sq"], r["mn"], r["mx"])
        for r in got.collect()
    )
    w = sorted(
        (r["k"], r["n"], r["n_overflow"], r["s"], r["sq"], r["mn"], r["mx"])
        for r in want.collect()
    )
    assert g == w
    # HLL family: estimate equal (register-max merge law)
    ge = {r["k"]: r["n_distinct_est"] for r in finalize_distinct(got).collect()}
    we = {r["k"]: r["n_distinct_est"] for r in finalize_distinct(want).collect()}
    assert ge == we
    # KLL family: maintained sketch holds the rank bound
    per_key = {}
    for r in all_rows.collect():
        per_key.setdefault(r["k"], []).append(r["v"])
    for r in finalize_quantiles(got, [0.5]).collect():
        vals = sorted(per_key[r["k"]])
        rank = sum(1 for x in vals if x <= r["q50"]) / len(vals)
        assert abs(rank - 0.5) <= 0.05


def test_theta_kind_feeds_overlap_matrix(spark, feed, tmp_path):
    from argostats_spark.operators.overlap import overlap_matrix, theta_state

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "theta")
    got = read_state(spark, store, ["k"], kind="theta")
    want = theta_state(all_rows, ["k"], "v")
    # exact n adds up; estimates agree with a cold rebuild within the
    # sketch error bound of each other
    g = {r["k"]: r["n"] for r in got.collect()}
    w = {r["k"]: r["n"] for r in want.collect()}
    assert g == w
    gm = {(r["a"], r["b"]): r["est_inter"]
          for r in overlap_matrix(got, "k").collect()}
    wm = {(r["a"], r["b"]): r["est_inter"]
          for r in overlap_matrix(want, "k").collect()}
    assert set(gm) == set(wm) and len(gm) == 10  # C(5,2) key pairs
    for p in wm:
        assert abs(gm[p] - wm[p]) <= 0.05 * max(wm[p], 60), p


def test_sketch_kind_maintains_both_sketch_families(spark, feed, tmp_path):
    from argostats_spark.operators.aggstate import (
        finalize_distinct,
        finalize_quantiles,
        sketch_state,
    )

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    all_rows = _run_stream(spark, feed, store, ckpt, "sketch")
    got = read_state(spark, store, ["k"], kind="sketch")
    want = sketch_state(all_rows, ["k"], "v")
    ge = {
        r["k"]: (r["n"], r["n_distinct_est"])
        for r in finalize_distinct(got).collect()
    }
    we = {
        r["k"]: (r["n"], r["n_distinct_est"])
        for r in finalize_distinct(want).collect()
    }
    assert ge == we  # counts exact, HLL register-max merge law
    per_key = {}
    for r in all_rows.collect():
        per_key.setdefault(r["k"], []).append(r["v"])
    for r in finalize_quantiles(got, [0.5]).collect():
        vals = sorted(per_key[r["k"]])
        rank = sum(1 for x in vals if x <= r["q50"]) / len(vals)
        assert abs(rank - 0.5) <= 0.05
