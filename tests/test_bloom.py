"""Catalyst-native Bloom filter (operators/bloom.py): bit-layout
differential vs a pure-Python mirror, the no-false-negative structural
guarantee, the fpp bound, the shard-merge law, literal==join probe
equality, and the plan pins (row-local literal probe; broadcast join
probe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.bloom import (
    _BUCKET_BITS,
    bloom_build,
    bloom_gate_join,
    bloom_merge,
    bloom_might_contain,
    bloom_to_bytes,
)

M = _BUCKET_BITS * 4  # 4 buckets = 131072 bits
K = 3


def _py_xxhash64_positions(spark, keys, num_bits, num_hashes):
    """Ground-truth positions via Spark's own xxhash64 (the hash is the
    JVM's; the MIRROR is the bit layout math, which is what the
    differential pins)."""
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = df.select(
        "k",
        *[
            F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(num_bits)).alias(f"p{i}")
            for i in range(1, num_hashes + 1)
        ],
    ).collect()
    return {r["k"]: [r[f"p{i}"] for i in range(1, num_hashes + 1)] for r in rows}


def _py_bloom(positions_by_key, num_bits):
    bits = bytearray(num_bits // 8)
    for ps in positions_by_key.values():
        for p in ps:
            bits[p // 8] |= 1 << (p % 8)
    return bytes(bits)


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [(f"dirty-{i}",) for i in range(500)] + [(None,)], "k string"
    ).cache()


@pytest.fixture(scope="module")
def bloom(dirty):
    b = bloom_build(dirty, "k", M, K).localCheckpoint(eager=True)
    return b


def test_bit_layout_matches_python_mirror(spark, dirty, bloom):
    """Every byte of the built bitmap table equals a pure-Python bloom
    over the same positions — pins bucket/byte/bit-order (LSB-first)
    so the probe's substring/shift arithmetic can never silently
    disagree with bitmap_construct_agg's layout."""
    keys = [f"dirty-{i}" for i in range(500)]
    want = _py_bloom(_py_xxhash64_positions(spark, keys, M, K), M)
    got_buckets = bloom_to_bytes(bloom, M)
    got = b"".join(got_buckets)
    assert got == want


def test_no_false_negatives_and_fpp_bound(spark, dirty, bloom):
    blit = bloom_to_bytes(bloom, M)
    probe = spark.createDataFrame(
        [(f"dirty-{i}",) for i in range(500)]
        + [(f"clean-{i}",) for i in range(5000)],
        "k string",
    )
    got = probe.withColumn(
        "m", bloom_might_contain("k", blit, M, K)
    ).collect()
    hits = {r["k"]: r["m"] for r in got}
    # structural: every inserted key passes
    assert all(hits[f"dirty-{i}"] for i in range(500))
    # fpp: k=3, n=500, m=131072 -> (1-e^(-3*500/131072))^3 ~ 1.5e-6;
    # allow a generous margin over 5000 clean probes
    fp = sum(1 for i in range(5000) if hits[f"clean-{i}"])
    assert fp <= 5, f"{fp} false positives out of 5000"
    # NULL keys gate to NULL, never True/False
    nrow = (
        spark.createDataFrame([(None,)], "k string")
        .select(bloom_might_contain("k", blit, M, K).alias("m"))
        .first()
    )
    assert nrow["m"] is None


def test_merge_law_shards_or_to_union(spark, dirty):
    whole = bloom_build(dirty, "k", M, K)
    shards = [
        bloom_build(
            dirty.filter(F.pmod(F.xxhash64("k"), F.lit(3)) == r), "k", M, K
        )
        for r in range(3)
    ]
    merged = bloom_merge(*shards)
    a = {r["bucket"]: bytes(r["bitmap"]) for r in whole.collect()}
    b = {r["bucket"]: bytes(r["bitmap"]) for r in merged.collect()}
    assert a == b
    with pytest.raises(ValueError, match="no blooms"):
        bloom_merge()


def test_join_probe_equals_literal_probe(spark, dirty, bloom):
    blit = bloom_to_bytes(bloom, M)
    probe = spark.createDataFrame(
        [(i, f"dirty-{i % 700}" if i % 2 == 0 else f"clean-{i}")
         for i in range(2000)] + [(9999, None)],
        "id long, k string",
    )
    lit_res = {
        r["id"]: r["m"]
        for r in probe.withColumn(
            "m", bloom_might_contain("k", blit, M, K)
        ).collect()
    }
    join_res = {
        r["id"]: r["might_contain"]
        for r in bloom_gate_join(probe, bloom, "k", M, K).collect()
    }
    assert lit_res == join_res


def test_literal_probe_is_row_local_and_join_probe_broadcasts(spark, dirty, bloom):
    from argostats_spark.plans.explain import count_exchanges, physical_plan

    blit = bloom_to_bytes(bloom, M)
    probe = spark.range(1000).select(
        F.concat(F.lit("p"), F.col("id")).alias("k")
    )
    gated = probe.filter(bloom_might_contain("k", blit, M, K))
    plan = physical_plan(gated)
    assert count_exchanges(gated) == 0, plan[:800]
    assert "Join" not in plan
    jplan = physical_plan(bloom_gate_join(probe, bloom, "k", M, K))
    assert "BroadcastHashJoin" in jplan, jplan[:1200]


def test_validation(spark, dirty):
    with pytest.raises(ValueError, match="multiple"):
        bloom_build(dirty, "k", 1000)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_build(dirty, "k", M, 0)
    small = bloom_build(dirty, "k", M, K)
    with pytest.raises(ValueError, match="bloom_gate_join"):
        bloom_to_bytes(small, M, max_bytes=1024)
    with pytest.raises(ValueError, match="buckets"):
        bloom_might_contain("k", [b"\x00"], M, K)


def test_gate_join_rejects_reserved_probe_columns(spark, dirty, bloom):
    """ADVICE r9: a probe already carrying __rid (or the out_col) used
    to be silently overwritten and dropped — both now raise. Internals
    that live only in projected-away frames (bucket/bitmap) must keep
    working when the probe has same-named columns."""
    base = spark.createDataFrame([(1, "dirty-1")], "id long, k string")
    with pytest.raises(ValueError, match="__rid"):
        bloom_gate_join(base.withColumn("__rid", F.lit(7)), bloom, "k", M, K)
    with pytest.raises(ValueError, match="might_contain"):
        bloom_gate_join(
            base.withColumn("might_contain", F.lit(True)), bloom, "k", M, K
        )
    # same probe frame, renamed out_col: fine
    got = bloom_gate_join(
        base.withColumn("might_contain", F.lit(False)),
        bloom, "k", M, K, out_col="bloom_hit",
    ).first()
    assert got["bloom_hit"] is True and got["might_contain"] is False
    # non-reserved coexistence: probe's own bucket/bitmap columns survive
    got2 = bloom_gate_join(
        base.withColumn("bucket", F.lit(99)).withColumn("bitmap", F.lit("x")),
        bloom, "k", M, K,
    ).first()
    assert got2["bucket"] == 99 and got2["bitmap"] == "x"
    assert got2["might_contain"] is True


def test_decontamination_composition_prunes_then_verifies(spark):
    """The 100TB shape end-to-end at toy scale: bloom gate prunes the
    corpus row-locally, the exact verify semi-join touches only
    candidates, and the final result equals a plain exact semi-join —
    fpp changes the CANDIDATE count, never the verified output."""
    corpus = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(5000)], "id long, k string"
    )
    dirty = spark.createDataFrame(
        [(f"doc-{i * 7}",) for i in range(300)], "k string"
    )
    bl = bloom_build(dirty, "k", M, K)
    blit = bloom_to_bytes(bl, M)
    cand = corpus.filter(bloom_might_contain("k", blit, M, K))
    verified = cand.join(dirty, "k", "semi")
    want = corpus.join(dirty, "k", "semi")
    assert sorted(r["id"] for r in verified.collect()) == sorted(
        r["id"] for r in want.collect()
    )
    # and the gate really pruned: candidates ~ true hits + fpp*corpus
    assert cand.count() <= want.count() + 10


def test_literal_probe_is_stream_safe(spark, dirty, bloom, tmp_path_factory):
    """bloom_might_contain claims readStream composability (row-local,
    no state): gate a file stream and pin the result equal to gating
    the same frame in batch."""
    from argostats_spark.streaming.events import run_to_memory

    blit = bloom_to_bytes(bloom, M)
    d = tmp_path_factory.mktemp("bloom_stream")
    rows = [{"k": f"dirty-{i}"} for i in range(0, 50)] + [
        {"k": f"clean-{i}"} for i in range(50)
    ]
    import json as _json

    (d / "part-000.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows) + "\n"
    )
    stream = (
        spark.readStream.schema("k string").json(str(d))
        .withColumn("m", bloom_might_contain("k", blit, M, K))
    )
    q = run_to_memory(stream, "bloom_stream", output_mode="append")
    try:
        got = {r["k"]: r["m"] for r in spark.table("bloom_stream").collect()}
    finally:
        q.stop()
    batch = {
        r["k"]: r["m"]
        for r in spark.read.schema("k string").json(str(d))
        .withColumn("m", bloom_might_contain("k", blit, M, K)).collect()
    }
    assert got == batch and len(got) == 100
    assert all(got[f"dirty-{i}"] for i in range(50))
