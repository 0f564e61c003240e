#!/usr/bin/env python
"""Serialized fresh-JVM A/B of dedup_groups_lsh's `cum_pairs` limb
(VERDICT r12 item 1): the pairs subplan (signature self-join candidate
generation + exact-Jaccard verification) is the largest limb (1.49 s
of the 3.10 s isolated row at sf0.1; the row is 5.31 s at sf1 — the
slowest headline row at BOTH scales).

In-session attribution (round 13, this script's precursor runs): the
shipped plan's data passes are NOT the cost — Spark's runtime bloom
filter already gates the verify shingle stream to candidate ids below
the explode (an explicit pre-shingle gate measured flat), and exchange
reuse covers the signature self-join (an eager signature checkpoint
measured flat). The cost is STAGE BARRIERS: two eager localCheckpoints
(cand, sh_cand) serialize the DAG into sequential driver jobs, and
sh_cand's four consumers (n_tbl, the two broadcast denominator joins,
sa/sb) can instead share its distinct EXCHANGE inside one final action
(ReusedExchange) with no recompute.

Variants (per child: the pairs subplan AND the full dedup_groups_lsh
row — the sh_cand checkpoint also shields the CC loop's repeated
actions downstream, so a pairs-only win must not cost the row):

- v0_shipped   — current _minhash_lsh_pairs_inline.
- v6_drop_sh   — keep the cand checkpoint, drop sh_cand's (lazy
                 distinct; consumers share the exchange).
- v7_v6_gated  — v6 + shingle only candidate DOCS for verify
                 (explicit gate replaces the runtime bloom).
- v9_sig_ckpt  — checkpoint the SIGNATURE table instead of cand
                 (cand + everything downstream lazy), gated verify.
- v10_arrays   — row-local verify: per-candidate-doc shingle SETS via
                 one collect_set aggregate (dedup included — replaces
                 sh_cand's distinct + n_tbl agg + the two-join
                 intersection groupBy), broadcast onto the pair, and
                 n_inter = size(array_intersect(...)) in-row. Three
                 verify exchanges collapse into one; no sh_cand
                 checkpoint. Candidate-doc shingle sets ride as
                 arrays — candidate-sized, the bound the plan already
                 assumes.

Identity: pair set and full-row output both compared to shipped,
in-child. Protocol: one child JVM per variant, serialized, warm
min-of-3, loadavg recorded. Run at sf0.1 AND the sf1 replica before
adopting (two-stage + sf1 rule, SCALE.md / memory).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CHILD = r'''
import json, os, sys, time
sys.path.insert(0, @REPO@)
variant = @VARIANT@
SF_DIR = @SF_DIR@
load_before = os.getloadavg()
from pyspark.sql import functions as F
from argostats_spark.session import get_spark
import argostats_spark.queries_documents as qd

spark = get_spark(app_name="lsh_pairs_ab_" + variant)
d = spark.read.parquet(f"{SF_DIR}/documents.parquet")

KNOBS = {
    "v0_shipped": None,
    "v6_drop_sh": dict(ckpt_sig=False, ckpt_cand=True, ckpt_sh=False,
                       gated=False),
    "v7_v6_gated": dict(ckpt_sig=False, ckpt_cand=True, ckpt_sh=False,
                        gated=True),
    "v9_sig_ckpt": dict(ckpt_sig=True, ckpt_cand=False, ckpt_sh=False,
                        gated=True),
    "v10_arrays": "arrays",
    "v11_arrays_ckpt": "arrays_ckpt",
    "v12_noforce": "arrays_noforce",
}
if variant not in KNOBS:
    raise SystemExit(f"unknown variant {variant!r}")


def pairs_arrays(dd, ckpt_sets=False, force_bcast=True):
    sh_raw = qd._lsh_shingles(dd)
    stats = qd._lsh_doc_signatures(dd, sh_raw)
    a, b = stats.alias("a"), stats.alias("b")
    cand = a.join(
        b,
        (F.col("a.mh1") == F.col("b.mh1"))
        & (F.col("a.mh2") == F.col("b.mh2"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
    ).localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh_sets = (
        sh_raw.join(F.broadcast(ids), "doc_id")
        .groupBy("doc_id").agg(F.collect_set("g").alias("sh"))
    )
    if ckpt_sets:
        sh_sets = sh_sets.localCheckpoint(eager=True)
    pa = sh_sets.select(F.col("doc_id").alias("id_a"),
                        F.col("sh").alias("sh_a"),
                        F.size("sh").alias("n_a"))
    pb = sh_sets.select(F.col("doc_id").alias("id_b"),
                        F.col("sh").alias("sh_b"),
                        F.size("sh").alias("n_b"))
    if force_bcast:
        withsets = cand.join(F.broadcast(pa), "id_a").join(
            F.broadcast(pb), "id_b")
    else:
        withsets = cand.join(pa, "id_a").join(pb, "id_b")
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_inter.cast("double") / (
        F.col("n_a") + F.col("n_b") - n_inter)
    return (
        withsets.select("id_a", "id_b", jac.alias("jac_raw"))
        .filter(F.col("jac_raw") >= 0.6)
        .select("id_a", "id_b", F.round("jac_raw", 6).alias("jaccard"))
    )


def pairs_variant(dd, ckpt_sig, ckpt_cand, ckpt_sh, gated):
    sh_raw = qd._lsh_shingles(dd)
    stats = qd._lsh_doc_signatures(dd, sh_raw)
    if ckpt_sig:
        stats = stats.localCheckpoint(eager=True)
    a, b = stats.alias("a"), stats.alias("b")
    cand = a.join(
        b,
        (F.col("a.mh1") == F.col("b.mh1"))
        & (F.col("a.mh2") == F.col("b.mh2"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
    )
    if ckpt_cand:
        cand = cand.localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    if gated:
        src = qd._lsh_shingles(dd.join(F.broadcast(ids), "doc_id"))
    else:
        src = sh_raw.join(F.broadcast(ids), "doc_id")
    sh_cand = src.select("doc_id", "g").distinct()
    if ckpt_sh:
        sh_cand = sh_cand.localCheckpoint(eager=True)
    n_tbl = sh_cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    cand = cand.join(
        F.broadcast(n_tbl.select(F.col("doc_id").alias("id_a"),
                                 F.col("n_sh").alias("n_a"))), "id_a"
    ).join(
        F.broadcast(n_tbl.select(F.col("doc_id").alias("id_b"),
                                 F.col("n_sh").alias("n_b"))), "id_b"
    )
    sa = sh_cand.select(F.col("doc_id").alias("id_a"), "g")
    sb = sh_cand.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        cand.join(sa, "id_a").join(sb, ["id_b", "g"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.select("id_a", "id_b", jac.alias("jac_raw"))
        .filter(F.col("jac_raw") >= 0.6)
        .select("id_a", "id_b", F.round("jac_raw", 6).alias("jaccard"))
    )


_shipped_inline = qd._minhash_lsh_pairs_inline
knobs = KNOBS[variant]
if knobs == "arrays":
    qd._minhash_lsh_pairs_inline = pairs_arrays
elif knobs == "arrays_ckpt":
    qd._minhash_lsh_pairs_inline = (
        lambda dd: pairs_arrays(dd, ckpt_sets=True)
    )
elif knobs == "arrays_noforce":
    # VERDICT r13 item 1 / ADVICE medium: same row-local verify plan
    # but NO forced broadcast of the doc-shingle-set tables — AQE
    # decides (at candidate sizes it should still broadcast; at 100x a
    # near-dup-heavy corpus it degrades to shuffle instead of OOM).
    qd._minhash_lsh_pairs_inline = (
        lambda dd: pairs_arrays(dd, ckpt_sets=True, force_bcast=False)
    )
elif knobs is not None:
    qd._minhash_lsh_pairs_inline = lambda dd: pairs_variant(dd, **knobs)

# identity: pair set + full row vs shipped
got_pairs = sorted(map(tuple,
                       qd._minhash_lsh_pairs_inline(d).collect()))
got_row = sorted(map(tuple,
                     qd.q_dedup_groups_lsh(spark, SF_DIR).collect()))
qd._minhash_lsh_pairs_inline, patched = _shipped_inline, qd._minhash_lsh_pairs_inline
want_pairs = sorted(map(tuple, qd._minhash_lsh_pairs_inline(d).collect()))
want_row = sorted(map(tuple, qd.q_dedup_groups_lsh(spark, SF_DIR).collect()))
qd._minhash_lsh_pairs_inline = patched
identical = (got_pairs == want_pairs) and (got_row == want_row)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def wm(fn, runs=3):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


pairs_sec = wm(lambda: noop(qd._minhash_lsh_pairs_inline(d)))
row_sec = wm(lambda: noop(qd.q_dedup_groups_lsh(spark, SF_DIR)))
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "variant": variant, "pairs_sec": pairs_sec, "row_sec": row_sec,
    "identical": identical, "n_pairs": len(got_pairs),
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
}))
spark.stop()
'''


def main() -> None:
    variants = sys.argv[1:] or [
        "v0_shipped", "v6_drop_sh", "v7_v6_gated", "v9_sig_ckpt"
    ]
    results = {}
    for v in variants:
        code = (CHILD.replace("@REPO@", repr(str(REPO)))
                .replace("@VARIANT@", repr(v))
                .replace("@SF_DIR@", repr(SF_DIR)))
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600, cwd=str(REPO),
        )
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("CHILD_RESULT ")), None)
        if line is None:
            results[v] = {"error": (proc.stderr or proc.stdout)[-500:]}
        else:
            results[v] = json.loads(line[len("CHILD_RESULT "):])
        results[v]["wall_sec"] = round(time.time() - t0, 1)
        print(f"{v}: {results[v]}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
