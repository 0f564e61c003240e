#!/usr/bin/env python
"""Serialized fresh-JVM A/B of dsir_select's fit stage (VERDICT r11
item 3): after the round-11 pq win, dsir_select is the slowest
headline row (2.92 s isolated at sf0.1) and its `cum_lam` limb (the
raw-feature pass + target fit + λ join) is the largest limb (~2.0 s).

Measured cost structure at sf0.1 (round-12 profiling, this script's
precursor): the corpus is ONE parquet file → ONE input partition, so
the CPU-heavy tokenize/md5/explode chains run single-task on a 32-core
box; and the raw and target corpora are tokenized in SEPARATE stage
chains (two explodes, two aggregates) even though both feed the same
fit.

Variants (all must produce the IDENTICAL query output — the k=100
selection plus the top-10 λ buckets, compared in-child against the
shipped path):

- v0_current — the shipped dsir_select.
- v1_spread  — inputs repartitioned to defaultParallelism before the
               gram pass when the scan has fewer partitions (the
               "cheap input, expensive map" gate: maxPartitionBytes
               sizes partitions for IO, not for a ~100-instruction
               per-gram md5 chain; on a real cluster with many files
               the gate is a no-op).
- v2_fused   — v1 + ONE union gram pass for both corpora: raw and
               target are tagged and unioned, a single explode +
               (side, id, bucket) aggregate feeds the checkpointed
               feature table, from which raw per-doc features
               (scoring), raw totals and target totals are all
               state-table-sized re-aggregations. One corpus-text
               scan chain instead of two; the fit's scalar totals
               read the checkpoint, never the text.

Protocol: one child JVM per variant, serialized, warm min-of-3 of the
full dsir_select stage (construction included — the feature-table
checkpoint is eager by design), loadavg recorded. JSON table printed
for SCALE.md.

SHIPPED (round 12): v2's FUSION only — the spread half was dropped
after the sf1 refresh caught erratic 5-47 s stalls from the full-text
RoundRobin exchange interleaving with the per-call eager checkpoint
(SCALE.md "dsir fit stage", sf1 postscript). v0_current always
measures whatever dsir_select currently ships, so re-running this
script now measures the shipped fusion-no-spread plan as v0.
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
from argostats_spark.operators.dsir import (
    dsir_select, dsir_logratio, dsir_scores, dsir_resample,
    gram_rows, _bucket_of)

spark = get_spark(app_name="dsir_ab_" + variant)
sc = spark.sparkContext
d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
raw = d.where(F.col("source") != "src0")
tgt = d.where(F.col("source") == "src0")


def spread(df):
    p = sc.defaultParallelism
    return df.repartition(p) if df.rdd.getNumPartitions() < p else df


def select_v1():
    return dsir_select(spread(raw), spread(tgt), k=100, n_buckets=4096)


def select_v2():
    B = 4096
    tagged = raw.select(
        F.col("doc_id"), F.col("text"), F.lit("r").alias("__side")
    ).unionByName(tgt.select(
        F.lit(None).cast("long").alias("doc_id"), F.col("text"),
        F.lit("t").alias("__side"),
    ))
    g = gram_rows(spread(tagged), "text", ["doc_id", "__side"])
    feats_all = (
        g.select("doc_id", "__side", _bucket_of(F.col("gram"), B))
        .groupBy("__side", "doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    raw_feats = feats_all.filter(F.col("__side") == "r").select(
        "doc_id", "bucket", "c")
    raw_tot = raw_feats.groupBy("bucket").agg(F.sum("c").alias("c"))
    tgt_tot = (feats_all.filter(F.col("__side") == "t")
               .groupBy("bucket").agg(F.sum("c").alias("c")))
    lam = dsir_logratio(tgt_tot, raw_tot, B, 1.0).localCheckpoint(eager=True)
    scores = dsir_scores(raw_feats, lam, "doc_id")
    return dsir_resample(scores, 100, "doc_id", "dsir", 1.0), lam


def select_v3():
    # round 14 (VERDICT r13 item 5): collapse the lambda-fit
    # re-aggregation chain — ONE conditional-sum groupBy(bucket) over
    # the fused checkpoint produces (bucket, ct, cr) directly,
    # replacing two side-filtered groupBys + the full_outer join; the
    # two corpus totals come off the <=B-row table, never the text.
    from argostats_spark.operators.dsir import fused_bucket_counts
    B = 4096
    feats_all = fused_bucket_counts(raw, tgt, "text", "doc_id", B)
    raw_feats = feats_all.filter(F.col("__side") == "r").select(
        "doc_id", "bucket", "c")
    both = feats_all.groupBy("bucket").agg(
        F.sum(F.when(F.col("__side") == "t", F.col("c"))).alias("ct"),
        F.sum(F.when(F.col("__side") == "r", F.col("c"))).alias("cr"),
    ).localCheckpoint(eager=False)
    tots = both.agg(F.sum("ct").alias("t"), F.sum("cr").alias("r")).collect()[0]
    t_tot = tots["t"] or 0
    r_tot = tots["r"] or 0
    denom_t = float(t_tot + B)
    denom_r = float(r_tot + B)
    lam = both.select(
        "bucket",
        (F.log((F.coalesce(F.col("ct"), F.lit(0)).cast("double") + 1.0)
               / F.lit(denom_t))
         - F.log((F.coalesce(F.col("cr"), F.lit(0)).cast("double") + 1.0)
                 / F.lit(denom_r))).alias("lam"),
    ).localCheckpoint(eager=True)
    scores = dsir_scores(raw_feats, lam, "doc_id")
    return dsir_resample(scores, 100, "doc_id", "dsir", 1.0), lam


def stage(variant):
    if variant == "v0_current":
        return dsir_select(raw, tgt, k=100, n_buckets=4096)
    if variant == "v1_spread":
        return select_v1()
    if variant == "v2_fused":
        return select_v2()
    if variant == "v3_fusedlam":
        return select_v3()
    raise SystemExit(f"unknown variant {variant!r}")


def outputs(pair):
    selected, lam = pair
    sel = sorted(map(tuple, selected.select(
        "doc_id", "rank", "n_grams", "logw", "g", "score").collect()))
    top = sorted(map(tuple, lam.select(
        "bucket", F.round("lam", 6).alias("lam6"))
        .orderBy(F.col("lam6").desc(), F.col("bucket").asc())
        .limit(10).collect()))
    return sel, top


got = outputs(stage(variant))
want = outputs(dsir_select(raw, tgt, k=100, n_buckets=4096))
identical = got == want


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run():
    selected, lam = stage(variant)
    noop(selected)


run()  # warm
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "variant": variant, "sec": round(best, 3), "identical": identical,
    "n_selected": len(got[0]),
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
}))
spark.stop()
'''


def main() -> None:
    variants = sys.argv[1:] or ["v0_current", "v1_spread", "v2_fused"]
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
