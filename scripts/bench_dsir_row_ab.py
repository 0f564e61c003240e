#!/usr/bin/env python
"""Fresh-JVM interleaved A/B of the FULL registry dsir_select row
(q_dsir_select — what bench.py times) with the shipped fused λ fit
(round 14, dsir_logratio_fused) vs the r13 two-table fit path,
adjudicating the erratic 4-40 s sf1 stalls the round-14 sf1 refresh
recorded (limbs stayed fast: cum_lam 6.8→3.5 s — whatever stalls is a
full-row-only effect, the same signature as the round-12 spread
incident). Each child measures warm min-of-3 of the registry row and
repeats the single runs so a stall is visible as scatter, not hidden
by the min.

Usage: python scripts/bench_dsir_row_ab.py v_fused v_twotable ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/argostats_scale_sf1")

CHILD = r'''
import json, os, sys, time
sys.path.insert(0, @REPO@)
variant = @VARIANT@
SF_DIR = @SF_DIR@
load_before = os.getloadavg()
from pyspark.sql import functions as F
from argostats_spark.session import get_spark
import argostats_spark.operators.dsir as dsir_mod
from argostats_spark.queries import QUERIES

if variant == "v_twotable":
    # restore the r13 fit composition inside the shipped dsir_select
    def _twotable(feats_all, n_buckets=4096, alpha=1.0,
                  return_floor=False):
        raw_tot = (
            feats_all.filter(F.col("__side") == "r")
            .groupBy("bucket").agg(F.sum("c").alias("c"))
        )
        tgt_tot = (
            feats_all.filter(F.col("__side") == "t")
            .groupBy("bucket").agg(F.sum("c").alias("c"))
        )
        return dsir_mod.dsir_logratio(
            tgt_tot, raw_tot, n_buckets, alpha, return_floor
        )
    dsir_mod.dsir_logratio_fused = _twotable
elif variant in ("v_fused_eager", "v_fused_nockpt"):
    # same one-aggregate fit, different materialization of `both`:
    # eager checkpoint (<=B rows, deterministic point) vs no checkpoint
    # (the two consumers re-derive the cheap aggregate from the eager
    # feats checkpoint)
    def _fused2(feats_all, n_buckets=4096, alpha=1.0,
                return_floor=False, __v=variant):
        both = feats_all.groupBy("bucket").agg(
            F.sum(F.when(F.col("__side") == "t", F.col("c"))).alias("ct"),
            F.sum(F.when(F.col("__side") == "r", F.col("c"))).alias("cr"),
        )
        if __v == "v_fused_eager":
            both = both.localCheckpoint(eager=True)
        tots = both.agg(
            F.sum("ct").alias("t"), F.sum("cr").alias("r")
        ).collect()[0]
        t_tot = tots["t"] or 0
        r_tot = tots["r"] or 0
        denom_t = float(t_tot + alpha * n_buckets)
        denom_r = float(r_tot + alpha * n_buckets)
        lam = F.log(
            (F.coalesce(F.col("ct"), F.lit(0)).cast("double")
             + F.lit(alpha)) / F.lit(denom_t)
        ) - F.log(
            (F.coalesce(F.col("cr"), F.lit(0)).cast("double")
             + F.lit(alpha)) / F.lit(denom_r)
        )
        out = both.select("bucket", lam.alias("lam"))
        if return_floor:
            import math
            floor = (math.log(alpha / denom_t)
                     - math.log(alpha / denom_r))
            return out, floor
        return out
    dsir_mod.dsir_logratio_fused = _fused2
elif variant == "v_bigckpt":
    # the round-14.0 composition (pre-stall-fix): per-doc feature table
    # eagerly checkpointed (corpus-proportional pin), fit + scoring
    # both reading from it. NOTE: after the round-14 close restructure
    # the shipped dsir_select no longer calls dsir_logratio_fused, so
    # the v_twotable / v_fused_* patches above are HISTORICAL (they
    # patch a function the shipped row no longer reaches); this variant
    # rebuilds the old composition explicitly for A/B.
    def _bigckpt_select(raw_docs, target_docs, k, text_col="text",
                        id_col="doc_id", n_buckets=4096, alpha=1.0,
                        salt="dsir", temperature=1.0, hasher="md5"):
        feats_all = dsir_mod.fused_bucket_counts(
            raw_docs, target_docs, text_col, id_col, n_buckets, hasher
        )
        raw_feats = feats_all.filter(F.col("__side") == "r").select(
            id_col, "bucket", "c"
        )
        lam = dsir_mod.dsir_logratio_fused(
            feats_all, n_buckets, alpha
        ).localCheckpoint(eager=True)
        scores = dsir_mod.dsir_scores(raw_feats, lam, id_col)
        return (
            dsir_mod.dsir_resample(scores, k, id_col, salt, temperature),
            lam,
        )
    dsir_mod.dsir_select = _bigckpt_select
elif variant != "v_fused":
    raise SystemExit(f"unknown variant {variant!r}")

spark = get_spark(app_name="dsir_row_ab_" + variant)
QUERIES["events_hourly_window"](spark, SF_DIR).count()  # same warmup


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run():
    noop(QUERIES["dsir_select"](spark, SF_DIR))


def _steal():
    # column 9 of /proc/stat cpu line: cumulative stolen jiffies — the
    # round-14 close found multi-vCPU steal bursts from a noisy host
    # neighbor behind every "erratic stall"; a child that ran through
    # one is adjudicated by this delta, not believed
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, ValueError, IndexError):
        return 0


run()  # untimed warm
singles = []
steals = []
for _ in range(4):
    s0 = _steal()
    t0 = time.perf_counter()
    run()
    singles.append(round(time.perf_counter() - t0, 3))
    steals.append(_steal() - s0)
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "variant": variant, "min_sec": min(singles), "singles": singles,
    "steal_jiffies_per_single": steals,
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
}))
spark.stop()
'''


def main() -> None:
    variants = sys.argv[1:] or ["v_fused", "v_twotable"]
    results = []
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
        rec = (json.loads(line[len("CHILD_RESULT "):]) if line
               else {"variant": v,
                     "error": (proc.stderr or proc.stdout)[-500:]})
        rec["wall_sec"] = round(time.time() - t0, 1)
        results.append(rec)
        print(f"{rec}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
