#!/usr/bin/env python
"""Fresh-JVM interleaved A/B of ANY registry row with the shipped
spread_for_cpu input spreads active (v_spread) vs neutralized to
identity (v_plain) — the round-14 continuation screen for single-split
corpus inputs whose heavy row-local map work (cosine folds, tokenize,
md5) otherwise runs as ONE task. Each child: bench-identical warmup,
untimed warm run, 4 timed singles, per-single steal deltas.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bench_row_spread_ab.py \
           <row> v_spread v_plain v_plain v_spread
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
row = @ROW@
SF_DIR = @SF_DIR@
load_before = os.getloadavg()
import argostats_spark.session as S

if variant == "v_plain":
    # neutralize the spread everywhere it was imported
    S.spread_for_cpu = lambda df: df
elif variant != "v_spread":
    raise SystemExit(f"unknown variant {variant!r}")

import argostats_spark.queries_documents as QD
if variant == "v_plain":
    QD.spread_for_cpu = lambda df: df
from argostats_spark.queries import QUERIES

spark = S.get_spark(app_name=f"spread_ab_{row}_{variant}")
QUERIES["events_hourly_window"](spark, SF_DIR).count()  # same warmup


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run():
    noop(QUERIES[row](spark, SF_DIR))


def _steal():
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
    "variant": variant, "row": row, "min_sec": min(singles),
    "singles": singles, "steal_jiffies_per_single": steals,
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
}))
spark.stop()
'''


def main() -> None:
    row = sys.argv[1]
    variants = sys.argv[2:] or ["v_spread", "v_plain"]
    results = []
    for v in variants:
        code = (CHILD.replace("@REPO@", repr(str(REPO)))
                .replace("@VARIANT@", repr(v))
                .replace("@ROW@", repr(row))
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
    print(json.dumps({"sf_dir": SF_DIR, "row": row, "results": results}))


if __name__ == "__main__":
    main()
