#!/usr/bin/env python
"""Fresh-JVM interleaved A/B of the argo_eape_* bench rows (round 14).

Variants (each child replicates bench.py::_measure_single's exact
preamble — cached 240×125 synthetic raw, warmed interp, cached
profiles, regional 5° grid — then warm min over repeated singles):

- v0_r13:   the round-13 composition — legacy per-pair payload
            (lon/lat/CT/SR/IDX aboard every pair), broadcast-means
            join BELOW the repartition (BAR arrays cross the pair
            exchange), applyInPandas kernel with the in-kernel
            density/bisection.
- v1_arrow: shipped code, legacy payload forced (pairs=match_pairs
            passed in): isolates the Arrow kernel + join-above-
            repartition + column pruning from the algorithm change.
- v2_fast:  shipped fast path (pairs=None): per-PROFILE density/
            bisection via _eape_profile_features + everything in v1.

Usage: python scripts/bench_eape_ab.py [R14|T25|both] [variant ...]
SPARK_GRAFT_SF_DIR is irrelevant (the argo rows use fixed synthetic
input); SPARK_GRAFT_CPUS as usual.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r'''
import json, math, os, sys, time
sys.path.insert(0, @REPO@)
variant = @VARIANT@
algo = @ALGO@
load_before = os.getloadavg()
from pyspark.sql import functions as F
from argostats_spark.session import get_spark
import argostats_spark.operators.atlas as atlas_mod
from argostats_spark.operators.atlas import (
    clim_eape, clim_ts, make_grid, match_pairs,
)
from argostats_spark.operators.interpolation import interpolate_profiles
from argostats_spark.sources.synthetic import make_raw

def _steal():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


_steal0 = _steal()
spark = get_spark(app_name=f"eape_ab_{variant}_{algo}")

# round 15: the cross-run parquet cache is gone from bench.py (VERDICT
# r14 item 9) — build the deterministic frame directly, sized by env
# so the scale adjudication can grow the profile count
_wmos = int(os.environ.get("SPARK_GRAFT_EAPE_WMOS", "240"))
_ppw = int(os.environ.get("SPARK_GRAFT_EAPE_PPW", "125"))
raw = make_raw(spark, n_wmos=_wmos, profiles_per_wmo=_ppw).cache()
raw.count()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


noop(interpolate_profiles(raw.sample(0.02, seed=1)))
noop(interpolate_profiles(raw))
profiles = interpolate_profiles(raw).cache()
profiles.count()
egrid = make_grid(spark, (-80.0, 20.0, -60.0, 10.0), reso_deg=5.0)


def v0_r13():
    # the exact r13 clim_eape body (join below the repartition, pandas
    # kernel, legacy payload with lon/lat aboard)
    theta = math.sin(math.radians(2.0 * 5.0) / 2.0) ** 2
    pairs = match_pairs(egrid, profiles, 5.0, 2.0)
    ts = clim_ts(egrid, profiles, 5.0, 2.0, pairs=pairs)
    means = ts.select(
        "glon", "glat",
        F.col("CT").alias("CT_BAR"), F.col("SR").alias("SR_BAR"),
    )
    enriched = pairs.join(F.broadcast(means), on=["glon", "glat"])
    n = pairs.sparkSession.sparkContext.defaultParallelism
    return (
        enriched.repartition(n, "glon", "glat")
        .groupBy("glon", "glat")
        .applyInPandas(
            atlas_mod._eape_cell_kernel(theta, algo), atlas_mod._EAPE_SCHEMA
        )
    )


def v1_arrow():
    pairs = match_pairs(egrid, profiles, 5.0, 2.0)
    return clim_eape(egrid, profiles, 5.0, 2.0, pairs=pairs, algo=algo)


def v2_fast():
    return clim_eape(egrid, profiles, 5.0, 2.0, algo=algo)


builder = {"v0_r13": v0_r13, "v1_arrow": v1_arrow, "v2_fast": v2_fast}[variant]
noop(builder())  # untimed warm (worker pools, codegen)
singles = []
for _ in range(4):
    t0 = time.perf_counter()
    noop(builder())
    singles.append(round(time.perf_counter() - t0, 3))
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "variant": variant, "algo": algo,
    "min_sec": min(singles), "singles": singles,
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
    "steal_jiffies": _steal() - _steal0,
    "n_profiles": _wmos * _ppw,
}))
spark.stop()
'''


def main() -> None:
    args = sys.argv[1:]
    algos = ["R14", "T25"]
    if args and args[0] in ("R14", "T25", "both"):
        algos = [args[0]] if args[0] != "both" else algos
        args = args[1:]
    rounds = 1
    if args and args[0] == "--rounds":
        rounds = int(args[1]); args = args[2:]
    variants = args or ["v0_r13", "v1_arrow", "v2_fast"]
    results = []
    for algo in algos:
        for rnd in range(rounds):
            # alternate order per round so neither variant always
            # inherits the other's load tail
            ordered = variants if rnd % 2 == 0 else list(reversed(variants))
            for v in ordered:
                # load gate between children (the bench.py protocol): a
                # child launched into the previous child's 32-thread load
                # tail measures the box, not the plan
                t_gate = time.time()
                while (time.time() - t_gate) < 180 and os.getloadavg()[0] > 1.5:
                    time.sleep(5)
                code = (CHILD.replace("@REPO@", repr(str(REPO)))
                        .replace("@VARIANT@", repr(v))
                        .replace("@ALGO@", repr(algo)))
                t0 = time.time()
                proc = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True,
                    text=True, timeout=3600, cwd=str(REPO),
                )
                line = next((l for l in proc.stdout.splitlines()
                             if l.startswith("CHILD_RESULT ")), None)
                rec = (json.loads(line[len("CHILD_RESULT "):]) if line
                       else {"variant": v, "algo": algo,
                             "error": (proc.stderr or proc.stdout)[-500:]})
                rec["wall_sec"] = round(time.time() - t0, 1)
                results.append(rec)
                print(f"{rec}", file=sys.stderr)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
