#!/usr/bin/env python
"""Serialized quiet-box re-measure of the round-8 contention-suspect
bench rows (VERDICT r8 item 1): ``argo_atlas_global_5deg`` (the flagged
1.54x tripwire), ``dedup_groups_lsh`` (driver 4.35s vs serialized
3.47-3.58s), and ``argo_summary_build_30k``.

Protocol is bench.py's, verbatim: one untimed warm run, then min-of-3
noop writes, cache-clear + double-GC between queries. On top, the
SCALE.md:330 discipline: os.getloadavg() recorded BEFORE and AFTER each
query; the artifact is only trustworthy if 1-min load stays near the
query's own parallelism (i.e. no co-tenant). Each query runs in its own
fresh JVM (one process per query, serialized) so no query inherits
another's storage debris or GC state.

Usage: python scripts/bench_remeasure_r9.py            # all three
       python scripts/bench_remeasure_r9.py <row> ...  # subset
SUPERSEDED (round 10): this protocol is folded into bench.py itself —
flagged rows auto-re-measure in fresh JVMs before the artifact is
written (see REMEASURE_PROTOCOL and --row). Kept for the r9 history.
Prints one JSON line per row and a summary comparing against the
BENCH_r07/BENCH_r08 numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROWS = ["argo_atlas_global_5deg", "dedup_groups_lsh", "argo_summary_build_30k"]

# r7/r8 committed numbers (BENCH_r07.json / BENCH_r08.json, sf0.1)
PRIOR = {
    "argo_atlas_global_5deg": {"r7": 0.908, "r8": 1.401},
    "dedup_groups_lsh": {"r7": 3.856, "r8": 4.351},
    "argo_summary_build_30k": {"r7": 0.514, "r8": 0.646},
}

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, @REPO@)
row = @ROW@
SF_DIR = @SF_DIR@
load_before = os.getloadavg()
from argostats_spark.session import get_spark
spark = get_spark(app_name="remeasure_" + row)

def warm_min(fn, runs=3):
    fn()  # untimed warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

if row == "dedup_groups_lsh":
    from argostats_spark.queries import QUERIES
    # same warmup bench.py uses before headline rows
    QUERIES["events_hourly_window"](spark, SF_DIR).count()
    sec = warm_min(lambda: QUERIES[row](spark, SF_DIR)
                   .write.format("noop").mode("overwrite").save())
else:
    from argostats_spark.operators.atlas import (
        choose_clim_ts_variant, clim_ts_auto, make_grid)
    from argostats_spark.operators.interpolation import interpolate_profiles
    from argostats_spark.operators.summary import build_summary
    from argostats_spark.sources.synthetic import make_raw
    raw = make_raw(spark, n_wmos=240, profiles_per_wmo=125).cache()
    n_raw = raw.count()
    if row == "argo_summary_build_30k":
        sec = warm_min(lambda: build_summary(raw)
                       .write.format("noop").mode("overwrite").save())
    else:
        # bench.py's exact atlas preamble: warm interp workers, cache
        # profiles, warm the small-domain router, then time the global run
        interpolate_profiles(raw.sample(0.02, seed=1)).write.format(
            "noop").mode("overwrite").save()
        interpolate_profiles(raw).write.format("noop").mode("overwrite").save()
        profiles = interpolate_profiles(raw).cache()
        profiles.count()
        clim_ts_auto(make_grid(spark, (0.0, 20.0, -20.0, 0.0), reso_deg=5.0),
                     profiles, reso_deg=5.0, smoothing_factor=2.0
                     ).write.format("noop").mode("overwrite").save()
        grid = make_grid(spark, (-180.0, 180.0, -80.0, 80.0), reso_deg=5.0)
        variant = choose_clim_ts_variant(grid, profiles, reso_deg=5.0,
                                         smoothing_factor=2.0)
        sec = warm_min(lambda: clim_ts_auto(
            grid, profiles, reso_deg=5.0, smoothing_factor=2.0,
            variant=variant).write.format("noop").mode("overwrite").save())
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "row": row, "sec": round(sec, 3),
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
}))
spark.stop()
"""


def main() -> None:
    rows = sys.argv[1:] or ROWS
    results = {}
    for row in rows:
        code = (CHILD.replace("@REPO@", repr(str(REPO)))
                .replace("@ROW@", repr(row))
                .replace("@SF_DIR@", repr(SF_DIR)))
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=str(REPO), timeout=1800,
        )
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("CHILD_RESULT ")), None)
        if line is None:
            results[row] = {"error": (proc.stderr or proc.stdout)[-500:]}
            continue
        r = json.loads(line[len("CHILD_RESULT "):])
        r["wall_sec_incl_jvm"] = round(time.time() - t0, 1)
        prior = PRIOR.get(row, {})
        if prior:
            r["r7_sec"] = prior["r7"]
            r["r8_sec"] = prior["r8"]
            r["vs_r7"] = round(r["sec"] / prior["r7"], 2)
            r["vs_r8"] = round(r["sec"] / prior["r8"], 2)
        results[row] = r
        print(json.dumps(r))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
