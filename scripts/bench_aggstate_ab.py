#!/usr/bin/env python
"""Serialized fresh-JVM A/B of the stats_suite `aggstate` limb.

Round-11 target: the limb is the worst-constant scaler in the suite's
limb table (1.17 s at sf0.1 -> 13.3 s at sf1) because the shipped
demonstration builds its two half-corpus states with two separate
FILTERED scans per state family: agg_state over l_orderkey%2==0 and
==1 (two lineitem scans), distinct_state over the same two halves
(two more), plus the exact-distinct anchor (a fifth). The parity
filter can't push to parquet, so each is a full-table scan.

Variants (identical output REQUIRED — the full limb frame
(which, grp, stat, sval, nval) is collected and compared):

- v0_current  — the shipped plan (per-half filtered scans).
- v1_onepass  — each state family builds BOTH half states in ONE
                grouped pass keyed by (__half, l_returnflag); the
                merge then groups the 2-rows-per-key state table by
                l_returnflag alone. Same operators, same merge law —
                state tables keyed by a snapshot column is exactly the
                production shape (monthly snapshots in one state
                table) — but 5 lineitem scans become 3.
- v2_fused    — the SHIPPED shape after round 11's full_state fusion:
                ONE grouped aggregate builds the agg AND hll families
                (the real query also folds kll in); 3 scans become 2
                (fused build + the exact-distinct anchor).

HLL identity holds by construction: a sketch depends only on the
multiset of values in its group, and groupBy(__half, key) partitions
rows identically to filter(half)+groupBy(key), so the per-half
sketches (and their union) are bit-identical.

Protocol: one child JVM per variant, serialized, warm min-of-3 noop
write, loadavg recorded, row-set md5 compared. JSON table for
SCALE.md.

SHIPPED (round 11, measured table in SCALE.md "aggstate limb A/B"):
v3_split — codegen exact agg + ONE fused sketch pass. The 4-way table
killed the all-in fusion (v2): any object-typed aggregate function
(HLL/KLL) forces ObjectHashAggregate, dragging the decimal sums off
whole-stage codegen; the per-row CPU penalty exceeds the saved scan
in every regime measured. v0/v1 remain for reference.
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
import hashlib, json, os, sys, time
sys.path.insert(0, @REPO@)
variant = @VARIANT@
SF_DIR = @SF_DIR@
load_before = os.getloadavg()
from pyspark.sql import functions as F
from argostats_spark.session import get_spark
from argostats_spark.operators.aggstate import (
    agg_state, distinct_state, finalize_distinct, finalize_state,
    full_state, merge_agg_states, merge_distinct_states,
    merge_full_states, merge_sketch_states, sketch_state)

spark = get_spark(app_name="aggstate_ab_" + variant)
li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

AGL_STACK = (
    "stack(6,"
    " 'n', CAST(NULL AS STRING), CAST(n AS DOUBLE),"
    " 'sum', CAST(NULL AS STRING), CAST(s AS DOUBLE),"
    " 'min', CAST(NULL AS STRING), CAST(mn AS DOUBLE),"
    " 'max', CAST(NULL AS STRING), CAST(mx AS DOUBLE),"
    " 'mean', CAST(NULL AS STRING), round(mean, 6),"
    " 'var', CAST(NULL AS STRING), round(var, 6)"
    ") AS (stat, sval, nval)"
)
DAGL_STACK = (
    "stack(2,"
    " 'dexact', CAST(NULL AS STRING), CAST(dex AS DOUBLE),"
    " 'dok', CAST(NULL AS STRING),"
    "  CAST(CASE WHEN abs(CAST(n_distinct_est AS DOUBLE) - dex)"
    "            <= 0.05 * dex + 1 THEN 1.0 ELSE 0.0 END AS DOUBLE)"
    ") AS (stat, sval, nval)"
)


def build():
    if variant == "v0_current":
        halves = [li.filter(F.col("l_orderkey") % 2 == r) for r in (0, 1)]
        fin = finalize_state(merge_agg_states(
            ["l_returnflag"],
            *[agg_state(h, ["l_returnflag"], "l_quantity") for h in halves],
        ))
        dfin = finalize_distinct(merge_distinct_states(
            ["l_returnflag"],
            *[distinct_state(h, ["l_returnflag"], "l_quantity")
              for h in halves],
        ))
    elif variant == "v1_onepass":
        tagged = li.withColumn("__half", F.col("l_orderkey") % 2)
        fin = finalize_state(merge_agg_states(
            ["l_returnflag"],
            agg_state(tagged, ["__half", "l_returnflag"], "l_quantity"),
        ))
        dfin = finalize_distinct(merge_distinct_states(
            ["l_returnflag"],
            distinct_state(
                tagged, ["__half", "l_returnflag"], "l_quantity"
            ).drop("__half"),
        ))
    elif variant == "v2_fused":  # all families in one object-path agg
        tagged = li.withColumn("__half", F.col("l_orderkey") % 2)
        fused = merge_full_states(
            ["l_returnflag"],
            full_state(tagged, ["__half", "l_returnflag"], "l_quantity"),
        ).localCheckpoint(eager=False)
        fin = finalize_state(fused)
        dfin = finalize_distinct(fused)
    else:  # v3_split — codegen exact agg + ONE fused sketch pass
        tagged = li.withColumn("__half", F.col("l_orderkey") % 2)
        fin = finalize_state(merge_agg_states(
            ["l_returnflag"],
            agg_state(tagged, ["__half", "l_returnflag"], "l_quantity"),
        ))
        dfin = finalize_distinct(merge_sketch_states(
            ["l_returnflag"],
            sketch_state(tagged, ["__half", "l_returnflag"], "l_quantity"),
        ))
    agl = fin.select(
        F.lit("aggstate").alias("which"),
        F.col("l_returnflag").alias("grp"),
        F.expr(AGL_STACK),
    )
    dex = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_quantity").alias("dex"))
    dagl = dfin.join(F.broadcast(dex), "l_returnflag").select(
        F.lit("aggstate").alias("which"),
        F.col("l_returnflag").alias("grp"),
        F.expr(DAGL_STACK),
    )
    return agl.unionByName(dagl)


# warm min-of-3
times = []
for _ in range(3):
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)

rows = sorted(
    (r["which"], r["grp"], r["stat"], r["sval"], round(float(r["nval"]), 9))
    for r in build().collect()
)
h = hashlib.md5(json.dumps(rows).encode()).hexdigest()
print(json.dumps({
    "variant": variant, "warm_min": round(min(times), 3),
    "times": [round(t, 3) for t in times], "n_rows": len(rows),
    "hash": h, "load_before": load_before, "load_after": os.getloadavg(),
}))
spark.stop()
'''


def run(variant: str) -> dict:
    code = (
        CHILD.replace("@REPO@", json.dumps(str(REPO)))
        .replace("@VARIANT@", json.dumps(variant))
        .replace("@SF_DIR@", json.dumps(SF_DIR))
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        return {"variant": variant, "error": out.stderr[-800:]}
    d = json.loads(line[-1])
    d["wall"] = round(time.time() - t0, 1)
    return d


def main() -> None:
    results = [run(v) for v in ("v0_current", "v1_onepass", "v2_fused", "v3_split")]
    print(json.dumps({"sf_dir": SF_DIR, "results": results}, indent=2))
    hashes = {r.get("hash") for r in results if "hash" in r}
    if len(hashes) == 1 and None not in hashes:
        print("IDENTICAL OUTPUT: yes")
    else:
        print("IDENTICAL OUTPUT: *** NO ***")


if __name__ == "__main__":
    main()
