#!/usr/bin/env python
"""Arrow batch-size probe for multimodal_features (round 15, VERDICT
r14 item 8 — the only headline row whose Python boundary hadn't been
re-measured since r10). The decode is mapInPandas over ~1.5 KB PGM
payloads; `spark.sql.execution.arrow.maxRecordsPerBatch` (default
10,000) sets how many rows cross per Arrow batch. Guide §4.2: raise it
for narrow rows, lower it for large binary cells — these payloads are
in between, so measure.

Interleaved fresh-JVM children (one per batch size per round), warm
min-of-3 noop of the full registry row, loadavg + steal recorded.

Usage: python scripts/bench_multimodal_arrow_ab.py [rounds] [sizes...]
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
batch = @BATCH@
SF_DIR = @SF_DIR@

def steal():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0

load_before = os.getloadavg()[0]
s0 = steal()
from argostats_spark.session import get_spark
from argostats_spark.queries import QUERIES

extra = {}
if batch:
    extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(batch)
spark = get_spark(app_name=f"mm_arrow_ab_{batch}", extra_conf=extra)

def run():
    QUERIES["multimodal_features"](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()

run()  # warm (worker pool, codegen)
run()  # second warm: python worker buffers plateau
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
print("AB_RESULT " + json.dumps({
    "batch": batch, "sec": round(best, 3),
    "load_before": round(load_before, 2),
    "steal_jiffies": steal() - s0,
}))
spark.stop()
'''


def run_child(batch: int) -> dict:
    code = (
        CHILD.replace("@REPO@", json.dumps(str(REPO)))
        .replace("@BATCH@", str(batch))
        .replace("@SF_DIR@", json.dumps(SF_DIR))
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(REPO), timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    return {"batch": batch, "error": (proc.stderr or proc.stdout)[-400:]}


def _await_quiet(cap_s: float = 120.0) -> None:
    t0 = time.time()
    while time.time() - t0 < cap_s and os.getloadavg()[0] > 0.8:
        time.sleep(5)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sizes = [int(x) for x in sys.argv[2:]] or [0, 2048, 500]  # 0 = default
    out = []
    for i in range(rounds):
        ordered = sizes if i % 2 == 0 else list(reversed(sizes))
        for b in ordered:
            _await_quiet()
            r = run_child(b)
            r["round"] = i
            out.append(r)
            print(json.dumps(r), flush=True)
    print("AB_TABLE " + json.dumps(out))


if __name__ == "__main__":
    main()
