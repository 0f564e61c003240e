#!/usr/bin/env python
"""Interleaved fresh-JVM A/B of tfidf_lm_suite's vocab-from-tf fusion
(VERDICT r12 item 3 / round-13): the committed BENCH_scale_sf1.json
showed tfidf_lm_suite 1.725 -> 2.103 s (+22%, under the 1.25x tripwire
so never remeasured) on a refresh whose own ledger recorded rising
load. The round-12 change in that window was the LM vocab deriving
from the suite's checkpointed tf aggregate (one fewer corpus tokenize,
measured -6-7% fresh-JVM at sf0.1). Question: does the fusion have a
scale-dependent cost the sf0.1 A/B missed, or was the sf1 drift load?

Variants (identical output rows checked in-child against the shipped
suite):

- v0_fused   — the shipped q_tfidf_lm_suite (LM vocab = tf re-sum;
               2 corpus tokenizes).
- v1_unfused — the r11 shape: unigram_lm_nll rebuilds its own vocab
               from a corpus explode (3 corpus tokenizes). Realized by
               patching textstats.unigram_lm_nll to drop vocab_df=
               (the suite imports it at call time).

Protocol: INTERLEAVED rounds (v0, v1, v0, v1, ...), one child JVM per
run, warm min-of-3 per child, loadavg recorded per child — both
variants experience the same box drift, so per-round ratios adjudicate
even when the box is not quiet. JSON table printed for SCALE.md.

Usage: SPARK_GRAFT_SF_DIR=/tmp/argostats_scale_sf1 \
           python scripts/bench_tfidf_vocab_ab.py [rounds]
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
from argostats_spark.session import get_spark
import argostats_spark.operators.textstats as ts
from argostats_spark.queries import QUERIES

if variant == "v1_unfused":
    _orig = ts.unigram_lm_nll

    def _no_vocab(docs, *a, **kw):
        kw.pop("vocab_df", None)
        return _orig(docs, *a, **kw)

    ts.unigram_lm_nll = _no_vocab
elif variant != "v0_fused":
    raise SystemExit(f"unknown variant {variant!r}")

spark = get_spark(app_name="tfidf_ab_" + variant)
q = QUERIES["tfidf_lm_suite"]

# identity: variant output vs the shipped (fused) suite
got = sorted(map(tuple, q(spark, SF_DIR).collect()))
if variant == "v1_unfused":
    ts.unigram_lm_nll = _orig
    want = sorted(map(tuple, q(spark, SF_DIR).collect()))
    ts.unigram_lm_nll = _no_vocab
else:
    want = got
identical = got == want


def noop(df):
    df.write.format("noop").mode("overwrite").save()


noop(q(spark, SF_DIR))  # warm
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    noop(q(spark, SF_DIR))
    best = min(best, time.perf_counter() - t0)
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "variant": variant, "sec": round(best, 3), "identical": identical,
    "n_rows": len(got),
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
}))
spark.stop()
'''


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    variants = ["v0_fused", "v1_unfused"]
    runs: list[dict] = []
    for r in range(rounds):
        for v in variants:
            code = (CHILD.replace("@REPO@", repr(str(REPO)))
                    .replace("@VARIANT@", repr(v))
                    .replace("@SF_DIR@", repr(SF_DIR)))
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=3600, cwd=str(REPO),
            )
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("CHILD_RESULT ")), None)
            if line is None:
                rec = {"variant": v, "error": (proc.stderr or proc.stdout)[-500:]}
            else:
                rec = json.loads(line[len("CHILD_RESULT "):])
            rec["round"] = r
            rec["wall_sec"] = round(time.time() - t0, 1)
            runs.append(rec)
            print(f"r{r} {v}: {rec}", file=sys.stderr)
    summary = {}
    for v in variants:
        secs = [x["sec"] for x in runs if x["variant"] == v and "sec" in x]
        if secs:
            summary[v] = {"min": min(secs), "all": secs}
    if all(v in summary for v in variants):
        summary["min_ratio_v0_over_v1"] = round(
            summary["v0_fused"]["min"] / summary["v1_unfused"]["min"], 3
        )
    print(json.dumps({"sf_dir": SF_DIR, "rounds": rounds,
                      "runs": runs, "summary": summary}))


if __name__ == "__main__":
    main()
