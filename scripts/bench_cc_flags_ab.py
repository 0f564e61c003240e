#!/usr/bin/env python
"""Serialized fresh-JVM A/B of dedup_groups_lsh's `cc_flags` stage
(VERDICT r10 item 3): after the round-10 cum_pairs win, CC + corpus
keep-flags is the largest dedup stage (1.02 s of 3.06 at sf0.1,
1.45 s at sf1).

The stage is duplicate_groups(docs, edges) over a PREBUILT
(localCheckpointed) edge list — exactly the bench.py cc_flags limb.
Cost structure today: the iterative CC loop runs over |nodes-in-pairs|
(small), but the flags projection runs `count().over(partitionBy
(comp_id))` + (scored path) a rank window over the FULL CORPUS — a
corpus-wide exchange+sort to compute sizes that are derivable from the
tiny label table.

Variants (all must produce the IDENTICAL (id, comp_id, comp_size,
keep) set — checked):

- v0_current   — the shipped plan (corpus-wide window).
- v1_joinflags — comp sizes from cc.groupBy(comp) (|comps| rows),
                 joined back; keep = (id == comp_id) row-local. The
                 corpus never shuffles: one small-side join the
                 optimizer broadcasts.
- v2_nojump    — v1 + the CC loop drops the pointer-jump join (pure
                 neighbor-min propagation). Dedup graphs are
                 near-cliques (diameter 1-2), so the jump join may
                 cost more per round than the rounds it saves;
                 measured, not assumed. Worst-case rounds = diameter,
                 so NOT safe as a default for arbitrary graphs.

Protocol: one child JVM per variant, serialized, warm min-of-3 of the
full stage, loadavg recorded. JSON table printed for SCALE.md.

SHIPPED (round 11, after the measured table in SCALE.md): v1's
join-flags restructure + a hybrid of v2 (connected_components
jump_start=2 — plain rounds first, pointer jumping from round 2 keeps
O(log d) for deep graphs). `v0_current` always measures whatever
duplicate_groups currently ships, so re-running this script after the
land measures the shipped plan, not the round-10 window plan the
table's v0 row recorded.
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
from pyspark.sql import Window as W
from argostats_spark.session import get_spark
from argostats_spark.operators.graph import (
    connected_components, duplicate_groups)
from argostats_spark.queries_documents import _minhash_lsh_pairs_inline

spark = get_spark(app_name="cc_ab_" + variant)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
edges = (_minhash_lsh_pairs_inline(docs).select("id_a", "id_b")
         .localCheckpoint(eager=True))
edges.count()


def cc_nojump(edges, max_iter=25):
    """Pure neighbor-min propagation (no pointer-jump join)."""
    half = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    sym = half.union(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (sym.select(F.col("u").alias("node")).distinct()
              .select("node", F.col("node").alias("comp"))
              .localCheckpoint())
    prev_sum = labels.agg(
        F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).first()["s"]
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = (sym.join(labels, sym["v"] == labels["node"])
               .groupBy("u").agg(F.min("comp").alias("nbr_min")))
        stepped = (labels.join(nbr, labels["node"] == nbr["u"], "left")
                   .select("node", F.least(
                       F.col("comp"),
                       F.coalesce(F.col("nbr_min"), F.col("comp"))
                   ).alias("comp")).localCheckpoint())
        cur_sum = stepped.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        labels = stepped
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels, rounds


def flags_join(docs, cc, id_col="doc_id"):
    """Sizes from the label table; keep row-local. No corpus window."""
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("__sz"))
    return (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("comp_id"),
        )
        .join(sizes, F.col("comp_id") == sizes["comp"], "left")
        .select(
            F.col(id_col),
            "comp_id",
            F.coalesce("__sz", F.lit(1)).cast("long").alias("comp_size"),
            (F.col(id_col) == F.col("comp_id")).cast("int").alias("keep"),
        )
    )


def stage(variant):
    if variant == "v0_current":
        return duplicate_groups(docs, edges, id_col="doc_id")
    if variant == "v1_joinflags":
        cc = connected_components(edges)
        return flags_join(docs, cc)
    if variant == "v2_nojump":
        cc, _ = cc_nojump(edges)
        return flags_join(docs, cc)
    raise SystemExit(f"unknown variant {variant!r}")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


got = sorted(map(tuple, stage(variant).collect()))
want = sorted(map(tuple, duplicate_groups(docs, edges, id_col="doc_id")
                  .collect()))
identical = got == want

extra = {}
if variant == "v2_nojump":
    _, rounds = cc_nojump(edges)
    extra["rounds"] = rounds

noop(stage(variant))  # warm
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    noop(stage(variant))
    best = min(best, time.perf_counter() - t0)
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "variant": variant, "sec": round(best, 3), "identical": identical,
    "n_rows": len(got),
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
    **extra,
}))
spark.stop()
'''


def main() -> None:
    variants = sys.argv[1:] or ["v0_current", "v1_joinflags", "v2_nojump"]
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
