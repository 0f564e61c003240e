#!/usr/bin/env python
"""Interleaved fresh-JVM A/B for the tfidf_lm_suite T/V totals attach
(round 15, VERDICT r14 item 3): v_window = the round-14 form
(unpartitioned window sums over the vocabulary-sized table — a
single-partition WindowExec at any vocab size), v_bcast = the shipped
round-15 form (lazy 1-row aggregate + broadcast cross join).

Protocol: interleaved rounds (v_window, v_bcast, ...), one child JVM
per run, warm min-of-3 noop writes per child, loadavg + /proc/stat
steal delta recorded per child. Both variants are built in-child from
the same building blocks; the child also asserts the two variants'
ROWS are identical before timing (sorted collect compare) on the
first round.

Usage: python scripts/bench_tfidf_totals_ab.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)

CHILD = r'''
import json, os, sys, time
sys.path.insert(0, @REPO@)
variant = @VARIANT@
check = @CHECK@
SF_DIR = @SF_DIR@

def steal():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0

load_before = os.getloadavg()[0]
s0 = steal()
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from argostats_spark.session import get_spark
from argostats_spark.queries_documents import _t
from argostats_spark.functions.text import tokens
from argostats_spark.operators.textstats import nll_deciles

spark = get_spark(app_name="tfidf_totals_ab_" + variant)


def build(spark, form):
    n_src = (
        _t(spark, SF_DIR, "documents")
        .where(F.col("source").isNotNull())
        .select("source").distinct().count()
    )
    base = (
        _t(spark, SF_DIR, "documents")
        .select("doc_id", "source",
                F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .where(F.col("tok").isNotNull())
        .groupBy("source", "doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = base.groupBy("source", "tok").agg(F.sum("c").alias("tf"))
    wtok = W.partitionBy("tok")
    scored = tf.withColumn("df", F.count(F.col("source")).over(wtok)).withColumn(
        "score",
        F.col("tf") * (F.log((F.lit(1.0) + F.lit(float(n_src)))
                             / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
    )
    w = W.partitionBy("source").orderBy(F.col("score").desc(), F.col("tok").asc())
    tfidf_rows = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(F.lit("tfidf").alias("part"), F.col("source").alias("k1"),
                F.col("tok").alias("k2"), F.col("rnk").cast("long").alias("rnk"),
                F.col("tf").cast("long").alias("n"),
                F.round("score", 6).alias("score"))
    )
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    if form == "v_window":
        wall = W.partitionBy()
        voc = vocab.select(
            "tok", "c",
            F.sum("c").over(wall).alias("__t"),
            F.count(F.lit(1)).over(wall).alias("__v"),
        )
        vocab_row_src = voc
        vocab_row = vocab_row_src.agg(
            F.lit("vocab").alias("part"), F.lit("all").alias("k1"),
            F.lit(None).cast("string").alias("k2"),
            F.lit(None).cast("long").alias("rnk"),
            F.count(F.lit(1)).alias("n"),
            F.sum("c").cast("double").alias("score"),
        )
    else:
        tot = vocab.agg(F.sum("c").alias("__t"), F.count(F.lit(1)).alias("__v"))
        voc = vocab.crossJoin(F.broadcast(tot))
        vocab_row = tot.select(
            F.lit("vocab").alias("part"), F.lit("all").alias("k1"),
            F.lit(None).cast("string").alias("k2"),
            F.lit(None).cast("long").alias("rnk"),
            F.col("__v").alias("n"), F.col("__t").cast("double").alias("score"),
        )
    m_nlp = -F.log((F.col("c") + F.lit(1.0))
                   / (F.col("__t") + F.col("__v")).cast("double"))
    nll = (
        base.join(F.broadcast(voc.select("tok", m_nlp.alias("m_nlp"))), "tok")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("m_nlp")) / F.sum("c"), 6)
             .alias("d_nll"))
    )
    dec = nll_deciles(nll, exact=True)
    lm_rows = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("d_nll"), 5).alias("avg_nll"),
    ).select(
        F.lit("lm_decile").alias("part"), F.lit("all").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("decile").alias("rnk"), F.col("n_docs").alias("n"),
        F.col("avg_nll").alias("score"),
    )
    return tfidf_rows.unionByName(lm_rows).unionByName(vocab_row)


if check:
    a = sorted(map(tuple, build(spark, "v_window").collect()))
    b = sorted(map(tuple, build(spark, "v_bcast").collect()))
    assert a == b, "variant rows differ!"

df_fn = lambda: build(spark, variant)
# warm
df_fn().write.format("noop").mode("overwrite").save()
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    df_fn().write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print("AB_RESULT " + json.dumps({
    "variant": variant, "sec": round(best, 3),
    "load_before": round(load_before, 2),
    "steal_jiffies": steal() - s0,
}))
spark.stop()
'''


def run_child(variant: str, check: bool) -> dict:
    code = (
        CHILD.replace("@REPO@", json.dumps(str(REPO)))
        .replace("@VARIANT@", json.dumps(variant))
        .replace("@CHECK@", "True" if check else "False")
        .replace("@SF_DIR@", json.dumps(SF_DIR))
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(REPO), timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    return {"variant": variant, "error": (proc.stderr or proc.stdout)[-400:]}


def _await_quiet(cap_s: float = 120.0) -> None:
    t0 = time.time()
    while time.time() - t0 < cap_s and os.getloadavg()[0] > 0.8:
        time.sleep(5)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = []
    for i in range(rounds):
        # alternate launch order per round so neither variant always
        # inherits the other's load tail
        order = ("v_window", "v_bcast") if i % 2 == 0 else ("v_bcast", "v_window")
        for variant in order:
            _await_quiet()
            r = run_child(variant, check=(i == 0 and variant == order[0]))
            r["round"] = i
            out.append(r)
            print(json.dumps(r), flush=True)
    print("AB_TABLE " + json.dumps(out))


if __name__ == "__main__":
    main()
