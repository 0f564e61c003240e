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
- v2_single   — round-13 candidate: ONE corpus tokenize. The suite's
               shared intermediate drops a level, from tf=(source,
               tok) to per_doc=(doc_id, source, tok, c) (checkpointed);
               tf, the LM vocab AND the per-doc NLL all re-aggregate
               from it (the NLL as the c-weighted mean, identical to
               the instance mean by arithmetic). Trades the second
               tokenize for a doc-granular exchange + checkpoint.

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
elif variant not in ("v0_fused", "v2_single"):
    raise SystemExit(f"unknown variant {variant!r}")

spark = get_spark(app_name="tfidf_ab_" + variant)


def suite_single_tokenize(spark, SF):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from argostats_spark.queries_documents import _t
    from argostats_spark.functions.text import tokens
    from argostats_spark.operators.textstats import nll_deciles

    docs = _t(spark, SF, "documents")
    d = docs.select(
        "doc_id", "source",
        F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    n_src = (docs.where(F.col("source").isNotNull())
             .select("source").distinct().count())
    per_doc = (d.groupBy("doc_id", "source", "tok")
               .agg(F.count(F.lit(1)).alias("c"))
               .localCheckpoint(eager=True))
    tf = per_doc.groupBy("source", "tok").agg(F.sum("c").alias("tf"))
    dft = tf.groupBy("tok").agg(F.countDistinct("source").alias("df"))
    scored = tf.join(F.broadcast(dft), "tok").withColumn(
        "score",
        F.col("tf") * (F.log((F.lit(1.0) + F.lit(float(n_src)))
                             / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)))
    w = W.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("tok").asc())
    tfidf_rows = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(F.lit("tfidf").alias("part"),
                F.col("source").alias("k1"), F.col("tok").alias("k2"),
                F.col("rnk").cast("long").alias("rnk"),
                F.col("tf").cast("long").alias("n"),
                F.round("score", 6).alias("score")))
    vocab = per_doc.groupBy("tok").agg(F.sum("c").alias("c"))
    tot = vocab.agg(F.sum("c").cast("long").alias("t"),
                    F.count(F.lit(1)).alias("v")).first()
    t_total, v_size = int(tot["t"]), int(tot["v"])
    m_nlp = -F.log((F.col("c") + F.lit(1.0))
                   / F.lit(float(t_total + v_size)))
    nll = (per_doc.join(
        F.broadcast(vocab.select("tok", m_nlp.alias("m_nlp"))), "tok")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("m_nlp")) / F.sum("c"),
                     6).alias("d_nll")))
    dec = nll_deciles(nll, exact=True)
    lm_rows = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("d_nll"), 5).alias("avg_nll")
    ).select(
        F.lit("lm_decile").alias("part"), F.lit("all").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("decile").alias("rnk"), F.col("n_docs").alias("n"),
        F.col("avg_nll").alias("score"))
    vocab_row = spark.createDataFrame(
        [("vocab", "all", None, None, v_size, float(t_total))],
        "part string, k1 string, k2 string, rnk bigint, n bigint, "
        "score double")
    return tfidf_rows.unionByName(lm_rows).unionByName(vocab_row)


q = (suite_single_tokenize if variant == "v2_single"
     else QUERIES["tfidf_lm_suite"])

# identity: variant output vs the shipped (fused) suite
got = sorted(map(tuple, q(spark, SF_DIR).collect()))
if variant == "v1_unfused":
    ts.unigram_lm_nll = _orig
    want = sorted(map(tuple, q(spark, SF_DIR).collect()))
    ts.unigram_lm_nll = _no_vocab
elif variant == "v2_single":
    want = sorted(map(tuple,
                      QUERIES["tfidf_lm_suite"](spark, SF_DIR).collect()))
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
    variants = sys.argv[2:] or ["v0_fused", "v1_unfused"]
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
