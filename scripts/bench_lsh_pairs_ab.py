#!/usr/bin/env python
"""Serialized fresh-JVM A/B of dedup_groups_lsh's `cum_pairs` stage
(VERDICT r9 item 4): the largest single stage (1.84 s of 4.49 s at
sf0.1) in the slowest headline row.

Variants (all must produce the IDENTICAL verified pair set — checked):

- v0_current   — the shipped plan: candidate self-join on the two
                 md5-string band columns (mh1, mh2).
- v1_longkey   — self-join on ONE xxhash64(mh1, mh2) long key, with
                 the exact (mh1, mh2) equality kept as a post-join
                 filter (structurally identical output: a 64-bit
                 collision only re-checks the strings).
- v2_prefilter — v1 + bucket-size>1 pre-filter: an h-keyed count
                 aggregate (map-side combined, key+count only) finds
                 buckets that can pair; both self-join sides
                 broadcast-semi-filter to those, so the singleton
                 mass never enters the join exchanges.
- v3_collect   — single-shuffle bucket pairing: groupBy(h) +
                 collect_list(struct), explode in-bucket combinations.
                 (Documented risk: a degenerate hot bucket
                 materializes in one task; included to measure the
                 exchange savings, not as the default.)

Protocol: one child JVM per (variant), serialized, warm min-of-3 of
the FULL pairs subplan (signatures included — the cum_pairs limb's
definition), loadavg recorded. Result table printed as JSON for
SCALE.md.
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
from argostats_spark.session import get_spark
from argostats_spark.queries_documents import (
    _lsh_doc_signatures, _lsh_shingles, _minhash_lsh_pairs_inline)

spark = get_spark(app_name="lsh_ab_" + variant)
d = spark.read.parquet(f"{SF_DIR}/documents.parquet")


def pairs_variant(d, variant):
    if variant == "v0_current":
        return _minhash_lsh_pairs_inline(d)
    if variant == "v4_lazy_nsh":
        # signature agg WITHOUT count_distinct (no Expand — the mixed
        # distinct/non-distinct agg doubles the shingle stream through
        # the exchange); n_sh is only needed for CANDIDATE docs, so it
        # comes from the already-distinct sh_cand, joined broadcast.
        sh_raw = _lsh_shingles(d)
        stats = sh_raw.groupBy("doc_id").agg(
            F.min(F.md5(F.concat(F.lit("s1|"), F.col("g")))).alias("mh1"),
            F.min(F.md5(F.concat(F.lit("s2|"), F.col("g")))).alias("mh2"),
        )
        a, b = stats.alias("a"), stats.alias("b")
        cand = a.join(
            b,
            (F.col("a.mh1") == F.col("b.mh1"))
            & (F.col("a.mh2") == F.col("b.mh2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
        ).localCheckpoint(eager=True)
        ids = (cand.select(F.col("id_a").alias("doc_id"))
               .union(cand.select(F.col("id_b").alias("doc_id"))).distinct())
        sh_cand = (sh_raw.join(F.broadcast(ids), "doc_id")
                   .select("doc_id", "g").distinct()
                   .localCheckpoint(eager=True))
        n_tbl = sh_cand.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_sh"))
        cand = (cand
                .join(F.broadcast(n_tbl.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("n_sh").alias("n_a"))), "id_a")
                .join(F.broadcast(n_tbl.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("n_sh").alias("n_b"))), "id_b"))
        sa = sh_cand.select(F.col("doc_id").alias("id_a"), "g")
        sb = sh_cand.select(F.col("doc_id").alias("id_b"), "g")
        inter = (cand.join(sa, "id_a").join(sb, ["id_b", "g"])
                 .groupBy("id_a", "id_b", "n_a", "n_b")
                 .agg(F.count(F.lit(1)).alias("n_inter")))
        jac = F.col("n_inter").cast("double") / (
            F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        return (inter.select("id_a", "id_b", jac.alias("jac_raw"))
                .filter(F.col("jac_raw") >= 0.6)
                .select("id_a", "id_b",
                        F.round("jac_raw", 6).alias("jaccard")))
    sh_raw = _lsh_shingles(d)
    stats = _lsh_doc_signatures(d, sh_raw).withColumn(
        "h", F.xxhash64("mh1", "mh2"))
    if variant == "v2_prefilter":
        hot = (stats.groupBy("h").count()
               .filter(F.col("count") > 1).select("h"))
        stats = stats.join(F.broadcast(hot), "h")
    if variant == "v3_collect":
        buck = (stats.groupBy("h")
                .agg(F.collect_list(F.struct("doc_id", "n_sh", "mh1", "mh2"))
                     .alias("ms"))
                .filter(F.size("ms") > 1))
        import itertools
        prs = buck.select(F.explode(F.expr(
            """filter(
                 flatten(transform(ms, (x, i) ->
                   transform(slice(ms, i + 2, size(ms)), y ->
                     struct(x.doc_id as da, y.doc_id as db,
                            x.n_sh as na, y.n_sh as nb,
                            x.mh1 as a1, x.mh2 as a2,
                            y.mh1 as b1, y.mh2 as b2)))),
                 p -> p.a1 = p.b1 AND p.a2 = p.b2)""")).alias("p"))
        cand = prs.select(
            F.least("p.da", "p.db").alias("id_a"),
            F.greatest("p.da", "p.db").alias("id_b"),
            F.when(F.col("p.da") < F.col("p.db"), F.col("p.na"))
             .otherwise(F.col("p.nb")).alias("n_a"),
            F.when(F.col("p.da") < F.col("p.db"), F.col("p.nb"))
             .otherwise(F.col("p.na")).alias("n_b"),
        ).filter(F.col("id_a") != F.col("id_b")).localCheckpoint(eager=True)
    else:
        a, b = stats.alias("a"), stats.alias("b")
        cand = a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).filter(
            (F.col("a.mh1") == F.col("b.mh1"))
            & (F.col("a.mh2") == F.col("b.mh2"))
        ).select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"), F.col("b.n_sh").alias("n_b"),
        ).localCheckpoint(eager=True)
    ids = (cand.select(F.col("id_a").alias("doc_id"))
           .union(cand.select(F.col("id_b").alias("doc_id"))).distinct())
    sh_cand = (sh_raw.join(F.broadcast(ids), "doc_id")
               .select("doc_id", "g").distinct().localCheckpoint(eager=True))
    sa = sh_cand.select(F.col("doc_id").alias("id_a"), "g")
    sb = sh_cand.select(F.col("doc_id").alias("id_b"), "g")
    inter = (cand.join(sa, "id_a").join(sb, ["id_b", "g"])
             .groupBy("id_a", "id_b", "n_a", "n_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (inter.select("id_a", "id_b", jac.alias("jac_raw"))
            .filter(F.col("jac_raw") >= 0.6)
            .select("id_a", "id_b", F.round("jac_raw", 6).alias("jaccard")))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# correctness first: identical verified pair set vs the shipped plan
got = sorted(map(tuple, pairs_variant(d, variant).collect()))
want = sorted(map(tuple, _minhash_lsh_pairs_inline(d).collect()))
identical = got == want

noop(pairs_variant(d, variant))  # warm
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    noop(pairs_variant(d, variant))
    best = min(best, time.perf_counter() - t0)
load_after = os.getloadavg()
print("CHILD_RESULT " + json.dumps({
    "variant": variant, "sec": round(best, 3), "identical": identical,
    "n_pairs": len(got),
    "load_before_1m": round(load_before[0], 2),
    "load_after_1m": round(load_after[0], 2),
}))
spark.stop()
'''


def main() -> None:
    variants = sys.argv[1:] or [
        "v0_current", "v1_longkey", "v2_prefilter", "v3_collect"
    ]
    results = {}
    for v in variants:
        code = (CHILD.replace("@REPO@", repr(str(REPO)))
                .replace("@VARIANT@", repr(v))
                .replace("@SF_DIR@", repr(SF_DIR)))
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=str(REPO), timeout=1800,
        )
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("CHILD_RESULT ")), None)
        if line is None:
            results[v] = {"error": (proc.stderr or proc.stdout)[-500:]}
        else:
            results[v] = json.loads(line[len("CHILD_RESULT "):])
            results[v]["wall_incl_jvm"] = round(time.time() - t0, 1)
        print(json.dumps(results[v]))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
