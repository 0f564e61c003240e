#!/usr/bin/env python
"""MinHash-LSH dedup scale probe: corpus synthesized executor-side
(hash-indexed vocab words, no driver data), 5% planted near-duplicates
(one appended token → Jaccard ≈ (n-3)/n of the base doc), timed through
``minhash_lsh_pairs``. Results belong in SCALE.md.

Usage: python scripts/bench_dedup_scale.py [n_docs] [words_per_doc]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from argostats_spark.operators.dedup import minhash_lsh_pairs
from argostats_spark.session import get_spark

VOCAB = [f"w{i:03d}" for i in range(400)]


def synth_docs(spark, n: int, words_per_doc: int = 60):
    """n base docs + 5% near-dup copies, all generated JVM-side."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    idx = F.sequence(F.lit(1), F.lit(words_per_doc))
    words = F.transform(
        idx,
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )
    dups = base.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" dupmark")).alias("text"),
    )
    return base.unionByName(dups)


def _max_task_ms(spark, since_epoch_ms: float) -> int:
    """Max executorRunTime (ms) over any task of any stage submitted
    after ``since_epoch_ms`` — via the Spark UI REST API (requires
    spark.ui.enabled=true). The skew metric the salting exists to fix:
    wall-clock of a stage == its slowest task."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    worst = 0
    for st in stages:
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if sub is None:
            continue
        from datetime import datetime

        t = datetime.strptime(sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        if t.timestamp() * 1000 < since_epoch_ms:
            continue
        url = (
            f"{base}/api/v1/applications/{app}/stages/{st['stageId']}/"
            f"{st['attemptId']}/taskSummary?quantiles=1.0"
        )
        try:
            with urllib.request.urlopen(url) as r:
                worst = max(worst, int(json.load(r)["executorRunTime"][0]))
        except Exception:
            pass
    return worst


def probe_lsh(spark, n: int, wpd: int):
    docs = synth_docs(spark, n, wpd)
    n_docs = docs.count()

    # warm JVM/codegen on a slice, then measure end-to-end
    minhash_lsh_pairs(docs.sample(0.02, seed=1), threshold=0.5).count()
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    n_pairs = pairs.count()
    sec = time.perf_counter() - t0
    planted = n // 20
    print(json.dumps({
        "probe": "minhash_lsh", "n_docs": n_docs, "words_per_doc": wpd,
        "n_pairs": n_pairs, "planted_dups": planted,
        "sec": round(sec, 1), "docs_per_sec": round(n_docs / sec),
    }), flush=True)


def probe_salt(spark, k_hot: int, n_bg: int, s_hot: int = 2000, s_doc: int = 60):
    """The verify-join skew the ``salt_verify`` option exists for,
    measured end-to-end: a STAR candidate set — one boilerplate template
    (id 0, ``s_hot`` shingles) paired with ``k_hot`` docs, the canonical
    shape after pair pruning of a template duplicated across a crawl —
    plus a uniform background. Unsalted, every (0, j) pair lands in ONE
    shuffle partition whose task does k_hot × s_hot row-joins while the
    rest idle; salted_join spreads it over n_salts tasks. Reports wall
    time AND max-task executorRunTime for both variants (row-identity is
    pinned by tests/test_dedup_similarity.py; this probe is the perf
    evidence)."""
    from argostats_spark.operators.skew import salted_join

    # shingle table, generated JVM-side: doc 0 is the wide template
    sh = spark.range(n_bg + k_hot + 1).select(F.col("id").alias("doc_id")).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.when(F.col("doc_id") == 0, F.lit(s_hot)).otherwise(F.lit(s_doc)),
                ),
                lambda i: F.concat(
                    F.lit("g"),
                    F.pmod(F.xxhash64(F.col("doc_id") * 100_000 + i), F.lit(500_000)).cast("string"),
                ),
            )
        ).alias("g"),
    ).localCheckpoint(eager=True)

    # star: template (0, j) for j in 1..k_hot; background chain pairs
    star = spark.range(1, k_hot + 1).select(
        F.lit(0).alias("id_a"), F.col("id").alias("id_b"),
        F.lit(s_hot).alias("n_a"), F.lit(s_doc).alias("n_b"),
    )
    bg = spark.range(k_hot + 1, k_hot + n_bg).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"),
        F.lit(s_doc).alias("n_a"), F.lit(s_doc).alias("n_b"),
    )
    cands = star.unionByName(bg).localCheckpoint(eager=True)
    sh_a = sh.select(F.col("doc_id").alias("id_a"), "g")
    sh_b = sh.select(F.col("doc_id").alias("id_b"), "g")

    def verify(first):
        return (
            first.join(sh_b, ["id_b", "g"])
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )

    results = {}
    for name, joined in (
        ("unsalted", cands.join(sh_a, "id_a")),
        ("salted", salted_join(cands, sh_a, on=["id_a"], n_salts=32)),
    ):
        verify(joined).count()  # warm codegen + shuffle files
        t_wall = time.time() * 1000
        t0 = time.perf_counter()
        n_pairs = verify(joined).count()
        sec = time.perf_counter() - t0
        results[name] = {
            "sec": round(sec, 2),
            "max_task_ms": _max_task_ms(spark, t_wall),
            "n_verified": n_pairs,
        }
    print(json.dumps({
        "probe": "salt_verify", "k_hot": k_hot, "n_bg": n_bg,
        "s_hot": s_hot, "s_doc": s_doc, **results,
        "speedup": round(results["unsalted"]["sec"] / results["salted"]["sec"], 2),
        "max_task_ratio": round(
            results["unsalted"]["max_task_ms"] / max(results["salted"]["max_task_ms"], 1), 1
        ),
    }), flush=True)


def probe_cc(spark, n_edges: int, chain_len: int):
    """Connected components at scale with an adversarial long-chain
    component: a path of ``chain_len`` nodes (diameter = chain_len — the
    worst case for label propagation; pointer jumping must close it in
    O(log d) rounds) drowned in ~``n_edges`` background edges forming
    5-node chains. Records rounds-to-converge and per-round wall time —
    the measured constant behind graph.py's O(log d) claim."""
    from argostats_spark.operators.graph import connected_components

    chain = spark.range(chain_len - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    n_bg = n_edges - (chain_len - 1)
    base = 10_000_000
    # background: 5-node chains => 4/5 of ids emit an edge to id+1
    bg = spark.range(base, base + n_bg * 5 // 4).filter(
        F.pmod(F.col("id"), F.lit(5)) != 4
    ).select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    edges = chain.unionByName(bg).repartition(64).localCheckpoint(eager=True)
    n_e = edges.count()

    rounds: list[float] = []
    t0 = time.perf_counter()
    cc = connected_components(
        edges, max_iter=40, round_hook=lambda r, s: rounds.append(round(s, 2))
    )
    # chain collapses to comp 0 for all chain nodes; background to x-x%5
    n_comp = cc.select("comp").distinct().count()
    sec = time.perf_counter() - t0
    chain_ok = (
        cc.filter(F.col("node") < chain_len).select("comp").distinct().count() == 1
    )
    print(json.dumps({
        "probe": "connected_components", "n_edges": n_e,
        "chain_len": chain_len, "n_components": n_comp,
        "chain_collapsed": chain_ok, "rounds": len(rounds),
        "per_round_sec": rounds, "total_sec": round(sec, 1),
    }), flush=True)


def probe_pagerank(spark, n_edges: int, hub_in: int = 100_000, iters: int = 5):
    """PageRank at scale with an adversarial hot destination: one hub
    receiving ``hub_in`` in-links (the shuffle-skew worst case for the
    groupBy(dst) aggregation — AQE skew-split is the mitigation) over a
    background of 5-node chains. Records per-round wall time, that the
    hub out-ranks everything, and that total mass stays 1 (the decimal
    aggregation makes the sum exact up to the scalar double update)."""
    from argostats_spark.operators.graph import pagerank

    base = 10_000_000
    hub_edges = spark.range(1, hub_in + 1).select(
        F.col("id").alias("id_a"), F.lit(0).alias("id_b")
    )
    n_bg = max(n_edges - hub_in, 0)
    bg = spark.range(base, base + n_bg * 5 // 4).filter(
        F.pmod(F.col("id"), F.lit(5)) != 4
    ).select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    edges = hub_edges.unionByName(bg).repartition(64).localCheckpoint(eager=True)
    n_e = edges.count()

    t0 = time.perf_counter()
    pr = pagerank(edges, iterations=iters).localCheckpoint(eager=True)
    n_nodes = pr.count()
    sec = time.perf_counter() - t0
    top = pr.orderBy(F.desc("rank")).limit(1).collect()[0]
    total = pr.agg(F.sum("rank")).collect()[0][0]
    print(json.dumps({
        "probe": "pagerank", "n_edges": n_e, "n_nodes": n_nodes,
        "hub_in_degree": hub_in, "iterations": iters,
        "total_sec": round(sec, 1), "sec_per_round": round(sec / iters, 2),
        "hub_is_top": top["node"] == 0, "hub_rank": round(top["rank"], 6),
        "mass": round(total, 9),
    }), flush=True)


def probe_passages(spark, n_docs: int, wpd: int, window: int = 20):
    """Duplicate-passage detection at scale (decontam.py): the 5%
    planted near-dup copies share their full base text, so every
    window of a copied doc is duplicated — a known ground truth at any
    size. Records span-stream volume, spans/sec through the two-
    exchange plan (span-hash count window + per-doc agg), and that the
    planted copies are exactly the all-windows-duplicated docs."""
    from argostats_spark.operators.decontam import flag_duplicate_passages

    docs = synth_docs(spark, n_docs, wpd).repartition(64).localCheckpoint(eager=True)
    n = docs.count()
    n_spans = n * (wpd - window + 1) + (n - n_docs) * 1  # copies add ' dupmark'
    t0 = time.perf_counter()
    out = flag_duplicate_passages(docs, window=window, stride=1).localCheckpoint(eager=True)
    full_dup = out.filter(F.col("dup_frac") == 1.0).count()
    any_dup = out.filter(F.col("has_dup") == 1).count()
    sec = time.perf_counter() - t0
    print(json.dumps({
        "probe": "duplicate_passages", "n_docs": n, "words_per_doc": wpd,
        "window": window, "approx_spans": n_spans,
        "docs_fully_duplicated": full_dup, "docs_any_dup": any_dup,
        "total_sec": round(sec, 1),
        "spans_per_sec": int(n_spans / sec),
    }), flush=True)


def probe_incremental(spark, n: int, wpd: int, inc_pct: int = 10):
    """The snapshot-refresh economics behind minhash_lsh_pairs_incremental:
    re-dedup an ``inc_pct``% increment against a persisted signature
    index vs re-running the full batch. The batch re-scan cost grows
    with the HISTORY; the incremental cost grows with the INCREMENT —
    the probe reports both, the one-time index build, and result parity
    (incremental pairs == batch pairs touching the increment)."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    docs = synth_docs(spark, n, wpd).repartition(64).localCheckpoint(eager=True)
    n_docs = docs.count()
    cut = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(100))
    old = docs.filter(cut >= inc_pct).localCheckpoint(eager=True)
    new = docs.filter(cut < inc_pct).localCheckpoint(eager=True)
    n_new = new.count()

    # one-time artifact: the history's signature index
    t0 = time.perf_counter()
    index = minhash_index(old).localCheckpoint(eager=True)
    index.count()
    index_sec = time.perf_counter() - t0

    # warm codegen
    minhash_lsh_pairs(docs.sample(0.02, seed=1), threshold=0.5).count()

    t0 = time.perf_counter()
    batch_pairs = minhash_lsh_pairs(docs, threshold=0.5).localCheckpoint(eager=True)
    n_batch = batch_pairs.count()
    batch_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    inc_pairs = minhash_lsh_pairs_incremental(
        new, index, corpus=old, threshold=0.5
    ).localCheckpoint(eager=True)
    n_inc = inc_pairs.count()
    inc_sec = time.perf_counter() - t0

    # parity: incremental == batch restricted to pairs touching new ids
    # — SET equality on (id_a, id_b, rounded jaccard), both directions,
    # not just a count match
    new_ids = new.select(F.col("doc_id").alias("id"))
    touching = (
        batch_pairs.join(new_ids, batch_pairs["id_a"] == new_ids["id"], "left_semi")
        .unionByName(
            batch_pairs.join(new_ids, batch_pairs["id_b"] == new_ids["id"], "left_semi")
        )
        .distinct()
        .select("id_a", "id_b", F.round("jaccard", 9).alias("j"))
    )
    inc_r = inc_pairs.select("id_a", "id_b", F.round("jaccard", 9).alias("j"))
    parity_ok = (
        inc_r.exceptAll(touching).count() == 0
        and touching.exceptAll(inc_r).count() == 0
    )
    print(json.dumps({
        "probe": "incremental_lsh", "n_docs": n_docs, "n_new": n_new,
        "words_per_doc": wpd, "inc_pct": inc_pct,
        "index_build_sec": round(index_sec, 2),
        "batch_sec": round(batch_sec, 2), "batch_pairs": n_batch,
        "inc_sec": round(inc_sec, 2), "inc_pairs": n_inc,
        "parity_ok": parity_ok,
        "speedup_vs_batch": round(batch_sec / inc_sec, 2),
    }), flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].isdigit() else "lsh"
    args = [int(a) for a in sys.argv[1:] if a.isdigit()]
    conf = {
        "spark.driver.memory": os.environ.get("DEDUP_PROBE_MEM", "32g"),
        "spark.ui.enabled": "true",  # the REST API is the max-task probe
    }
    if mode == "salt":
        # the scenario salting targets: a probe side too big to
        # broadcast (at 100 TB the shingle table never broadcasts; at
        # probe scale it would, which would bypass the join under test)
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    spark = get_spark("bench_dedup_scale", extra_conf=conf)
    if mode == "salt":
        probe_salt(spark, args[0] if args else 5000, args[1] if len(args) > 1 else 20_000)
    elif mode == "passages":
        probe_passages(spark, args[0] if args else 50_000, args[1] if len(args) > 1 else 60)
    elif mode == "incremental":
        probe_incremental(
            spark, args[0] if args else 50_000, args[1] if len(args) > 1 else 60
        )
    elif mode == "pagerank":
        probe_pagerank(
            spark,
            args[0] if args else 1_200_000,
            args[1] if len(args) > 1 else 100_000,
        )
    elif mode == "cc":
        probe_cc(
            spark,
            args[0] if args else 1_200_000,
            args[1] if len(args) > 1 else 100_000,
        )
    else:
        probe_lsh(spark, args[0] if args else 50_000, args[1] if len(args) > 1 else 60)


if __name__ == "__main__":
    main()
