#!/usr/bin/env python
"""Bloom-gate decontamination probe: plain broadcast verify join vs
bloom literal pre-gate + verify over the sf0.1 documents 3-gram
stream, at growing dirty-set sizes. What the gate buys is NOT wall
time at this scale (both forms are one corpus scan here) — it is the
BROADCAST/SHUFFLE economics: the plain join ships 8B+ per distinct
dirty n-gram to every executor, the gate ships num_bits/8 bytes
TOTAL regardless of dirty-set size, and only candidates (true hits +
fpp·corpus grams) reach the exact join. Reported: per-form warm-min
times, candidate counts, pruning ratio, literal size vs broadcast
estimate.

Usage: bench_bloom_scale.py [sf_dir] [dirty_frac...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from argostats_spark.functions.text import word_ngrams
from argostats_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_to_bytes,
)
from argostats_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FRACS = [float(x) for x in sys.argv[2:]] or [0.02, 0.2]


def warm_min(fn, runs=3):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("bench_bloom")
    d = spark.read.parquet(f"{SF}/documents.parquet")
    sh = F.array_distinct(word_ngrams("text", 3))
    grams = d.select("doc_id", F.explode(sh).alias("g")).cache()
    n_grams = grams.count()
    out = {"sf_dir": SF, "corpus_gram_rows": n_grams, "cases": []}
    for frac in FRACS:
        dirty = (
            d.filter(F.pmod(F.xxhash64("doc_id"), F.lit(1000)) < int(frac * 1000))
            .select(F.explode(sh).alias("g")).distinct().cache()
        )
        n_dirty = dirty.count()
        # size the bloom at ~16 bits/key rounded up to bucket multiples
        m = max(32768, ((n_dirty * 16 + 32767) // 32768) * 32768)
        t0 = time.perf_counter()
        blit = bloom_to_bytes(bloom_build(dirty, "g", m, 3), m)
        build_sec = round(time.perf_counter() - t0, 3)

        plain_sec = warm_min(
            lambda: grams.join(F.broadcast(dirty), "g", "semi")
            .groupBy("doc_id").count()
            .write.format("noop").mode("overwrite").save()
        )
        gate = grams.filter(bloom_might_contain("g", blit, m, 3))
        gated_sec = warm_min(
            lambda: gate.join(F.broadcast(dirty), "g", "semi")
            .groupBy("doc_id").count()
            .write.format("noop").mode("overwrite").save()
        )
        n_cand = gate.count()
        n_true = grams.join(F.broadcast(dirty), "g", "semi").count()
        out["cases"].append({
            "dirty_frac": frac,
            "dirty_grams": n_dirty,
            "bloom_bits": m,
            "bloom_bytes": m // 8,
            "broadcast_bytes_est": n_dirty * 30,  # ~string gram payload
            "build_sec": build_sec,
            "plain_join_sec": plain_sec,
            "gate_then_join_sec": gated_sec,
            "candidates": n_cand,
            "true_hits": n_true,
            "pruned_frac": round(1 - n_cand / n_grams, 4),
            "false_pos_cand": n_cand - n_true,
        })
        dirty.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
