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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    wpd = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark("bench_dedup_scale", extra_conf={
        "spark.driver.memory": os.environ.get("DEDUP_PROBE_MEM", "32g"),
    })
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


if __name__ == "__main__":
    main()
