#!/usr/bin/env python
"""Band-bucket skew probe for the dedup_groups_lsh pairs stage
(VERDICT r14 item 4): measure the distribution of LSH band-bucket
sizes — the (mh1, mh2) signature groups whose self-join generates
candidate pairs — at a given SF. A hot bucket of size s contributes
s·(s−1)/2 candidate pairs to ONE task of the bucket join, which is
the §2.5 skew shape (max/median >> 1 ⇒ a straggler task).

Usage: python scripts/probe_lsh_band_skew.py [sf_dir]
Prints a JSON line with the bucket-size histogram, the top bucket
sizes, and the implied pair counts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from argostats_spark.queries_documents import _lsh_doc_signatures  # noqa: E402
from argostats_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe_lsh_band_skew")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = (
        _lsh_doc_signatures(d)
        .groupBy("mh1", "mh2")
        .agg(F.count(F.lit(1)).alias("sz"))
        .select("sz")
        .cache()
    )
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_sz"),
        F.expr("percentile_approx(sz, 0.5)").alias("p50"),
        F.expr("percentile_approx(sz, 0.99)").alias("p99"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("total_pairs"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).alias("nontrivial"),
    ).first()
    top = [r["sz"] for r in sizes.orderBy(F.desc("sz")).limit(20).collect()]
    hot_pairs = sum(s * (s - 1) // 2 for s in top[:5])
    out = {
        "sf_dir": sf_dir,
        "n_buckets": stats["n_buckets"],
        "max_bucket": stats["max_sz"],
        "p50": stats["p50"],
        "p99": stats["p99"],
        "nontrivial_buckets": stats["nontrivial"],
        "total_candidate_pairs": int(stats["total_pairs"] or 0),
        "top20_bucket_sizes": top,
        "top5_pair_share": (
            round(hot_pairs / stats["total_pairs"], 4)
            if stats["total_pairs"]
            else None
        ),
    }
    print("SKEW_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
