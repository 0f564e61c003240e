#!/usr/bin/env python
"""Build a ×K scale replica of a testdata sf dir for the scaling
checkpoint bench (round-6 verdict item: verify the headline plans hold
an order of magnitude up).

The driver testdata tops out at sf0.1 and /root/testdata is read-only,
so this synthesizes sf(0.1·K) from sf0.1 by unioning K key-shifted
copies — shaped like a genuinely bigger corpus, not a degenerate one:

- fact keys (custkey/orderkey/partkey/suppkey/event_id/user_id/doc_id/
  vec_id) shift by copy·10¹² so key cardinality scales ×K and
  referential integrity holds within each copy;
- dimensions (region, nation) do NOT scale — real dims don't;
- document text gets a per-copy per-TOKEN suffix (copy 0 untouched):
  a bijective token rename preserves every within-copy shingle/jaccard
  relation exactly while making cross-copy shingle sets disjoint — so
  duplicate GROUP COUNT scales ×K with group sizes unchanged, the
  shape a 10× crawl actually has. Naive duplication would instead
  multiply group sizes and blow candidate pairs up quadratically.
- embeddings/events values ride unchanged (perf is row-count-driven).

Usage: python scripts/make_scale_replica.py [K] [src] [dest]
Defaults: K=10, src=/root/testdata/sf0.1, dest=/tmp/argostats_scale_sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from argostats_spark.session import get_spark  # noqa: E402

SHIFT = 10**12

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = sys.argv[3] if len(sys.argv) > 3 else "/tmp/argostats_scale_sf1"
    spark = get_spark(app_name="scale_replica")
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dest}/{t}.parquet"
        )
    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(k):
            c = base
            for col in keys:
                dt = dict(base.dtypes)[col]
                c = c.withColumn(col, (F.col(col) + F.lit(i * SHIFT)).cast(dt))
            if t == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1c{i}")
                ).withColumn("n_chars", F.length("text").cast("long"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        print(t, "rows:", spark.read.parquet(f"{dest}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
