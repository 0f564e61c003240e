#!/usr/bin/env python
"""cap_per_group scale probe: Zipf-shaped host distribution synthesized
executor-side (one mega-host holding ~30% of rows, a hot handful, a
long tail of small hosts), timed through both plans — the two-phase
tail-skipping form (default) and the plain single window. Results
belong in SCALE.md.

Usage: python scripts/bench_cap_scale.py [n_rows] [n_tail_hosts]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from argostats_spark.operators.sampling import cap_per_group
from argostats_spark.session import get_spark


def synth_hosts(spark, n: int, n_tail: int):
    """Zipf-ish: row i belongs to the mega host (30%), one of 5 hot
    hosts (20%), or a hash-spread tail host (50%) — all JVM-side."""
    b = F.pmod(F.xxhash64(F.col("id")), F.lit(100))
    host = (
        F.when(b < 30, F.lit("mega.example"))
        .when(b < 50, F.concat(F.lit("hot"), (b % 5).cast("string")))
        .otherwise(
            F.concat(
                F.lit("tail"),
                F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n_tail)).cast("string"),
            )
        )
    )
    return spark.range(n).select(F.col("id").alias("doc_id"), host.alias("host"))


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_tail = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(app_name="bench_cap_scale")
    df = synth_hosts(spark, n, n_tail).persist()
    df.count()

    cap = 50
    for label, kwargs in (
        ("two_phase", {}),
        ("plain_window", {"skip_under_cap": False}),
    ):
        runs = [timed(cap_per_group(df, "host", cap, "doc_id", **kwargs))
                for _ in range(3)]
        kept = cap_per_group(df, "host", cap, "doc_id", **kwargs).count()
        print(f"{label}: min {min(runs):.2f}s runs={[round(r, 2) for r in runs]} "
              f"kept={kept}")
    df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
