#!/usr/bin/env python
"""Atlas scale probe (VERDICT r01 #10): clim_ts (applyInPandas kernel)
vs clim_ts_exploded (pure-expression partial agg) at sf>=1-equivalent
profile counts on a 1-degree global grid, under polar skew.

Profiles are synthesized DISTRIBUTIVELY (spark.range + JVM expressions,
no driver-side pandas): ~half the floats uniform over the globe, half
crammed into the 60..80N band, so polar cells see extreme fan-in both
from density and from the adaptive lon halo (1/cos(lat) wider at 80N).

Usage: python scripts/bench_atlas_scale.py [n_profiles] [reso_deg] [variants]
``variants`` is a comma list of {exploded,applyInPandas} (default both).
Prints one JSON line per measurement; paste results into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from argostats_spark.operators.atlas import clim_ts, clim_ts_exploded, make_grid, match_pairs
from argostats_spark.schemas import NLEVELS
from argostats_spark.session import get_spark


def synth_profiles_distributed(spark, n: int, polar_frac: float = 0.5):
    """n synthetic interpolated profiles, generated executor-side.

    Noise is a cheap hash-fold (sin-product fract), not rand(): rand()
    re-evaluates nondeterministically across stage retries; this stays
    deterministic per id and never leaves codegen."""
    base = spark.range(n).select(F.col("id"))
    u = lambda salt: F.abs(F.sin(F.col("id") * F.lit(12.9898 + salt) + F.lit(78.233)) * 43758.5453) % 1.0  # noqa: E731
    lat = F.when(
        u(0.7) < F.lit(polar_frac), F.lit(60.0) + u(1.3) * 20.0
    ).otherwise(F.lit(-80.0) + u(2.1) * 160.0)
    levels = F.sequence(F.lit(0), F.lit(NLEVELS - 1))
    ct = F.transform(
        levels,
        lambda i: (F.lit(20.0) - F.lit(15.0) * i / F.lit(NLEVELS - 1.0)
                   + F.sin(F.col("id") + i) * 0.3).cast("float"),
    )
    sr = F.transform(levels, lambda i: (F.lit(35.0) + F.sin(i) * 0.1).cast("float"))
    idx = F.transform(levels, lambda i: F.lit(1).cast("tinyint"))
    return base.select(
        (u(3.3) * 360.0 - 180.0).cast("float").alias("LONGITUDE"),
        lat.cast("float").alias("LATITUDE"),
        F.lit(1).cast("tinyint").alias("DATA_MODE"),
        F.lit(1).cast("tinyint").alias("FLAG"),
        ct.alias("CT"), sr.alias("SR"), idx.alias("IDX"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reso = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    # One local JVM holds driver+executors: the default 1g heap cannot
    # buffer the pair fan-out shuffle (~60-200 cells/profile × 3×64-float
    # arrays). On a real cluster this is per-executor memory instead.
    spark = get_spark("bench_atlas_scale", extra_conf={
        "spark.driver.memory": os.environ.get("ATLAS_PROBE_MEM", "64g"),
    })
    profiles = synth_profiles_distributed(spark, n)
    grid = make_grid(spark, (-180.0, 180.0, -80.0, 80.0), reso_deg=reso)

    t0 = time.perf_counter()
    pairs = match_pairs(grid, profiles, reso_deg=reso, smoothing_factor=4.0)
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0
    print(json.dumps({"probe": "pairs", "n_profiles": n, "reso": reso,
                      "n_pairs": n_pairs, "sec": round(t_pairs, 1)}), flush=True)

    wanted = (sys.argv[3].split(",") if len(sys.argv) > 3
              else ["exploded", "applyInPandas"])
    variants = [("exploded", clim_ts_exploded), ("applyInPandas", clim_ts)]
    for name, fn in [(n, f) for n, f in variants if n in wanted]:
        t0 = time.perf_counter()
        out = fn(grid, profiles, reso_deg=reso, smoothing_factor=4.0)
        out.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        print(json.dumps({"probe": name, "n_profiles": n, "reso": reso,
                          "sec": round(sec, 1),
                          "pairs_per_sec": round(n_pairs / sec)}), flush=True)


if __name__ == "__main__":
    main()
