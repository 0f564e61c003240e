#!/usr/bin/env python
"""Micro-benchmark: applyInPandas weighted mean vs level-exploded
expression aggregation for the atlas core (SURVEY.md §7.3 'benchmark
both at sf0.1'). Synthetic profile cloud sized so the pair set is
O(500k) — comparable to a regional atlas at 1/4°.

Result (local[32], 2026-08): see ATLAS_BENCH note in operators/atlas.py.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from argostats_spark.operators.atlas import clim_ts, clim_ts_exploded, make_grid, match_pairs
from argostats_spark.schemas import NLEVELS, PROFILES_SCHEMA
from argostats_spark.session import get_spark


def synth_profiles(spark, n=10_000, seed=42):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "WMO": rng.integers(2900000, 2900200, n),
            "DAC": np.zeros(n, dtype="i1"),
            "IPROF": np.arange(n) % 500,
            "JULD": pd.Timestamp("2020-01-01"),
            "LATITUDE": rng.uniform(-40, 0, n).astype("f4"),
            "LONGITUDE": rng.uniform(0, 40, n).astype("f4"),
            "DATA_MODE": np.ones(n, dtype="i1"),
            "FLAG": np.ones(n, dtype="i1"),
            "NVALUES": np.full(n, NLEVELS, dtype="i4"),
            "CT": [(20 - 15 * np.linspace(0, 1, NLEVELS) + rng.normal(0, 0.5, NLEVELS)).astype("f4").tolist() for _ in range(1)] * n,
            "SR": [[35.0] * NLEVELS] * n,
            "IDX": [[1] * NLEVELS] * n,
        }
    )
    return spark.createDataFrame(pdf, schema=PROFILES_SCHEMA)


def main():
    spark = get_spark("bench_atlas")
    profiles = synth_profiles(spark).cache()
    profiles.count()
    grid = make_grid(spark, (0.0, 40.0, -40.0, 0.0), reso_deg=2.0)
    pairs = match_pairs(grid, profiles, reso_deg=2.0, smoothing_factor=4.0).cache()
    n_pairs = pairs.count()
    print(f"pairs: {n_pairs}")

    for name, fn in [("applyInPandas", clim_ts), ("exploded", clim_ts_exploded)]:
        for it in range(2):
            t0 = time.perf_counter()
            fn(grid, profiles, reso_deg=2.0, pairs=pairs).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{name} run{it}: {time.perf_counter() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
