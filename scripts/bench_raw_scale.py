#!/usr/bin/env python
"""Raw-pipeline scale probe: distributed make_raw → summary build →
interpolation at N profiles, with zero driver-side row materialization
(VERDICT r02 #8: the old driver-built probe shipped 1.5 MiB tasks and
capped near 3M profiles on driver memory).

Usage: python scripts/bench_raw_scale.py [n_wmos] [profiles_per_wmo]
Prints one JSON line; paste results into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from argostats_spark.operators.interpolation import interpolate_profiles
from argostats_spark.operators.summary import build_summary
from argostats_spark.session import get_spark
from argostats_spark.sources.synthetic import make_raw


def main() -> None:
    n_wmos = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 125
    spark = get_spark(app_name="raw_scale_probe")

    raw = make_raw(spark, n_wmos=n_wmos, profiles_per_wmo=per)
    t0 = time.perf_counter()
    raw = raw.cache()
    n = raw.count()
    gen_sec = time.perf_counter() - t0

    # warm Python workers (all partitions) before the timed run
    interpolate_profiles(raw.sample(0.005, seed=1)).write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.perf_counter()
    build_summary(raw).write.format("noop").mode("overwrite").save()
    summary_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    interpolate_profiles(raw).write.format("noop").mode("overwrite").save()
    interp_sec = time.perf_counter() - t0

    print(json.dumps({
        "n_profiles": n,
        "gen_cache_sec": round(gen_sec, 1),
        "summary_sec": round(summary_sec, 1),
        "summary_profiles_per_sec": round(n / summary_sec),
        "interp_sec": round(interp_sec, 1),
        "interp_profiles_per_sec": round(n / interp_sec),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
