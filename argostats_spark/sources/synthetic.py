"""Deterministic synthetic Argo-like raw data (FIXTURES.md §2).

There is no real GDAC in this environment, so the ingest/interpolation/
atlas pipeline is exercised on a generated ragged raw-measurement table
that reproduces the reference's data pathologies (reference: src/
argostats/toctools.py:153-183, interpolation.py:182-197):

- ragged level counts per WMO (N_LEVELS constant within a WMO),
- per-level QC codes with bad levels sprinkled in,
- profiles with <5 good levels (must be dropped),
- non-monotone / duplicated pressures (must be dropped),
- all-delayed-mode WMOs carrying *_ADJUSTED variables (which must be
  preferred), all-realtime WMOs without them,
- per-profile POSITION_QC/JULD_QC feeding FLAG.

Generation is distributed (spark.range over WMO ids + mapInPandas,
per-WMO RNG streams) so scale probes reach 10M+ profiles without
driver memory ever holding a row; make_raw_pandas is the driver-side
twin for tests, producing identical rows. Real ingest is
sources/netcdf.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import PLATFORMS, RAW_SCHEMA


def _wmo_rows(w: int, profiles_per_wmo: int, seed: int) -> list[dict]:
    """All raw rows of one WMO. Seeded per (seed, w) so generation is
    deterministic AND independent per float — the same rows come out
    whether built driver-side (tests) or inside an executor task
    (make_raw's distributed path)."""
    rng = np.random.default_rng([seed, w])
    rows = []
    wmo = 2900000 + w
    dac = int(rng.integers(0, 11))
    n_levels = int(rng.integers(20, 120))
    # WMO w=0 is all-delayed (adjusted vars used); w=1 all-realtime;
    # others mixed with a delayed-mode skew like the real GDAC.
    if w == 0:
        modes = np.full(profiles_per_wmo, 1)
    elif w == 1:
        modes = np.full(profiles_per_wmo, 0)
    else:
        modes = rng.choice([0, 1, 2], size=profiles_per_wmo, p=[0.2, 0.6, 0.2])
    all_delayed = bool((modes == 1).all())

    lon0 = float(rng.uniform(-180, 180))
    lat0 = float(rng.uniform(-60, 60))
    # one platform model per float; w=2 emits a string missing from
    # the static dictionary (must encode to the fallback code 0)
    if w == 2:
        platform = "MYSTERY_FLOAT_9000"
    else:
        platform = PLATFORMS[int(rng.integers(1, len(PLATFORMS)))]
    for ip in range(profiles_per_wmo):
        # levels with a >=2 dbar minimum gap: real Argo spacing —
        # and arbitrarily close noisy knots would make *any* cubic
        # interpolant (scipy's included) overshoot unphysically
        pres = np.sort(
            rng.choice(np.arange(0.0, 2000.0, 2.0), size=n_levels, replace=False)
        ).astype("f4")
        if rng.random() < 0.05 and n_levels > 10:
            # inject duplicate + non-monotone pressures (gate P11)
            pres[3] = pres[2]
            pres[5] = pres[4] - 1.0
        temp = (25.0 - 20.0 * (pres / 2000.0) + rng.normal(0, 0.3, n_levels)).astype("f4")
        psal = (34.0 + 1.5 * (pres / 2000.0) + rng.normal(0, 0.05, n_levels)).astype("f4")
        qc = np.where(rng.random(n_levels) < 0.9, 1, 4).astype("i1")
        if rng.random() < 0.05:
            # a profile with almost no good levels (gate: >=5 good)
            qc[:] = 4
            qc[: int(rng.integers(0, 5))] = 1
        pos_qc = 1 if rng.random() < 0.9 else 4
        juld_qc = 1 if rng.random() < 0.95 else 0
        juld = np.datetime64("2005-01-01") + np.timedelta64(
            int(rng.integers(0, 7300)), "D"
        ) + np.timedelta64(int(rng.integers(0, 86400)), "s")

        row = {
            "DAC": dac,
            "WMO": wmo,
            "IPROF": ip,
            "LONGITUDE": float(np.clip(lon0 + rng.normal(0, 2), -180, 179.99)),
            "LATITUDE": float(np.clip(lat0 + rng.normal(0, 2), -80, 80)),
            "JULD": pd.Timestamp(juld),
            "DATA_MODE": int(modes[ip]),
            "PLATFORM": platform,
            "POSITION_QC": pos_qc,
            "JULD_QC": juld_qc,
            "PRES": pres.tolist(),
            "TEMP": temp.tolist(),
            "PSAL": psal.tolist(),
            "PRES_ADJUSTED": (pres + 0.1).astype("f4").tolist() if all_delayed else None,
            "TEMP_ADJUSTED": (temp + 0.05).astype("f4").tolist() if all_delayed else None,
            "PSAL_ADJUSTED": (psal + 0.01).astype("f4").tolist() if all_delayed else None,
            "PRES_QC": qc.tolist(),
            "TEMP_QC": qc.tolist(),
            "PSAL_QC": np.where(rng.random(n_levels) < 0.95, 1, 3).astype("i1").tolist(),
        }
        rows.append(row)
    return rows


def make_raw_pandas(
    n_wmos: int = 12,
    profiles_per_wmo: int = 20,
    seed: int = 42,
) -> pd.DataFrame:
    """Ragged raw profiles as a pandas frame with list-valued columns —
    driver-side twin of make_raw for tests and tiny fixtures."""
    rows = []
    for w in range(n_wmos):
        rows.extend(_wmo_rows(w, profiles_per_wmo, seed))
    return pd.DataFrame(rows)


def make_raw(
    spark: SparkSession,
    n_wmos: int = 12,
    profiles_per_wmo: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Distributed generation: ``spark.range`` over WMO ids fanned into
    ``mapInPandas``, each task building its own floats with the per-WMO
    RNG stream. No driver-side ``createDataFrame`` — the 30k-profile
    bench probe previously shipped ~1.5 MiB tasks from the driver, and
    scale probes beyond ~3M profiles would exhaust driver memory; this
    path generates 10M+ profiles without the driver ever holding a row,
    and produces EXACTLY the same rows as make_raw_pandas."""
    n_parts = max(1, min(n_wmos, spark.sparkContext.defaultParallelism))
    # numPartitions on range itself: the fan-out costs no exchange
    ids = spark.range(0, n_wmos, 1, n_parts)
    cols = [f.name for f in RAW_SCHEMA.fields]

    def gen(batches):
        for pdf in batches:
            rows = []
            for w in pdf["id"]:
                rows.extend(_wmo_rows(int(w), profiles_per_wmo, seed))
            out = pd.DataFrame(rows, columns=cols)
            out["JULD"] = pd.to_datetime(out["JULD"])
            yield out

    return ids.mapInPandas(gen, RAW_SCHEMA)
