"""Bathymetry land/ocean mask source (SURVEY §2.1 S10, §2.2 P10, §2.3 J3).

The reference ships a 1/10-degree global land mask as a bz2-compressed
int8 array and gates atlas grid cells through nearest-cell lookup
(reference: src/argostats/bathy/bathy.py:67-82 ``from_bin``, 38-50
``Topo.msk``; consumed by the atlas before compute). Spark-first
re-expression: the mask is a ``(lat, lon, is_ocean)`` DataFrame whose
rows are the mask-grid cell *centers* (``idx*reso - 180 + reso/2``,
bathy.py:77-78); gating is a broadcast left-semi equi-join on the
arithmetic cell indices (operators/atlas.apply_ocean_mask) —
BroadcastHashJoin, O(|grid| + |mask|), never a nested-loop geometry
pass.

Scale note: the full 1/10° global mask is 1800×3600 = 6.48M int8 cells
(~6.5 MB raw) — broadcast-sized by construction. Ocean-only after the
is_ocean filter it is smaller still (~70% of cells). At any resolution
a mask stays O(1/reso²) regardless of profile count, so the broadcast
strategy holds at 100 TB of profile data.
"""

from __future__ import annotations

import bz2

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mask_shape(reso_deg: float) -> tuple[int, int]:
    """(nlat, nlon) of a global mask at ``reso_deg`` (bathy.py:85-86)."""
    return int(round(180.0 / reso_deg)), int(round(360.0 / reso_deg))


def mask_from_array(spark: SparkSession, m: np.ndarray, reso_deg: float) -> DataFrame:
    """A (nlat, nlon) int8 array (1 = ocean) → mask DataFrame with cell
    centers, the reference's coordinate convention (bathy.py:77-78)."""
    nlat, nlon = m.shape
    lat_idx, lon_idx = np.divmod(np.arange(m.size, dtype="i8"), nlon)
    pdf = pd.DataFrame(
        {
            "lat": lat_idx * reso_deg - 90.0 + reso_deg / 2.0,
            "lon": lon_idx * reso_deg - 180.0 + reso_deg / 2.0,
            "is_ocean": m.ravel().astype("i4"),
        }
    )
    return spark.createDataFrame(pdf)


def load_mask_bz2(spark: SparkSession, path: str, reso_deg: float = 0.1) -> DataFrame:
    """Read the reference's bz2-compressed int8 mask file format
    (bathy.py:67-82: row-major (nlat, nlon), 1 = ocean deeper than the
    minimal depth). Pure stdlib bz2 + NumPy — no netCDF needed."""
    with open(path, "rb") as fid:
        raw = bz2.decompress(fid.read())
    shape = mask_shape(reso_deg)
    m = np.frombuffer(raw, dtype="i1").reshape(shape)
    return mask_from_array(spark, m, reso_deg)


def save_mask_bz2(m: np.ndarray, path: str) -> None:
    """Write a mask array in the reference's bz2 format (bathy.py:59-65)
    — used by tests to fixture the loader round-trip."""
    with open(path, "wb") as fid:
        fid.write(bz2.compress(np.ascontiguousarray(m, dtype="i1").tobytes()))


def synthetic_ocean_mask(spark: SparkSession, reso_deg: float = 0.5) -> DataFrame:
    """Deterministic synthetic global mask, generated distributed
    (spark.range cross join — no driver materialization). The ocean/land
    rule is pure integer arithmetic on the cell indices so a SQL oracle
    can regenerate the identical mask: is_ocean = (lat_idx*31 +
    lon_idx*17) % 7 < 5 (~71% ocean, like Earth; mod 7 is coprime to
    the power-of-ten index strides of coarser grids, so the gate
    actually drops cells at any grid/mask resolution ratio)."""
    nlat, nlon = mask_shape(reso_deg)
    lons = spark.range(nlon).select(F.col("id").alias("lon_idx"))
    lats = spark.range(nlat).select(F.col("id").alias("lat_idx"))
    half = reso_deg / 2.0
    return (
        lons.crossJoin(lats)
        .select(
            (F.col("lat_idx") * reso_deg - 90.0 + half).cast("double").alias("lat"),
            (F.col("lon_idx") * reso_deg - 180.0 + half).cast("double").alias("lon"),
            ((F.col("lat_idx") * 31 + F.col("lon_idx") * 17) % 7 < 5)
            .cast("int")
            .alias("is_ocean"),
        )
    )
