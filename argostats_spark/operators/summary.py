"""Summary build (SURVEY.md §3.1 / M1) — one row per profile.

The reference scans ~20k NetCDF files with a multiprocessing pool,
builds a per-WMO pandas frame (get_wmo_infos, reference: src/argostats/
toctools.py:153-183) and concatenates on the driver (toctools.py:145 —
the memory-bound stage). Here the whole thing is one distributed plan
over the raw table: window-derived per-WMO columns, FLAG from QC
product-combine, no driver union.

At 100 TB the raw table is read partitioned by WMO (parquet layout from
the ingest stage) so the window over WMO shuffles once, and the result
is written back partitioned the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.qc import combine_qc
from ..schemas import PLATFORMS


def platform_dim(spark: SparkSession) -> DataFrame:
    """The static platform dictionary (reference toctools.py:26-55,
    195-196: int8 code = PLATFORMS.index) as a broadcastable dim table
    (PLATFORM string, PLATFORM_TYPE byte)."""
    return spark.createDataFrame(
        [(name, i) for i, name in enumerate(PLATFORMS)],
        "PLATFORM string, PLATFORM_TYPE tinyint",
    )


def decode_platform(summary: DataFrame) -> DataFrame:
    """Inverse dim join: PLATFORM_TYPE byte → platform string (round-trip
    check surface; code 0 decodes to the blank/unknown entry)."""
    dim = platform_dim(summary.sparkSession)
    return summary.join(F.broadcast(dim), on="PLATFORM_TYPE", how="left")


def build_summary(raw: DataFrame) -> DataFrame:
    """raw ragged table → summary table (SUMMARY_SCHEMA shape).

    Columns derived exactly like the reference:
    - IPROF: per-WMO profile index ordered by JULD (W1, toctools.py:175)
    - N_PROF: profiles per WMO (toctools.py:167-170)
    - N_LEVELS: levels in the raw file (size of the PRES array)
    - FLAG: POSITION_QC × JULD_QC product (A9, toctools.py:178-187)
    - PLATFORM_TYPE: int8 dictionary code via a broadcast dim join
      (toctools.py:195-196 np.vectorize(PLATFORMS.index) → J4 broadcast
      hash join here; ~40 rows broadcast, zero extra shuffles). Unknown
      or missing platform strings encode to 0 (the blank entry) — the
      reference would raise; a 100 TB ingest must not die on one new
      float model.
    """
    dim = platform_dim(raw.sparkSession)
    has_platform = "PLATFORM" in raw.columns
    if has_platform:
        raw = raw.join(F.broadcast(dim), on="PLATFORM", how="left")
    code = (
        F.coalesce(F.col("PLATFORM_TYPE"), F.lit(0)) if has_platform else F.lit(0)
    )
    w = W.partitionBy("WMO")
    w_order = w.orderBy("JULD", "IPROF")
    return raw.select(
        "DAC",
        "WMO",
        (F.row_number().over(w_order) - 1).cast("short").alias("IPROF"),
        F.size("PRES").cast("short").alias("N_LEVELS"),
        F.count(F.lit(1)).over(w).cast("short").alias("N_PROF"),
        "LONGITUDE",
        "LATITUDE",
        "JULD",
        "DATA_MODE",
        code.cast("byte").alias("PLATFORM_TYPE"),
        combine_qc("POSITION_QC", "JULD_QC").cast("byte").alias("FLAG"),
    )


def summary_stats(summary: DataFrame) -> DataFrame:
    """The reference's README analytics (A6-A8, A10, A12): per-DAC float
    and profile counts plus first/last profile dates."""
    return summary.groupBy("DAC").agg(
        F.countDistinct("WMO").alias("n_floats"),
        F.count(F.lit(1)).alias("n_profiles"),
        F.min("JULD").alias("first_juld"),
        F.max("JULD").alias("last_juld"),
    )
