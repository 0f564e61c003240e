"""NetCDF GDAC ingest (SURVEY.md §2.1 S1-S4) — distributed file scan.

The reference walks $GDAC directories with a process pool and opens one
xarray dataset per WMO (reference: src/argostats/toctools.py:97-143,
190-192). Here the scan is ``spark.read.format("binaryFile")`` over the
GDAC glob — file listing, scheduling and retry are Spark's — and the
per-file parse runs in ``mapInPandas`` so one NetCDF becomes N profile
rows (the reference's S3 row-assembly) without ever touching the
driver.

xarray/netCDF4 are NOT installed in this container, so the parser is
gated behind an import-try: the distributed plumbing (binaryFile scan,
Arrow batching, missing-file tolerance, output schema) is real and
tested with a fake parser; the xarray branch activates wherever the
library exists.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_SCHEMA

try:  # pragma: no cover
    import xarray as _xr
except ImportError:
    _xr = None


def parse_netcdf_bytes(path: str, content: bytes) -> pd.DataFrame:
    """One <WMO>_prof.nc → one row per profile (reference
    load_wmo_profiles_from_netcdf, interpolation.py:182-197).

    STUB where xarray is unavailable (this container): raises
    NotImplementedError — inject a parser into ``ingest_gdac`` for
    plumbing tests."""
    if _xr is None:
        raise NotImplementedError(
            "NetCDF parsing requires xarray/netCDF4 (not installed); "
            "pass parser= to ingest_gdac"
        )
    # pragma: no cover — real branch exercised only where xarray exists
    import io

    ds = _xr.open_dataset(io.BytesIO(content))
    n_prof = ds.sizes.get("N_PROF", 0)
    rows = []
    for i in range(n_prof):
        rows.append(
            {
                "DAC": 0,
                "WMO": int(path.split("/")[-1].split("_")[0]),
                "IPROF": i,
                "LONGITUDE": float(ds["LONGITUDE"].values[i]),
                "LATITUDE": float(ds["LATITUDE"].values[i]),
                "JULD": pd.Timestamp(ds["JULD"].values[i]),
                "DATA_MODE": {"R": 0, "D": 1, "A": 2}.get(
                    str(ds["DATA_MODE"].values[i]), 0
                ),
                "POSITION_QC": int(ds["POSITION_QC"].values[i]),
                "JULD_QC": int(ds["JULD_QC"].values[i]),
                "PRES": ds["PRES"].values[i].tolist(),
                "TEMP": ds["TEMP"].values[i].tolist(),
                "PSAL": ds["PSAL"].values[i].tolist(),
                "PRES_ADJUSTED": None,
                "TEMP_ADJUSTED": None,
                "PSAL_ADJUSTED": None,
                "PRES_QC": ds["PRES_QC"].values[i].tolist(),
                "TEMP_QC": ds["TEMP_QC"].values[i].tolist(),
                "PSAL_QC": ds["PSAL_QC"].values[i].tolist(),
            }
        )
    return pd.DataFrame(rows)


def ingest_gdac(
    spark: SparkSession,
    gdac_glob: str,
    parser: Callable[[str, bytes], pd.DataFrame] | None = None,
) -> DataFrame:
    """Distributed GDAC scan → raw ragged table (RAW_SCHEMA).

    - binaryFile source: each task gets (path, content) batches —
      the reference's per-WMO pool task, scheduled by Spark (S1/S2);
    - ignoreMissingFiles / ignoreCorruptFiles reproduce the
      'get_dataset returns None' tolerance (toctools.py:190-192);
    - the parser emits 0..N rows per file (the UDTF shape, SURVEY §2.10).
    """
    parse = parser or parse_netcdf_bytes
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*_prof.nc")
        .option("ignoreMissingFiles", "true")
        .option("ignoreCorruptFiles", "true")
        .load(gdac_glob)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_SCHEMA.fields]
        for pdf in batches:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    frames.append(parse(path, bytes(content)))
                except NotImplementedError:
                    raise
                except Exception:
                    continue  # corrupt file tolerance, like S2's None
            if frames:
                yield pd.concat(frames)[cols]
            else:
                yield pd.DataFrame(columns=cols)

    return files.mapInPandas(run, RAW_SCHEMA)
