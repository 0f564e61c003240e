"""`spark.read.format("argo_gdac")` — the GDAC ingest as a Spark 4
Python Data Source (public pyspark.sql.datasource API, SPARK-44076).

The binaryFile+mapInPandas path (sources/netcdf.py::ingest_gdac) stays
the workhorse; this wraps the same parser in the engine-native source
protocol so a user of the reference gets the one-liner they expect:

    register_argo_source(spark)
    raw = spark.read.format("argo_gdac").load("/gdac/*/*")

Scale shape: file listing is driver-side metadata (the reference walks
the same directories, toctools.py:97-106); each file becomes one input
partition, so Spark schedules/retries per WMO file exactly like its
pool tasks. Corrupt files degrade to zero rows (S2's None tolerance).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import RAW_SCHEMA


class ArgoGdacDataSource(DataSource):
    """Registers the classic-NetCDF Argo profile reader as a named
    format. Options: ``path`` (glob), ``pattern`` (filename filter,
    default ``*_prof.nc``)."""

    @classmethod
    def name(cls) -> str:
        return "argo_gdac"

    def schema(self):
        return RAW_SCHEMA

    def reader(self, schema) -> "ArgoGdacReader":
        return ArgoGdacReader(self.options)


class ArgoGdacReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.pattern = options.get("pattern", "*_prof.nc")
        if not self.path:
            raise ValueError("argo_gdac requires a path: .load('/gdac/*/*')")

    def partitions(self):
        # driver-side listing only (names, no bytes) — one partition per
        # file keeps retry/locality per WMO, like the reference's pool
        import glob as _glob
        import os

        pats = [os.path.join(self.path, self.pattern)]
        if "*" in self.path or self.path.endswith(".nc"):
            pats.insert(0, self.path)
        files = sorted({f for p in pats for f in _glob.glob(p) if f.endswith(".nc")})
        return [InputPartition(f) for f in files]

    def read(self, partition):
        from .netcdf import parse_netcdf_bytes

        # pyspark 4.1 substitutes [None] when partitions() returns []
        # (empty glob) — yield nothing instead of crashing on .value
        if partition is None or getattr(partition, "value", None) is None:
            return
        path = partition.value
        try:
            with open(path, "rb") as f:
                pdf = parse_netcdf_bytes(path, f.read())
        except NotImplementedError:
            raise
        except Exception:
            return  # corrupt-file tolerance (S2)
        if pdf.empty:  # zero-profile file (S2 tolerance)
            return
        cols = [f.name for f in RAW_SCHEMA.fields]
        # the source protocol serializes TimestampType as tz-aware;
        # JULD is parsed naive-UTC (Argo days since 1950, no zone)
        pdf = pdf.assign(JULD=pdf["JULD"].dt.tz_localize("UTC"))
        for row in pdf[cols].itertuples(index=False):
            yield tuple(row)


def register_argo_source(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(ArgoGdacDataSource)
