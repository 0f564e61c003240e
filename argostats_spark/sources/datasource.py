"""`spark.read.format("argo_gdac")` — the GDAC ingest as a Spark 4
Python Data Source (public pyspark.sql.datasource API, SPARK-44076).

The binaryFile+mapInPandas path (sources/netcdf.py::ingest_gdac) stays
the workhorse; this wraps the same parser in the engine-native source
protocol so a user of the reference gets the one-liner they expect:

    register_argo_source(spark)
    raw = spark.read.format("argo_gdac").load("/gdac/*/*")

and, for continuous GDAC synchronisation (the reference re-walks the
tree per run; here new files become micro-batches with exactly-once
bookkeeping in the streaming offset log):

    live = spark.readStream.format("argo_gdac").load("/gdac/*/*")

Scale shape: file listing is driver-side metadata (the reference walks
the same directories, toctools.py:97-106); each file becomes one input
partition, so Spark schedules/retries per WMO file exactly like its
pool tasks. Corrupt files degrade to zero rows (S2's None tolerance).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..schemas import RAW_SCHEMA


def _glob_profile_files(path: str, pattern: str) -> list[str]:
    """Driver-side listing only (names, no bytes)."""
    import glob as _glob
    import os

    pats = [os.path.join(path, pattern)]
    if "*" in path or path.endswith(".nc"):
        pats.insert(0, path)
    return sorted({f for p in pats for f in _glob.glob(p) if f.endswith(".nc")})


def _read_profile_file(path: str):
    """Executor-side: one file → row tuples (shared by batch + stream).
    Corrupt and zero-profile files yield nothing (S2 tolerance)."""
    from .netcdf import parse_netcdf_bytes

    try:
        with open(path, "rb") as f:
            pdf = parse_netcdf_bytes(path, f.read())
    except NotImplementedError:
        raise
    except Exception:
        return
    if pdf.empty:
        return
    cols = [f.name for f in RAW_SCHEMA.fields]
    # the source protocol serializes TimestampType as tz-aware;
    # JULD is parsed naive-UTC (Argo days since 1950, no zone)
    pdf = pdf.assign(JULD=pdf["JULD"].dt.tz_localize("UTC"))
    for row in pdf[cols].itertuples(index=False):
        yield tuple(row)


class ArgoGdacDataSource(DataSource):
    """Registers the classic-NetCDF Argo profile reader as a named
    format. Options: ``path`` (glob), ``pattern`` (filename filter,
    default ``*_prof.nc``). Batch and micro-batch streaming."""

    @classmethod
    def name(cls) -> str:
        return "argo_gdac"

    def schema(self):
        return RAW_SCHEMA

    def reader(self, schema) -> "ArgoGdacReader":
        return ArgoGdacReader(self.options)

    def streamReader(self, schema) -> "ArgoGdacStreamReader":
        return ArgoGdacStreamReader(self.options)


class ArgoGdacReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.pattern = options.get("pattern", "*_prof.nc")
        if not self.path:
            raise ValueError("argo_gdac requires a path: .load('/gdac/*/*')")

    def partitions(self):
        # one partition per file keeps retry/locality per WMO, like the
        # reference's pool tasks
        return [InputPartition(f) for f in _glob_profile_files(self.path, self.pattern)]

    def read(self, partition):
        # pyspark 4.1 substitutes [None] when partitions() returns []
        # (empty glob) — yield nothing instead of crashing on .value
        if partition is None or getattr(partition, "value", None) is None:
            return
        yield from _read_profile_file(partition.value)


def _file_fingerprint(path: str) -> str:
    """mtime_ns:size — changes whenever the GDAC rewrites the file
    (every new cycle rewrites <wmo>_prof.nc in place)."""
    import os

    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


class ArgoGdacStreamReader(DataSourceStreamReader):
    """Micro-batch GDAC sync: each trigger ingests the *_prof.nc files
    that appeared OR CHANGED since the last committed offset.

    The offset maps every emitted file to its mtime:size fingerprint (a
    recursive dict of primitives, per the protocol), so replay between
    two checkpointed offsets is deterministic regardless of listing
    races, and a GDAC in-place rewrite (the normal update path — each
    new cycle rewrites <wmo>_prof.nc, reference re-walks everything,
    toctools.py:97-106) re-emits the whole file as change data. A
    changed file re-emits ALL its profiles; pair this source with a
    MERGE-by-WMO sink (streaming/gdac.py), not a blind append. At GDAC
    scale (~10⁶ files) the exact-map offset is ~100 MB of checkpoint
    JSON; a production deployment would compact it to (mtime watermark
    + tail-tie set), bounding the offset by churn rate. Per-file work is
    identical to batch: parse on executors, corrupt files → zero rows."""

    def __init__(self, options):
        self.path = options.get("path")
        self.pattern = options.get("pattern", "*_prof.nc")
        if not self.path:
            raise ValueError("argo_gdac requires a path: .load('/gdac/*/*')")

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def latestOffset(self) -> dict:
        return {
            "seen": {
                f: _file_fingerprint(f)
                for f in _glob_profile_files(self.path, self.pattern)
            }
        }

    def partitions(self, start: dict, end: dict):
        already = start.get("seen", {})
        return [
            InputPartition(f)
            for f, fp in end.get("seen", {}).items()
            if already.get(f) != fp
        ]

    def read(self, partition):
        if partition is None or getattr(partition, "value", None) is None:
            return
        yield from _read_profile_file(partition.value)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint log; nothing external to ack


def register_argo_source(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(ArgoGdacDataSource)
