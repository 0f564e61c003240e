"""Continuous GDAC → summary synchronisation.

The reference rebuilds its summary table by re-walking the entire GDAC
tree every run (src/argostats/toctools.py:97-106 walk, :145 driver-side
concat) — per-run cost is O(GDAC) no matter how little changed. Here the
``argo_gdac`` streaming source (sources/datasource.py) turns new and
rewritten ``*_prof.nc`` files into micro-batches, and ``foreachBatch``
MERGEs each batch's summary rows into a Parquet summary table: per
trigger the cost is O(changed files) for ingest plus one MERGE.

Correctness hinges on two alignment facts:

- The source partitions per file and a WMO's profiles live in exactly
  one ``<wmo>_prof.nc``, so every micro-batch contains whole WMOs —
  ``build_summary``'s per-WMO windows (IPROF/N_PROF) are correct on the
  batch alone, no cross-batch state needed.
- A rewritten file re-emits ALL its profiles (fingerprint offset), and
  the MERGE replaces the WMO's entire row set (upsert keyed on WMO), so
  re-ingest ≡ recompute for that float. Batch replay after a failure
  re-runs the same MERGE with the same rows — idempotent, which is what
  foreachBatch's at-least-once contract requires for an effectively-
  exactly-once table.

At 100 TB the summary table would be partitioned by a WMO hash bucket so
the MERGE rewrite is O(touched partitions) (operators/upsert.py header);
at this container's scale a snapshot-swap of the whole table is the
honest equivalent and keeps readers consistent (they see the old or the
new snapshot, never a half-written directory).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.summary import build_summary
from ..operators.upsert import upsert
from ..sources.datasource import register_argo_source


def merge_summary_snapshot(
    batch_summary: DataFrame, table_path: str
) -> None:
    """MERGE a summary delta into the Parquet table at ``table_path``
    by snapshot-swap: replace every WMO present in the delta, keep the
    rest, write the merged table beside the old one, swap directories.

    Idempotent for a replayed delta (same rows → same merged table), so
    it is safe under foreachBatch's at-least-once replay."""
    spark = batch_summary.sparkSession
    if os.path.isdir(table_path):
        base = spark.read.parquet(table_path)
        merged = upsert(base, batch_summary, keys=["WMO"])
    else:
        merged = batch_summary
    stage = f"{table_path}.stage-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(stage)
    old = f"{table_path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.isdir(table_path):
        os.rename(table_path, old)
    os.rename(stage, table_path)
    shutil.rmtree(old, ignore_errors=True)


def gdac_summary_sync(
    spark: SparkSession,
    gdac_glob: str,
    table_path: str,
    checkpoint_dir: str,
    pattern: str = "*_prof.nc",
    available_now: bool = True,
):
    """Start the continuous GDAC→summary pipeline; returns the
    StreamingQuery.

    ``available_now=True`` (default) drains everything currently visible
    and stops — the incremental equivalent of the reference's one-shot
    rebuild, resumable from the checkpoint. ``False`` keeps polling, the
    true long-running sync daemon."""
    register_argo_source(spark)
    raw = (
        spark.readStream.format("argo_gdac")
        .option("pattern", pattern)
        .load(gdac_glob)
    )

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.head(1):
            return
        merge_summary_snapshot(build_summary(batch_df), table_path)

    writer = (
        raw.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
