"""Streaming climatology refresh — closes the SCALE.md open item
"EAPE pass 2 does not stream".

Pass 1 of the atlas (per-cell kernel-weighted means) is algebraic, so
it streams as partial sums (events.py::incremental_cell_means). Pass 2
(EAPE) cannot stream: the per-pair displacement is computed AGAINST the
pass-1 cell means, so every pass-1 update invalidates pass-2 rows —
a feedback edge Structured Streaming's dataflow model does not express.

The documented remedy is the batch-refresh trigger implemented here:

- INCREMENTAL pair generation: each micro-batch of newly interpolated
  profiles joins the (static) grid via the binned neighborhood join —
  only the new profiles are matched, never the backlog. The pair rows
  land in a parquet pair store, partitioned by micro-batch id so a
  replayed batch OVERWRITES its own partition instead of duplicating it
  (foreachBatch's at-least-once contract made idempotent).
- PERIODIC full pass 1+2 over the accumulated pair store: the same
  clim_ts / clim_eape operators the batch pipeline uses (both passes
  consume the pair set, so nothing upstream recomputes), refreshing the
  atlas output in place.

Cost model at scale: the incremental part (pair join) is O(new
profiles) per trigger; the refresh is O(total pairs) but runs every
``refresh_every`` batches on the operator's schedule — exactly the
reference's full-rebuild economics (atlas.py:379-383) amortized, with
Spark doing the distribution. The pair store doubles as the
checkpointable state; deleting the atlas output is always safe (next
refresh rebuilds it).

Atlas publication is ATOMIC for concurrent readers: each refresh
writes a fresh ``{atlas_store}/v=<batch_id>`` directory and then
publishes it by an atomic rename of a pointer file
(``{atlas_store}/CURRENT``) — readers resolve the pointer via
:func:`current_atlas` and only ever see a fully-written version. The
two newest versions are retained so a reader that resolved the old
pointer mid-swap still finds its files; older versions are pruned.
The pointer plumbing is DRIVER-LOCAL filesystem I/O (os.rename is
atomic on one local/NFS mount) — atlas_store must be a plain path
visible to driver and readers; URI-scheme stores (hdfs://, s3a://)
are rejected loudly rather than mis-publishing a local pointer
(production there would swap the pointer through the Hadoop
FileSystem API, a conditional put, or a table format). The
pair-store appends are replay-safe via the per-batch partition.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.atlas import clim_eape, clim_ts, match_pairs

__all__ = ["atlas_refresh_writer", "current_atlas", "publish_version"]


def publish_version(atlas_store: str, version: int, keep: int = 2) -> None:
    """Atomically point ``{atlas_store}/CURRENT`` at ``v=<version>``:
    write the pointer to a temp file and os.rename it over CURRENT —
    rename on one filesystem is atomic, so a concurrent reader sees
    either the old pointer or the new one, never a torn write. Then
    prune all but the ``keep`` newest versions (keep >= 2 so a reader
    that resolved the OLD pointer just before the swap still finds its
    files)."""
    if "://" in atlas_store:
        raise NotImplementedError(
            "publish_version uses driver-local rename for atomicity; "
            f"URI store {atlas_store!r} needs the Hadoop FileSystem API "
            "or a table format (see module docstring)"
        )
    tmp = os.path.join(atlas_store, f".CURRENT.tmp.{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(atlas_store, "CURRENT"))
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(atlas_store)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    for v in versions[:-keep]:
        if v != version:
            shutil.rmtree(os.path.join(atlas_store, f"v={v}"), ignore_errors=True)


def current_atlas(spark: SparkSession, atlas_store: str) -> DataFrame:
    """Read the currently-published atlas version. Resolves the CURRENT
    pointer once, then reads that immutable versioned directory — a
    refresh landing mid-read cannot disturb it (versions are
    write-once; the retention window keeps the previous version on
    disk through the swap)."""
    if "://" in atlas_store:
        raise NotImplementedError(
            "current_atlas resolves a driver-local pointer file; "
            f"URI store {atlas_store!r} is not supported (module docstring)"
        )
    ptr = os.path.join(atlas_store, "CURRENT")
    try:
        with open(ptr) as f:
            version = int(f.read().strip())
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no atlas published yet under {atlas_store!r} "
            "(CURRENT pointer missing — wait for the first refresh)"
        ) from None
    return spark.read.parquet(os.path.join(atlas_store, f"v={version}"))


def atlas_refresh_writer(
    grid: DataFrame,
    pair_store: str,
    atlas_store: str,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    refresh_every: int = 1,
    algo: str = "R14",
    delayed_only: bool = True,
):
    """Build the foreachBatch callable: incremental pair append +
    periodic two-pass atlas rebuild. Wire it with::

        profiles_stream.writeStream.foreachBatch(
            atlas_refresh_writer(grid, pair_dir, atlas_dir, 2.0)
        ).option("checkpointLocation", ckpt).start()

    ``refresh_every=N`` refreshes on every Nth micro-batch (the final
    state after a stream drains is identical for any N that divides the
    last batch in — the pair store always holds every pair appended so
    far, so each refresh is a full, self-contained rebuild).
    """
    if refresh_every < 1:
        raise ValueError(f"refresh_every must be >= 1, got {refresh_every}")
    # Static side: cache, do NOT localCheckpoint. A localCheckpoint held
    # for the stream's lifetime is non-recomputable — losing one
    # executor (preemption, OOM kill) would invalidate the truncated
    # lineage and fail every later micro-batch. A cached grid re-derives
    # evicted blocks from its (deterministic) plan; the per-batch
    # localCheckpoints inside refresh() are safe because each trigger
    # rebuilds them from scratch.
    grid = grid.cache()
    grid.count()  # materialize once up front

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new_pairs = match_pairs(
            grid, batch_df, reso_deg, smoothing_factor, delayed_only=delayed_only
        )
        # idempotent under foreachBatch replay: the batch owns its
        # partition directory and overwrites it wholesale
        new_pairs.write.mode("overwrite").parquet(f"{pair_store}/batch={batch_id}")
        if batch_id % refresh_every != 0:
            return
        # explicit schema: when every batch so far produced zero pairs
        # the store holds only _SUCCESS markers and schema inference
        # would raise inside foreachBatch, killing the stream — an empty
        # frame with the pair schema rebuilds an empty atlas instead
        pairs = (
            spark.read.schema(new_pairs.schema)
            .parquet(f"{pair_store}/batch=*")
            .localCheckpoint(eager=True)
        )
        ts = clim_ts(
            grid, None, reso_deg, smoothing_factor, pairs=pairs
        ).localCheckpoint(eager=True)
        eape = clim_eape(
            grid, None, reso_deg, smoothing_factor, pairs=pairs, ts=ts, algo=algo
        )
        out = ts.join(
            eape.select("glon", "glat", "RHO", "EAPE"), on=["glon", "glat"]
        )
        # versioned write + atomic pointer swap: replayed batches
        # overwrite their own v= directory (idempotent), readers via
        # current_atlas() never observe a partial directory
        os.makedirs(atlas_store, exist_ok=True)
        out.write.mode("overwrite").parquet(f"{atlas_store}/v={batch_id}")
        publish_version(atlas_store, batch_id)

    # let callers release the cached grid once the stream is stopped
    refresh.unpersist_grid = lambda blocking=False: grid.unpersist(blocking)
    return refresh
