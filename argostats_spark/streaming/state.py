"""Streaming maintenance of the mergeable aggregate states — the
lambda-architecture loop closed: operators/aggstate.py proves
state(A) ⊎ state(B) == state(A ∪ B); this module keeps such a state
CONTINUOUSLY current as data streams in, without ever rescanning the
backlog.

Design (the streaming/atlas.py pair-store pattern, reused):

- Each micro-batch aggregates to its own tiny state table and writes
  it to ``{store}/increments/b=<batch_id>`` — the batch OWNS its
  partition, so a foreachBatch replay (at-least-once contract)
  overwrites its own output byte-identically instead of
  double-counting. Nothing is read-modify-written inside the hot
  path: an increment write is O(batch), never O(history).
- :func:`read_state` is the merge law applied at read time: base
  version (if any) ⊎ all newer increments. State tables are per-key
  rows — merging dozens of them is trivia next to any corpus.
- :func:`compact_state` folds increments into a fresh base version
  published with the SAME atomic CURRENT-pointer swap the atlas store
  uses (a reader resolves either the old base — whose newer increments
  still exist — or the new one; never a torn state). Increments
  covered by the PREVIOUS base are pruned (two-version retention, the
  atlas convention, so a reader holding the old pointer mid-swap still
  finds everything it needs).

Exactness: for ``kind="agg"`` the decimal merge law makes the
continuously-maintained state BIT-IDENTICAL to a cold batch rebuild
(pinned by test); for ``kind="distinct"`` the HLL register-max merge
gives the same sketch estimate as a one-pass build (same pin); for
``kind="sample"`` (round 11) the bottom-k hash-priority sample is
deterministic, so the maintained sample is again BIT-IDENTICAL to a
cold rebuild; for ``kind="quantile"`` the KLL merge keeps the
one-pass rank-error bound (the pin asserts the bound against exact
percentiles, not sketch bits — the approx-family policy).
``kind="topk"`` (round 12) maintains heavy hitters via
``fold_topk_states`` — the re-mergeable Misra-Gries closure, so
increments fold under compaction; the maintained state's
[c, c+bound] intervals are valid but looser than a cold rebuild's
(each increment's truncation adds its bound — pinned against exact
stream-so-far counts, the approx-family policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggstate import (
    agg_state,
    distinct_state,
    fold_topk_states,
    full_state,
    merge_sketch_states,
    sketch_state,
    merge_agg_states,
    merge_distinct_states,
    merge_full_states,
    merge_quantile_states,
    merge_sample_states,
    quantile_state,
    sample_state,
    topk_state,
)
from ..operators.overlap import merge_theta_states, theta_state
from .atlas import publish_version
from .fsio import read_pointer, store_fs

__all__ = [
    "state_increment_writer",
    "read_state",
    "compact_state",
]

_KINDS = {
    "agg": (agg_state, merge_agg_states),
    "distinct": (distinct_state, merge_distinct_states),
    # round 11: the remaining re-mergeable summary legs. "quantile"
    # maintains per-key KLL sketches (merge keeps the one-pass
    # rank-error bound); "sample" maintains bottom-k hash-priority
    # samples, which are DETERMINISTIC — the continuously-maintained
    # sample is bit-identical to a cold batch rebuild (pinned by
    # test, the same strength as kind="agg"'s decimal law).
    "quantile": (quantile_state, merge_quantile_states),
    "sample": (sample_state, merge_sample_states),
    # round 12: heavy hitters join the family — fold_topk_states is
    # closed under merge (the Misra-Gries mergeability law), so
    # increments fold under compaction. The maintained state's
    # intervals [c, c+bound] are valid but looser than a cold batch
    # rebuild's (each increment's truncation adds its bound);
    # finalize with finalize_topk. Pass k_state= at build AND read
    # time (read truncates the fold the same way). INVARIANT the fold
    # relies on: the store holds exactly one state frame per
    # increment, and read/compact pass each frame as its own
    # positional argument — fold_topk_states' equal-bound sub-shard
    # hazard (ADVICE r12, aggstate.py) cannot arise here. A frame
    # that mixes several sub-shards needs fold_topk_states'
    # shard_col= instead.
    "topk": (topk_state, fold_topk_states),
    # "full" fuses agg+distinct+quantile into ONE aggregate per
    # micro-batch (operators/aggstate.py::full_state); "sketch" fuses
    # just HLL+KLL — the measured-preferred pairing with a separate
    # codegen "agg" stream (see full_state's caveat: the all-in
    # fusion trades whole-stage codegen for scans and loses).
    "full": (full_state, merge_full_states),
    "sketch": (sketch_state, merge_sketch_states),
    # "theta" maintains the set-OPERABLE distinct sketches
    # (operators/overlap.py) — a continuously-current overlap-audit
    # state: overlap_matrix runs on read_state's output directly.
    "theta": (theta_state, merge_theta_states),
}


_MARKER = "_STATE_COMMITTED"


def _increment_ids(fs, store: str) -> list[int]:
    """COMMITTED increments only: the writer drops a marker file after
    the parquet write completes, so a compaction or read racing a live
    micro-batch can never fold a partially-written increment and then
    permanently exclude its missing rows (review finding, round 9 —
    parquet part-files become listable before the write finishes). A
    replayed batch rewrites its partition and re-drops the marker."""
    inc = f"{store}/increments"
    return sorted(
        int(d.split("=", 1)[1])
        for d in fs.listdir(inc)
        if d.startswith("b=") and fs.exists(f"{inc}/{d}/{_MARKER}")
    )


def _current_version(fs, store: str) -> int | None:
    # retry-once on missing/empty: covers the object-store mid-swap
    # window where rename=copy+delete leaves CURRENT briefly absent
    # (fsio.read_pointer; VERDICT r10 item 5)
    txt = read_pointer(fs, f"{store}/CURRENT")
    return int(txt) if txt else None


def state_increment_writer(
    stream_df: DataFrame,
    keys: list[str],
    value_col: str,
    store: str,
    checkpoint_dir: str,
    kind: str = "agg",
    available_now: bool = True,
    **state_kwargs,
):
    """Start the maintenance stream: each micro-batch's state lands in
    its own ``increments/b=<batch_id>`` partition (replay-idempotent).
    Returns the StreamingQuery. ``state_kwargs`` pass through to the
    state builder (e.g. ``lg_k`` for kind='distinct')."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    build, _ = _KINDS[kind]

    def _write(batch: DataFrame, batch_id: int) -> None:
        dest = f"{store}/increments/b={batch_id}"
        build(batch, keys, value_col, **state_kwargs).write.mode(
            "overwrite"
        ).parquet(dest)
        # commit marker: readers/compaction only see the increment
        # once the parquet write above has fully finished (the
        # overwrite removes any stale marker first)
        store_fs(store, batch.sparkSession).write_text(
            f"{dest}/{_MARKER}", "1"
        )

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_state(
    spark: SparkSession,
    store: str,
    keys: list[str],
    kind: str = "agg",
    **merge_kwargs,
) -> DataFrame:
    """The current state: base version (if published) ⊎ every newer
    increment — the merge law applied at read time. Raises if the
    store holds nothing yet. ``merge_kwargs`` pass through to the
    kind's merge (kind='sample' REQUIRES ``k=`` — the merge cannot
    infer the sample size from the state rows; kind='quantile' takes
    an optional ``k=`` that must match the sketches' build k)."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    _, merge = _KINDS[kind]
    fs = store_fs(store, spark)
    ver = _current_version(fs, store)
    parts: list[DataFrame] = []
    if ver is not None:
        parts.append(spark.read.parquet(f"{store}/v={ver}"))
    parts += [
        spark.read.parquet(f"{store}/increments/b={b}")
        for b in _increment_ids(fs, store)
        if ver is None or b > ver
    ]
    if not parts:
        raise ValueError(f"read_state: no state at {store!r}")
    return merge(keys, *parts, **merge_kwargs)


def compact_state(
    spark: SparkSession,
    store: str,
    keys: list[str],
    kind: str = "agg",
    **merge_kwargs,
) -> int | None:
    """Fold base + increments into a fresh base ``v=<max batch id>``,
    publish it atomically (CURRENT-pointer swap, two-version
    retention), and prune increments the PREVIOUS base already covers.
    Returns the published version, or None when there is nothing newer
    than the current base (no-op — safe to call on a schedule)."""
    fs = store_fs(store, spark)
    ver = _current_version(fs, store)
    newer = [b for b in _increment_ids(fs, store) if ver is None or b > ver]
    if not newer:
        return None
    new_ver = max(newer)
    read_state(spark, store, keys, kind, **merge_kwargs).write.mode(
        "overwrite"
    ).parquet(
        f"{store}/v={new_ver}"
    )
    publish_version(store, new_ver, spark=spark)  # keeps 2 newest v= dirs
    # prune increments the PREVIOUS base covers: a reader that resolved
    # the old pointer still merges old-base + increments > old version,
    # all of which survive this prune
    if ver is not None:
        for b in _increment_ids(fs, store):
            if b <= ver:
                fs.delete(f"{store}/increments/b={b}")
    return new_ver
