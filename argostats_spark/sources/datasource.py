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


def _file_fingerprint(path: str) -> str | None:
    """mtime_ns:size — changes whenever the GDAC rewrites the file
    (every new cycle rewrites <wmo>_prof.nc in place). None if the file
    vanished between listing and stat."""
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None
    return f"{st.st_mtime_ns}:{st.st_size}"


def _fp_mtime(fp: str) -> int:
    return int(fp.split(":", 1)[0])


def _is_newer_than(path: str, fp: str, offset: dict) -> bool:
    """True iff (path, fingerprint) postdates ``offset``, under either
    offset encoding: legacy exact map ({"seen": {path: fp}}) or the
    compacted watermark form ({"wm": mtime_ns, "slack": ns,
    "tail": {path: fp}}). Files with mtime inside the bounded-lateness
    window [wm - slack, wm] are judged by the tail fingerprint set, so a
    file that was created during a listing race (mtime below the
    watermark but listed late) is still detected as new on the next
    trigger instead of being silently skipped forever."""
    if "seen" in offset:  # legacy exact-map offset (pre-compaction ckpt)
        return offset["seen"].get(path) != fp
    mt = _fp_mtime(fp)
    wm = offset.get("wm", -1)
    if mt > wm:
        return True
    if mt < wm - offset.get("slack", 0):
        return False
    # inside the lateness window (or exactly at the watermark with
    # slack=0): the tail fingerprint set disambiguates
    return offset.get("tail", {}).get(path) != fp


class ArgoGdacStreamReader(DataSourceStreamReader):
    """Micro-batch GDAC sync: each trigger ingests the *_prof.nc files
    that appeared OR CHANGED since the last committed offset.

    The committed offset is COMPACTED to (mtime watermark, tail tie-set):
    ``{"wm": max mtime_ns across the listing, "tail": {path: fingerprint
    for files AT the watermark}}``. A file postdates an offset iff its
    mtime exceeds the watermark, or equals it with a fingerprint missing
    from the tail set — so offset size is bounded by boundary-tie count
    (≈ per-trigger churn), not corpus size: at GDAC scale (~10⁶ files)
    this is bytes of checkpoint JSON per offset instead of the ~100 MB
    an exact seen-file map costs. Legacy exact-map offsets
    (``{"seen": ...}``) in existing checkpoints are still understood, so
    a running query upgrades in place; ``offsetMode=exact`` restores the
    full-map behavior for auditability.

    A GDAC in-place rewrite (the normal update path — each new cycle
    rewrites <wmo>_prof.nc; the reference re-walks everything,
    toctools.py:97-106) bumps mtime past the watermark and re-emits the
    whole file as change data; pair this source with a MERGE-by-WMO sink
    (streaming/gdac.py), not a blind append. Replay between two
    checkpointed offsets re-selects by the same mtime window, so a batch
    is deterministic up to files rewritten AGAIN after the end offset —
    those are excluded from the replayed batch and re-emitted by the
    NEXT batch whose window covers them (the exact-map offset has the
    same property: read() always parses current bytes). The mtime
    watermark shares the standard caveat of file-watermark sources: a
    file *moved in* with an mtime preserved BELOW the lateness window is
    invisible (rsync -t of old archives into the tree); GDAC mirrors
    touch files on update, and offsetMode=exact covers archival
    re-syncs. Per-file work is identical to batch: parse on executors,
    corrupt files → zero rows.

    Two hardenings close the races an exact map never had:

    * **Monotone watermark.** latestOffset() never returns a watermark
      below one it already returned, or below any offset it has seen
      through partitions(start, end) or commit(end) — commit() is the
      channel through which a restarted reader relearns the committed
      watermark. A transiently-empty or shrunken listing (NFS hiccup,
      path blip) carries the previous offset forward instead of
      regressing to wm=-1 — which would otherwise commit, and re-emit
      the entire corpus when the files reappear. The same carry guards
      ``offsetMode=exact`` against an empty listing collapsing its map.
      Residual window (Python Data Source API limit): on a CLEAN
      restart (no batch to replay, nothing yet committed in this
      process) the very first latestOffset() has seen no offset at all;
      if THAT listing is empty the reader cannot distinguish a blip
      from a genuinely empty corpus and re-bootstraps. Every later
      trigger is protected.
    * **Bounded-lateness slack** (``latenessSlackSec``, default 5).
      The tail set keeps fingerprints for every file inside
      [wm - slack, wm], not just mtime ties AT the watermark. A file
      created with mtime t while the listing glob was in flight — so a
      later-mtime file advanced the watermark past t before t was ever
      listed — is still inside the window on the next trigger, absent
      from the tail, and therefore selected rather than lost. The
      mirror-image race (a file PREVIOUSLY emitted inside the window
      missing from one flaky listing) is covered too: tail entries from
      the carried offset that still fall inside the new window are
      unioned into the new tail, so the file's reappearance with an
      unchanged fingerprint is not re-emitted. Offset size becomes
      O(churn within the slack window), still bytes-scale against a
      ~10⁶-file corpus. The slack is stored in the offset so
      replayed batches use the window that was committed, and a file
      racing in later than the slack remains the documented rsync-style
      blind spot (raise the option or use offsetMode=exact)."""

    def __init__(self, options):
        self.path = options.get("path")
        self.pattern = options.get("pattern", "*_prof.nc")
        self.offset_mode = options.get("offsetMode", "watermark")
        if self.offset_mode not in ("watermark", "exact"):
            raise ValueError(f"offsetMode must be watermark|exact, got {self.offset_mode!r}")
        if not self.path:
            raise ValueError("argo_gdac requires a path: .load('/gdac/*/*')")
        self.slack_ns = int(float(options.get("latenessSlackSec", "5")) * 1_000_000_000)
        # driver-side monotone guard: the highest watermark this reader
        # has returned or seen committed, and the offset that carried it
        self._carry_wm = -1
        self._carry_offset: dict = {"wm": -1, "slack": self.slack_ns, "tail": {}}
        # exact-mode twin: the last non-empty seen-map observed
        self._carry_seen: dict[str, str] | None = None

    def _adopt(self, offset: dict) -> None:
        """Fold an offset seen via partitions()/commit() into the carry
        state so a later empty listing cannot regress below it."""
        if "seen" in offset:
            if offset["seen"]:
                self._carry_seen = offset["seen"]
            return
        if offset.get("wm", -1) > self._carry_wm:
            self._carry_wm, self._carry_offset = offset["wm"], offset

    def _listing(self) -> dict[str, str]:
        files = {}
        for f in _glob_profile_files(self.path, self.pattern):
            fp = _file_fingerprint(f)
            if fp is not None:
                files[f] = fp
        return files

    def initialOffset(self) -> dict:
        if self.offset_mode == "exact":
            return {"seen": {}}
        return {"wm": -1, "slack": self.slack_ns, "tail": {}}

    def latestOffset(self) -> dict:
        files = self._listing()
        if self.offset_mode == "exact":
            if not files and self._carry_seen:
                # empty listing after a non-empty committed map: carry —
                # committing {} would re-emit the corpus on recovery
                return {"seen": self._carry_seen}
            if files:
                self._carry_seen = files
            return {"seen": files}
        wm = max((_fp_mtime(fp) for fp in files.values()), default=-1)
        if wm < self._carry_wm:
            # empty or regressed listing (NFS blip): the watermark is
            # monotone — re-issue the last good offset unchanged
            return self._carry_offset
        lo = wm - self.slack_ns
        tail = {f: fp for f, fp in files.items() if _fp_mtime(fp) >= lo}
        # A PARTIAL listing can still advance the watermark while
        # omitting a file that an earlier listing observed inside the
        # new window; rebuilding the tail from the current listing alone
        # would drop that file's fingerprint and re-emit it when it
        # reappears (round-5 advice: exactly-once silently degrading to
        # at-least-once under flaky listings). Carry forward previously
        # committed tail entries still inside [wm - slack, wm] — they
        # were observed, so their fingerprints stay authoritative until
        # they age out of the window or the file is listed again (a
        # fresh listing entry wins: a changed fingerprint must re-emit).
        for f, fp in self._carry_offset.get("tail", {}).items():
            if f not in tail and lo <= _fp_mtime(fp) <= wm:
                tail[f] = fp
        off = {"wm": wm, "slack": self.slack_ns, "tail": tail}
        self._carry_wm, self._carry_offset = wm, off
        return off

    def partitions(self, start: dict, end: dict):
        # restart path: adopt BOTH offsets — after a crash the replayed
        # batch's END is the about-to-be-committed watermark (start
        # alone would leave the carry one batch behind, finding of
        # round-5 review), and commit() below re-adopts it anyway
        self._adopt(start)
        self._adopt(end)
        if "seen" in end:
            # exact-map end offset: pure offset diff, no relisting
            return [
                InputPartition(f)
                for f, fp in end["seen"].items()
                if _is_newer_than(f, fp, start)
            ]
        # watermark end offset: select from the current listing the files
        # inside the (start, end] modification window
        return [
            InputPartition(f)
            for f, fp in self._listing().items()
            if _is_newer_than(f, fp, start) and not _is_newer_than(f, fp, end)
        ]

    def read(self, partition):
        if partition is None or getattr(partition, "value", None) is None:
            return
        yield from _read_profile_file(partition.value)

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint log; nothing external to ack —
        # but commit is the one API channel through which a restarted
        # reader learns the committed offset BEFORE its first listing,
        # so fold it into the monotone-carry state
        self._adopt(end)


def register_argo_source(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(ArgoGdacDataSource)
