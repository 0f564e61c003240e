"""Single-threaded BLAS inside executor Python workers.

Spark owns the parallelism: N workers per host × an N-thread OpenBLAS
per worker = N² runnable threads, and the kernels' small per-profile
solves (e.g. the 76×76 spline system) collapse under the thrash —
measured 305 ms oversubscribed vs 145 µs clamped for one solve.

Two layers of defense:
- session.py sets OPENBLAS/OMP/MKL_NUM_THREADS=1 before the JVM starts
  (local workers inherit it) and via spark.executorEnv.* (clusters).
- This module clamps the ALREADY-LOADED OpenBLAS at runtime through its
  ``openblas_set_num_threads`` entry point, covering sessions created
  outside our factory (the correctness driver builds its own plain
  SparkSession, then imports this package — env vars set at import time
  never reach its workers).

Called at the top of every NumPy kernel; idempotent and ~free after the
first call per process.
"""

from __future__ import annotations

import ctypes
import glob
import os

_DONE = False


def limit_blas_threads(n: int = 1) -> None:
    """Clamp the in-process OpenBLAS thread pool (no-op if absent)."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, str(n))
    try:
        import numpy

        np_dir = os.path.dirname(numpy.__file__)
        candidates = (
            glob.glob(os.path.join(np_dir, "..", "numpy.libs", "*openblas*"))
            + glob.glob(os.path.join(np_dir, ".libs", "*openblas*"))
        )
        for path in candidates:
            lib = ctypes.CDLL(path)  # already loaded → same handle
            for sym in ("openblas_set_num_threads", "openblas_set_num_threads64_"):
                fn = getattr(lib, sym, None)
                if fn is not None:
                    fn(n)
                    return
    except Exception:  # pragma: no cover — best effort, env vars still apply
        pass
