"""Join-size PRE-FLIGHT estimation via count-min inner products —
decide broadcast vs sort-merge vs salt BEFORE paying the shuffle.

Green-field scope (no reference counterpart): at 100 TB the wrong
join strategy is a lost cluster-day — a fact×fact equi-join whose
output explodes (skewed key multiplicities multiply) is something you
want to know from TWO SCANS AND NO SHUFFLE, not from the OOM. The
classic estimator (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications", §4.2):
the true join size on a key equals the inner product of the two
sides' key-frequency vectors, and the row-wise minimum of the
sketches' table inner products estimates it with one-sided error —

    true ≤ est ≤ true + (e / width) · N_a · N_b     (w.p. 1 − delta)

The paper sizes width = ⌈e/eps⌉ so the slack is eps·N_a·N_b, but
Spark 4.1's ``CountMinSketchImpl`` sizes width = ⌈2/eps⌉ (verified
against the spark-sketch jar), so for a given ``eps`` argument the
realized one-sided slack is (e/2)·eps·N_a·N_b ≈ 1.36·eps·N_a·N_b.
``join_size_estimate`` computes ``upper_slack`` from the DECODED
width, so the returned bound is valid either way — only callers
assuming the paper's width-from-eps formula would be surprised.

Spark exposes ``count_min_sketch`` as a native aggregate (the partial
sketches merge inside the aggregate — distributive, one scan per
side) but no inner-product accessor, so this module decodes the
sketch's public serialized form (version | totalCount | depth |
width | hashA | table, all big-endian — the OSS
``org.apache.spark.util.sketch.CountMinSketch`` layout, asserted by
magic/length checks) and takes the inner products driver-side: the
payloads are KBs, the corpora never move.

Complements the POST-HOC diagnosis in operators/profile.py
(key_skew_report tells you which keys exploded; this tells you the
blast radius before you light the fuse)."""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADER = struct.Struct(">iqii")  # version, totalCount, depth, width


def _decode_cms(raw: bytes):
    """(total, table[depth][width], hash_coeffs[depth]) from Spark's
    CountMinSketch serialized bytes. Loud on anything unexpected."""
    import numpy as np

    if len(raw) < _HEADER.size:
        raise ValueError(f"CMS payload too short: {len(raw)} bytes")
    ver, total, depth, width = _HEADER.unpack_from(raw, 0)
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    want = _HEADER.size + depth * width * 8 + depth * 8
    if len(raw) != want:
        raise ValueError(
            f"CMS payload size {len(raw)} != expected {want} "
            f"(depth={depth}, width={width})"
        )
    # layout after the header: hashA[depth] FIRST, then the
    # depth×width count table (verified against a live sketch: the
    # table rows each sum to totalCount only under this order)
    hashes = np.frombuffer(
        raw, dtype=">i8", count=depth, offset=_HEADER.size
    ).astype("int64")
    table = (
        np.frombuffer(raw, dtype=">i8", count=depth * width,
                      offset=_HEADER.size + depth * 8)
        .reshape(depth, width)
        .astype("int64")
    )
    return total, table, hashes


def key_sketch(
    df: DataFrame,
    key: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """One-scan CMS of a key column's frequency vector (the aggregate
    merges its partial sketches internally — distributive, no extra
    shuffle). Returns the serialized sketch bytes (KBs: depth =
    ⌈ln(1/(1−confidence))⌉, width = ⌈2/eps⌉ — Spark's sizing, not
    the paper's ⌈e/eps⌉; see the module header). NULL keys are
    excluded —
    SQL equi-joins never match them, so they contribute nothing to
    any join size."""
    row = (
        df.filter(F.col(key).isNotNull())
        .agg(
            F.count_min_sketch(
                key, F.lit(float(eps)), F.lit(float(confidence)),
                F.lit(int(seed)),
            ).alias("cms")
        )
        .collect()[0]
    )
    return bytes(row["cms"])


def join_size_estimate(sketch_a: bytes, sketch_b: bytes) -> dict:
    """Estimated equi-join output size from two key sketches built
    with the SAME eps/confidence/seed (checked: the table geometry and
    hash coefficients must match, else the inner product is
    meaningless and this raises).

    Returns {"est": int, "n_a": int, "n_b": int, "upper_slack": float,
    "depth": int, "width": int} where the true join size lies in
    [lower..est] with est − true ≤ upper_slack = (e/width)·n_a·n_b at
    the sketch's confidence — the caller compares ``est`` against its
    broadcast/salting thresholds and ``upper_slack`` tells it how much
    headroom the verdict has."""
    import math

    ta, tab_a, ha = _decode_cms(sketch_a)
    tb, tab_b, hb = _decode_cms(sketch_b)
    if tab_a.shape != tab_b.shape or not (ha == hb).all():
        raise ValueError(
            "join_size_estimate: sketches use different geometry or "
            "hash seeds — build both with the same eps/confidence/seed"
        )
    depth, width = tab_a.shape
    # exact Python-int arithmetic: at 10^11-row sides the int64 inner
    # product overflows silently (counts up to N, products to N² ≈
    # 10^22 > 2^63); the tables are a few thousand cells, so object
    # dtype costs microseconds
    est = int(
        min(
            (tab_a[i].astype(object) * tab_b[i].astype(object)).sum()
            for i in range(depth)
        )
    )
    return {
        "est": est,
        "n_a": int(ta),
        "n_b": int(tb),
        "upper_slack": (math.e / width) * float(ta) * float(tb),
        "depth": int(depth),
        "width": int(width),
    }


def preflight_join_size(
    dfa: DataFrame,
    key_a: str,
    dfb: DataFrame,
    key_b: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> dict:
    """The two-scan pre-flight: sketch both sides, estimate the
    equi-join output size. Never shuffles, never joins; driver traffic
    is two KB-sized sketch payloads."""
    return join_size_estimate(
        key_sketch(dfa, key_a, eps, confidence, seed),
        key_sketch(dfb, key_b, eps, confidence, seed),
    )
