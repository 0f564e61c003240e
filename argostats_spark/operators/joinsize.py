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
    ⌈log2(1/(1−confidence))⌉ — verified empirically: confidence 0.99
    yields depth 7, the paper's ⌈ln(1/(1−confidence))⌉ would give 5 —
    and width = ⌈2/eps⌉, not the paper's ⌈e/eps⌉; see the module
    header). NULL keys are excluded —
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


class SketchStore:
    """Persisted key sketches, keyed by (table, column, fingerprint) —
    the reuse plumbing that makes the advisor pre-flight FREE for
    repeated joins (VERDICT r13 item 4). Same filesystem abstraction
    as the streaming state stores (:mod:`..streaming.fsio`): a plain
    path uses local os I/O, any ``scheme://`` URI goes through the
    Hadoop FileSystem API, so the store works on hdfs/s3a wherever
    Spark itself runs. Payloads are KB-sized JSON (base64 sketch bytes
    + the geometry params), written atomically (temp + rename).

    ``fingerprint`` is the caller's data-version key (an epoch, a
    snapshot id, a max(ingest_ts)) — the store NEVER guesses it: a
    stale sketch silently mis-advises, so cache freshness is
    explicitly the caller's contract, exactly like the dedup band
    index's epoch column."""

    def __init__(self, base: str, spark=None):
        from ..streaming.fsio import store_fs

        self.base = base.rstrip("/")
        self._fs = store_fs(self.base, spark)
        self._fs.mkdirs(self.base)

    def _path(self, table: str, column: str, fingerprint: str) -> str:
        import re

        safe = "__".join(
            re.sub(r"[^A-Za-z0-9_.-]", "_", str(part))
            for part in (table, column, fingerprint)
        )
        return f"{self.base}/{safe}.json"

    def put(self, table: str, column: str, fingerprint: str,
            sketch: bytes, eps: float, confidence: float,
            seed: int) -> None:
        import base64
        import json

        payload = json.dumps({
            "sketch_b64": base64.b64encode(sketch).decode("ascii"),
            "eps": float(eps), "confidence": float(confidence),
            "seed": int(seed), "n_bytes": len(sketch),
        })
        path = self._path(table, column, fingerprint)
        self._fs.write_text_atomic(
            path, payload, f".tmp.{table}.{column}".replace("/", "_")
        )

    def get(self, table: str, column: str, fingerprint: str,
            eps: float, confidence: float, seed: int) -> bytes | None:
        """The cached sketch, or None when absent OR built with other
        geometry params (eps/confidence/seed are part of the identity:
        mixed-geometry inner products are meaningless and
        join_size_estimate would raise)."""
        import base64
        import json

        text = self._fs.read_text(self._path(table, column, fingerprint))
        if text is None:
            return None
        try:
            rec = json.loads(text)
        except ValueError:
            return None
        if (
            rec.get("eps") != float(eps)
            or rec.get("confidence") != float(confidence)
            or rec.get("seed") != int(seed)
        ):
            return None
        raw = base64.b64decode(rec["sketch_b64"])
        return raw if len(raw) == rec.get("n_bytes") else None

    def get_or_build(
        self,
        df: DataFrame,
        key: str,
        table: str,
        fingerprint: str,
        eps: float = 0.001,
        confidence: float = 0.99,
        seed: int = 42,
    ) -> bytes:
        """Cached sketch if present (ZERO scans), else one
        :func:`key_sketch` scan followed by a put."""
        hit = self.get(table, key, fingerprint, eps, confidence, seed)
        if hit is not None:
            return hit
        sk = key_sketch(df, key, eps, confidence, seed)
        self.put(table, key, fingerprint, sk, eps, confidence, seed)
        return sk


def _fmax_upper_bound(table) -> int:
    """Upper bound on the heaviest key's frequency, read straight off
    the CMS table: in every depth row, the heaviest key's counter is
    >= its true frequency, so each row's MAX cell is >= f_max and the
    min over rows is a valid (collision-inflated) upper bound — the
    standard CMS point-query argument applied without knowing which
    key is hot. No extra scan, no key enumeration."""
    return int(min(int(table[i].max()) for i in range(table.shape[0])))


def choose_join_strategy(
    dfa: DataFrame,
    key_a: str,
    dfb: DataFrame,
    key_b: str,
    broadcast_rows: int = 4_000_000,
    shuffle_partitions: int | None = None,
    skew_factor: float = 4.0,
    max_salts: int = 64,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    sketch_a: bytes | None = None,
    sketch_b: bytes | None = None,
) -> dict:
    """Join ADVISOR (round 12; VERDICT r11 item 4): turn the CMS
    pre-flight from a diagnostic into a planner input. Sketches both
    sides ONCE (two scans, no shuffle, KB driver payloads) and returns
    a decision record::

        {"strategy": "broadcast_a" | "broadcast_b" | "plain"
                     | "salted",
         "salt_side": "a" | "b" | None,   # the side salted_join salts
         "n_salts": int | None,
         "est": ..., "upper_slack": ..., "n_a": ..., "n_b": ...,
         "fmax_ub_a": ..., "fmax_ub_b": ...,   # heaviest-key UBs
         "fair_share": ...,  "trusted": bool,  "reason": "..."}

    Decision ladder (the 100 TB defaults, in order):

    1. **broadcast** the smaller side when its row count (the sketch's
       exact totalCount — NULL keys excluded) is <= ``broadcast_rows``.
       The threshold is ROWS, not bytes: the caller knows the row
       width; Spark's own ``autoBroadcastJoinThreshold`` still applies
       a byte-level backstop underneath.
    2. **salted** when the heaviest key alone outweighs a fair
       partition: f_max_ub > skew_factor * fair_share, where
       fair_share = max(n_a, n_b) / shuffle_partitions and f_max_ub is
       read off the CMS tables row-locally (:func:`_fmax_upper_bound`
       — no extra pass). n_salts = ceil(f_max_ub / fair_share), capped
       at ``max_salts``. The SKEWED side is the one salted_join salts;
       the other side is replicated x n_salts — so this advice is only
       taken when that other side is the smaller one (both-sides-hot
       falls through to plain + AQE skew-join, stated in ``reason``).
    3. **plain** shuffle join otherwise — AQE's runtime skew split
       remains the backstop for moderate skew.

    WHEN NOT TO TRUST (A6-style caveat): ``trusted`` is False when
    ``upper_slack >= est`` — the one-sided CMS bound then admits a
    true size of ~0, i.e. the estimate carries no information at this
    eps for these cardinalities (raise eps precision / lower eps). The
    f_max upper bounds are collision-inflated by ~(n/width) on
    average; at the default eps=0.001 (width 2000) that inflation is
    n/2000, small next to any partition-dominating hot key. The
    advisor never *executes* the join itself — pass the record to
    :func:`apply_join_strategy` (or read ``reason`` and decide).
    Production consumer: ``decontam.ngram_contamination(advisor=True)``
    routes its corpus-gram ⋈ benchmark-gram join through this ladder
    (VERDICT r12 item 4); the pre-flight's two eager sketch scans are
    the opt-in price — unless pre-built sketches are supplied:
    ``sketch_a``/``sketch_b`` (serialized CMS bytes, e.g. from a
    :class:`SketchStore`) skip that side's scan entirely, making the
    advisor free for repeated joins against versioned tables (VERDICT
    r13 item 4). Supplied sketches MUST have been built with the same
    eps/confidence/seed over the CURRENT data — geometry mismatches
    raise in join_size_estimate, staleness is the caller's contract
    (see SketchStore)."""
    import math

    if shuffle_partitions is None:
        shuffle_partitions = int(
            dfa.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    sa = sketch_a if sketch_a is not None else key_sketch(
        dfa, key_a, eps, confidence, seed
    )
    sb = sketch_b if sketch_b is not None else key_sketch(
        dfb, key_b, eps, confidence, seed
    )
    est = join_size_estimate(sa, sb)
    _, tab_a, _ = _decode_cms(sa)
    _, tab_b, _ = _decode_cms(sb)
    n_a, n_b = est["n_a"], est["n_b"]
    fair = max(n_a, n_b) / float(shuffle_partitions)
    rec = {
        **est,
        "fmax_ub_a": _fmax_upper_bound(tab_a),
        "fmax_ub_b": _fmax_upper_bound(tab_b),
        "trusted": est["upper_slack"] < est["est"],
        "salt_side": None,
        "n_salts": None,
        # always present so the record shape is fixed, as documented
        "fair_share": round(fair, 1),
    }
    if min(n_a, n_b) <= broadcast_rows:
        side = "a" if n_a <= n_b else "b"
        rec["strategy"] = f"broadcast_{side}"
        rec["reason"] = (
            f"side {side} has {min(n_a, n_b)} rows <= broadcast_rows="
            f"{broadcast_rows}; broadcast beats any shuffle"
        )
        return rec
    hot_side = "a" if rec["fmax_ub_a"] >= rec["fmax_ub_b"] else "b"
    fmax = rec[f"fmax_ub_{hot_side}"]
    other_n = n_b if hot_side == "a" else n_a
    if fmax > skew_factor * fair:
        if other_n <= max(n_a, n_b) // 2:
            rec["strategy"] = "salted"
            rec["salt_side"] = hot_side
            rec["n_salts"] = min(max_salts, int(math.ceil(fmax / fair)))
            rec["reason"] = (
                f"heaviest key on side {hot_side} (<= {fmax} rows) "
                f"exceeds {skew_factor}x the fair partition share "
                f"({fair:.0f}); salt it {rec['n_salts']} ways, "
                f"replicating the other side"
            )
        else:
            rec["strategy"] = "plain"
            rec["reason"] = (
                f"side {hot_side} is skewed (f_max <= {fmax}) but the "
                "other side is comparably large — replicating it per "
                "salt would cost more than the skew; rely on AQE's "
                "runtime skew split"
            )
        return rec
    rec["strategy"] = "plain"
    rec["reason"] = (
        f"no side broadcastable and heaviest key (<= {fmax}) within "
        f"{skew_factor}x the fair share ({fair:.0f}); plain shuffle "
        "join, AQE as backstop"
    )
    return rec


def apply_join_strategy(
    dfa: DataFrame,
    dfb: DataFrame,
    on: list[str],
    decision: dict,
    how: str = "inner",
) -> DataFrame:
    """Execute a :func:`choose_join_strategy` decision. ``on`` must be
    same-named key columns on both sides (rename upstream otherwise —
    keeping the advisor's key_a/key_b distinction through the join
    would silently double the output columns). Row-for-row equal to
    ``dfa.join(dfb, on, how)`` for every strategy INCLUDING column
    order (broadcast is a hint; salting is the multiplicity-preserving
    salted_join; the b-side salt swaps operands internally and
    re-selects the plain-join column order — which is why that path
    additionally requires non-key column names to be distinct across
    the two sides, loudly checked). b-side salt + how='left' reframes
    on the a side (VERDICT r12 item 6): a splits by a match flag from
    b's distinct keys (skew-proof — the distinct collapses the hot key
    map-side), the matched part takes the salted inner join, the
    unmatched part null-extends; right/full stay rejected (the salted
    side's unmatched rows are genuinely not preserved).

    Determinism requirement (ADVICE r13): the left-salt reframing
    evaluates ``dfa``'s subplan in two filter branches (matched /
    unmatched). AQE exchange reuse normally dedups them into ONE
    evaluation (pinned by tests/test_joinsize.py's ReusedExchange
    test), but the contract is only guaranteed for deterministic
    ``dfa`` — a frame derived from ``rand()``/sampling without a
    checkpoint can disagree between recomputations if reuse is ever
    skipped, and a row could then land in both or neither branch.
    Persist/localCheckpoint such a frame before calling (we don't do
    it here: an unconditional persist of a corpus-sized ``flagged``
    is exactly the cost this operator exists to avoid)."""
    from .skew import salted_join

    strategy = decision["strategy"]
    if strategy == "broadcast_a":
        # broadcast() hints the build side; operand order is untouched
        # so column order and how-semantics match the plain join
        return F.broadcast(dfa).join(dfb, on, how)
    if strategy == "broadcast_b":
        return dfa.join(F.broadcast(dfb), on, how)
    if strategy == "plain":
        return dfa.join(dfb, on, how)
    if strategy == "salted":
        if decision["salt_side"] == "a":
            return salted_join(dfa, dfb, on, decision["n_salts"], how)
        # salted_join salts its FIRST argument; only inner joins are
        # side-symmetric, so a right-side salt with how='left' cannot
        # be expressed by bare operand swap. how='left' IS expressible
        # by a-side reframing (VERDICT r12 item 6) below; right/full
        # are genuinely inexpressible this way (unmatched SALTED-side
        # replicas would fabricate rows) — reject those loudly.
        if how not in ("inner", "left"):
            raise ValueError(
                "apply_join_strategy: salted on side b supports only "
                f"how='inner' or 'left', got {how!r} (unmatched rows "
                "of the salted side are not preserved under operand "
                "swap or reframing)"
            )
        # restore the plain-join column order (on, dfa rest, dfb rest):
        # the operand swap would otherwise flip it to (on, dfb, dfa),
        # breaking positional consumers the contract above promises
        # stability to. Name-based re-select needs unambiguous names.
        a_rest = [c for c in dfa.columns if c not in on]
        b_rest = [c for c in dfb.columns if c not in on]
        dup = set(a_rest) & set(b_rest)
        if dup:
            raise ValueError(
                "apply_join_strategy: salted on side b cannot restore "
                f"column order with duplicate non-key names {sorted(dup)}"
                " — rename one side upstream"
            )
        if how == "inner":
            return salted_join(
                dfb, dfa, on, decision["n_salts"], "inner"
            ).select(*on, *a_rest, *b_rest)
        # left join, skewed RIGHT side: left = salted-inner over the
        # matched a rows ∪ null-extended unmatched a rows. The match
        # flag comes from b's DISTINCT keys — the distinct collapses
        # the hot key map-side (partial aggregate), so the flag join
        # is skew-proof and AQE may broadcast the key table; the two
        # filter branches share an identical a⋈keys subplan that
        # AQE's exchange reuse deduplicates.
        if "__m" in dfa.columns or "__m" in dfb.columns:
            raise ValueError("column name __m is reserved")
        b_keys = dfb.select(*on).distinct().withColumn("__m", F.lit(1))
        flagged = dfa.join(b_keys, on, "left")
        matched = flagged.filter(F.col("__m").isNotNull()).drop("__m")
        unmatched = flagged.filter(F.col("__m").isNull()).select(
            *on, *a_rest,
            *[
                F.lit(None).cast(dfb.schema[c].dataType).alias(c)
                for c in b_rest
            ],
        )
        matched_inner = salted_join(
            dfb, matched, on, decision["n_salts"], "inner"
        ).select(*on, *a_rest, *b_rest)
        return matched_inner.unionByName(unmatched)
    raise ValueError(f"unknown strategy {decision['strategy']!r}")
