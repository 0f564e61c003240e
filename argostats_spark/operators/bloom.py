"""Catalyst-native Bloom filter — the broadcast-membership gate that
decontaminates (or blocklists, or routes) a 100 TB corpus WITHOUT
shuffling it.

Green-field scope (no reference counterpart): at corpus scale, "drop
every document whose key appears in this benchmark/blocklist set" is
the join you must not run naively — a corpus-side shuffle join moves
100 TB for a set that fits in memory. A semi join with a broadcast
works until the dirty set outgrows the broadcast-row budget; a Bloom
filter compresses ANY dirty-set size into m bits with a tunable false
positive rate and ZERO false negatives, so the corpus-side gate is a
row-local expression and only bloom-passing candidates (true hits +
fpp·corpus) reach the exact verify join. Spark's own runtime row-level
filtering uses the same trick internally but exposes no API
(``bloom_filter_agg`` is unregistered); this module builds the filter
from public SQL primitives:

- BUILD is one aggregate: each key emits ``num_hashes`` bit positions
  (xxhash64(key, seed_i) mod m), grouped into Spark's standard 32768-
  bit bitmap buckets via ``bitmap_construct_agg`` — a (m/32768)-row
  table of 4 KiB bitmaps, map-side combined, never a corpus shuffle.
- MERGE is ``bitmap_or_agg`` per bucket: shard blooms OR into the
  union's bloom exactly (the dataset_manifest composition story —
  build per shard, merge without re-reading).
- PROBE has two physical forms with identical semantics (pinned equal
  by test):
  * ``bloom_might_contain`` — the bitmap table rides in as a LITERAL
    byte array (driver-bounded: m bits, guarded), the probe is pure
    row-local codegen: substring the bucket's bytes, conv a hex pair,
    shift-and-mask. Zero joins, zero shuffles, stream-safe — the shape
    a readStream gate needs.
  * ``bloom_gate_join`` — probes explode to (bucket, bit) rows and
    broadcast-equi-join the bitmap table: no driver materialization,
    any m.

Bit layout (pinned by differential test against a pure-Python mirror):
position p in [0, m) lands in bucket p >> 15 (0-based), byte
(p & 32767) >> 3, bit (p & 7), LSB-first — exactly where
``bitmap_construct_agg(bitmap_bit_position(p+1))`` puts it, so blooms
built by this module and bitmaps built by Spark's bitmap functions are
the same artifact.

False positives: fpp ≈ (1 − e^{−kn/m})^k; with m/n = 16 bits/key and
k = 3, ~0.15%. False negatives: none, structurally — the
decontamination pipeline therefore hashes its exact-verified OUTPUT
(identical regardless of fpp) and pins "the gate kept every true hit"
as an invariant, not a probability.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET_BITS = 32768  # Spark bitmap bucket size (bitmap_bucket_number)
_BUCKET_BYTES = _BUCKET_BITS // 8


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a key: pmod(xxhash64(key, i), m) for
    i in 1..k — xxhash64 over the (key, seed) tuple is the standard
    cheap way to derive an independent-enough hash family from one
    function (each seed changes every output bit)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
        for i in range(1, num_hashes + 1)
    ]


def _validate(num_bits: int, num_hashes: int) -> None:
    if num_bits < _BUCKET_BITS or num_bits % _BUCKET_BITS != 0:
        raise ValueError(
            f"num_bits must be a positive multiple of {_BUCKET_BITS} "
            f"(Spark's bitmap bucket size), got {num_bits}"
        )
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in 1..16, got {num_hashes}")


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int,
    num_hashes: int = 3,
) -> DataFrame:
    """Build the bloom as a (bucket, bitmap) table: bucket is 1-based
    (``bitmap_bucket_number`` convention), bitmap is a 4 KiB binary.
    One explode (k rows per key) + one map-side-combined aggregate;
    buckets with no set bits are absent (the probe treats a missing
    bucket as all-zeros). NULL keys are ignored — SQL membership
    semantics (NULL IN (...) is never TRUE here; gate NULLs upstream
    if they need their own policy)."""
    _validate(num_bits, num_hashes)
    pos = F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes)))
    return (
        df.filter(F.col(col).isNotNull())
        .select(pos.alias("__p"))
        .select(
            F.expr("bitmap_bucket_number(__p + 1)").alias("bucket"),
            F.expr("bitmap_bit_position(__p + 1)").alias("__bit"),
        )
        .groupBy("bucket")
        .agg(F.expr("bitmap_construct_agg(__bit)").alias("bitmap"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR shard blooms into the union's bloom — EXACTLY the bloom
    bloom_build would produce over the concatenated inputs (same m and
    k assumed; the caller owns that contract). Cost: bitmap-table rows,
    never the corpora behind them."""
    if not blooms:
        raise ValueError("bloom_merge: no blooms to merge")
    u = reduce(lambda a, b: a.unionByName(b), blooms)
    return u.groupBy("bucket").agg(
        F.expr("bitmap_or_agg(bitmap)").alias("bitmap")
    )


def bloom_to_bytes(
    bloom: DataFrame, num_bits: int, max_bytes: int = 64 << 20
) -> list[bytes]:
    """Collect the bitmap table into a dense per-bucket byte list for
    the literal (row-local) probe. Driver traffic is exactly
    num_bits/8 bytes REGARDLESS of how many keys were inserted — but
    still guard it (the pack_chunks_bestfit policy): past ``max_bytes``
    raise naming the join-mode remedy rather than silently shipping a
    multi-GB literal into every task's codegen."""
    n_buckets = num_bits // _BUCKET_BITS
    if n_buckets * _BUCKET_BYTES > max_bytes:
        raise ValueError(
            f"bloom_to_bytes: {n_buckets * _BUCKET_BYTES} bytes of bitmap "
            f"exceed max_bytes={max_bytes} — use bloom_gate_join (the "
            f"bitmap table broadcast-joins at any m) or lower num_bits."
        )
    got = {int(r["bucket"]): bytes(r["bitmap"]) for r in bloom.collect()}
    empty = b"\x00" * _BUCKET_BYTES
    out = []
    for b in range(1, n_buckets + 1):
        raw = got.get(b, empty)
        # bitmap_construct_agg always emits 4 KiB; normalize defensively
        out.append(raw[:_BUCKET_BYTES].ljust(_BUCKET_BYTES, b"\x00"))
    return out


def bloom_might_contain(
    col: Column | str,
    bloom_bytes: list[bytes],
    num_bits: int,
    num_hashes: int = 3,
) -> Column:
    """Row-local membership test against a literal bloom: TRUE iff all
    k bits are set (maybe-present), FALSE definitely-absent, NULL for
    NULL keys. Pure codegen — substring into the bucket's literal
    bytes, hex-pair conv, shift-and-mask — so it composes into batch
    filters and readStream gates alike (no join, no state)."""
    _validate(num_bits, num_hashes)
    if len(bloom_bytes) != num_bits // _BUCKET_BITS:
        raise ValueError(
            f"bloom_might_contain: expected {num_bits // _BUCKET_BITS} "
            f"buckets, got {len(bloom_bytes)}"
        )
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(b) for b in bloom_bytes])
    checks = []
    for p in _positions(c, num_bits, num_hashes):
        bucket_ix = (p / _BUCKET_BITS).cast("int")  # 0-based
        inbkt = F.pmod(p, F.lit(_BUCKET_BITS))
        byte = F.conv(
            F.hex(
                F.substring(
                    F.element_at(arr, bucket_ix + F.lit(1)),
                    (inbkt / 8).cast("int") + F.lit(1),
                    1,
                )
            ),
            16, 10,
        ).cast("int")
        # F.shiftright needs a literal shift count, so the variable-bit
        # test is exact integer arithmetic instead: byte <= 255 and
        # 2^bit <= 128 are exact in doubles, floor(byte/2^bit) % 2
        # reads the LSB-first bit
        bit = F.pmod(inbkt, F.lit(8)).cast("double")
        checks.append(
            F.floor(byte / F.pow(F.lit(2.0), bit)).cast("long") % 2 == 1
        )
    return F.when(c.isNotNull(), reduce(lambda a, b: a & b, checks))


def bloom_gate_join(
    probe: DataFrame,
    bloom: DataFrame,
    col: str,
    num_bits: int,
    num_hashes: int = 3,
    out_col: str = "might_contain",
) -> DataFrame:
    """Join-mode probe for blooms too big to ship as a literal: the
    probe side explodes to k (key-row, bucket, bit) rows, the bitmap
    table joins BROADCAST on bucket (m/32768 rows of 4 KiB — tiny next
    to any corpus), and a per-row count-of-set-bits == k aggregate
    restores one row per input row. One exchange over probe×k hash
    rows — still no corpus-payload shuffle (only a row id and two
    ints travel). Adds ``out_col``; NULL keys gate to NULL.

    Name contract (ADVICE r9): ``__rid`` and ``out_col`` are the only
    names this operator writes into the caller's frame — a probe
    already carrying either would be silently overwritten/dropped, so
    both raise instead. The other internals (bucket/__bit/__set/
    bitmap) live only in projected-away intermediate frames and can
    coexist with same-named probe columns."""
    _validate(num_bits, num_hashes)
    for reserved in ("__rid", out_col):
        if reserved in probe.columns:
            raise ValueError(
                f"bloom_gate_join: probe already has a column named "
                f"{reserved!r}, which this operator would overwrite — "
                f"rename it (or pass a different out_col) first."
            )
    pid = F.monotonically_increasing_id()
    # the rid is NONDETERMINISTIC across recomputations and two lineage
    # branches consume src (the probe explosion and the final join) —
    # pin the assignment once so a task retry or a second action can
    # never pair verdicts with the wrong rows. Lifetime note (VERDICT
    # r9): a lazy localCheckpoint's blocks persist until the DRIVER GCs
    # the handle — fine for one-shot gates, but a caller timing or
    # chaining many gate_joins in one session should drop references
    # (or gc.collect()) between them so checkpoint debris doesn't tax
    # later queries' executor memory (the round-6 bench lesson,
    # SCALE.md host-contention ledger).
    src = probe.withColumn("__rid", pid).localCheckpoint(eager=False)
    pos = F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes)))
    probes = (
        src.filter(F.col(col).isNotNull())
        .select("__rid", pos.alias("__p"))
        .select(
            "__rid",
            F.expr("bitmap_bucket_number(__p + 1)").alias("bucket"),
            F.expr("bitmap_bit_position(__p + 1)").alias("__bit"),
        )
    )
    joined = probes.join(F.broadcast(bloom), "bucket", "left")
    byte = F.conv(
        F.hex(
            F.substring(
                F.col("bitmap"), (F.col("__bit") / 8).cast("int") + F.lit(1), 1
            )
        ),
        16, 10,
    ).cast("int")
    bit_set = F.when(
        F.col("bitmap").isNull(), F.lit(False)
    ).otherwise(
        F.floor(
            byte / F.pow(F.lit(2.0), F.pmod(F.col("__bit"), F.lit(8)).cast("double"))
        ).cast("long") % 2 == 1
    )
    verdict = (
        joined.withColumn("__set", bit_set.cast("int"))
        .groupBy("__rid")
        .agg((F.sum("__set") == F.count(F.lit(1))).alias(out_col))
    )
    return (
        src.join(verdict, "__rid", "left")
        .withColumn(
            out_col,
            F.when(F.col(col).isNotNull(), F.col(out_col)),
        )
        .drop("__rid")
    )
