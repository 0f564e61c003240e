"""Z-order (Morton) data layout for multi-dimensional data skipping.

Green-field scope (no reference counterpart — the reference's only
layout lever is its per-float directory convention, README.md:146-158).
At 100 TB the scan is the dominant cost and parquet min/max stats are
the only thing standing between a 2-D box predicate and a full read:

- a LINEAR sort on one dimension gives perfect pruning on that
  dimension and NONE on the others (every file spans the full range of
  every unsorted column);
- a Z-ORDER sort interleaves the bits of both dimensions, so file key
  ranges map to spatial quadrants and BOTH dimensions' per-file min/max
  stay tight — a box predicate on either (or both) dimensions skips
  most files from the footer alone. This is the same layout lever
  Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's mortonEncode expose.

Everything here is engine-side integer arithmetic (shift/and/or inside
whole-stage codegen — no UDF), and the identical arithmetic runs in
DuckDB, which is how the ``zorder`` limb of the ``scalar_suite``
registry row cross-checks the key. The write path is one tiny min/max
aggregate + one range exchange (``repartitionByRange`` samples the key,
so files are size-balanced even when the key space is not uniformly
populated) + an in-partition sort: exactly the cost of any other sorted
write, redistributed across two dimensions.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bit-spreading magic numbers: value < 2^16 -> its bits at the even
# positions of a 32-bit word (Morton/BMI "part 1 by 1" without PDEP)
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)
MAX_BITS = 16  # per dimension; 2 dims * 16 bits = 32-bit key in a long


def spread_bits(col: Column | str) -> Column:
    """Spread a 16-bit integer's bits to the even positions of a 32-bit
    word (b15..b0 -> bit positions 30, 28, ..., 0). Pure long
    arithmetic — codegen in Spark, identical ``<< & |`` in DuckDB.
    Only the LOW 16 BITS participate (masked explicitly up front, so a
    >=2^16 input degrades to its low bits deterministically instead of
    leaking partial high bits through the spread steps); feed grid
    coordinates from ``grid_coord``, which guarantees the range."""
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    c = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_key(x: Column | str, y: Column | str) -> Column:
    """Interleave two grid coordinates in [0, 2^16): x takes the even
    bits, y the odd bits. Adjacent keys are spatially adjacent cells
    of the 2-D grid (the Z curve)."""
    return spread_bits(x).bitwiseOR(F.shiftleft(spread_bits(y), 1))


def grid_coord(
    col: Column | str, lo: float, hi: float, bits: int = MAX_BITS
) -> Column:
    """Scale a numeric column onto the integer grid [0, 2^bits):
    floor((v-lo)/(hi-lo) * 2^bits), clamped at both ends (values
    outside [lo, hi] land in the edge cells — out-of-range rows still
    sort near their true neighbors instead of erroring). A degenerate
    range (hi <= lo) maps everything to cell 0."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}], got {bits}")
    n = 1 << bits
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n))
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), scaled)).cast("long")


def zorder_key(
    df: DataFrame,
    dims: list[str],
    bits: int = MAX_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> tuple[Column, dict[str, tuple[float, float]]]:
    """The Morton key column for two dimensions of ``df``, plus the
    (lo, hi) ranges used. Ranges default to one min/max aggregate —
    2 dims * 2 scalars of driver traffic."""
    if len(dims) != 2:
        raise ValueError(f"zorder_key interleaves exactly 2 dims, got {dims}")
    if ranges is None:
        row = df.agg(
            *[f(c).cast("double") for c in dims for f in (F.min, F.max)]
        ).first()
        ranges = {c: (row[2 * i], row[2 * i + 1]) for i, c in enumerate(dims)}
        bad = [c for c, (lo, hi) in ranges.items() if lo is None or hi is None]
        if bad:
            raise ValueError(
                f"zorder_key: no non-NULL values to range over in {bad} "
                "(empty frame or all-NULL dimension) — pass explicit "
                "`ranges` or fix the input"
            )
    gx = grid_coord(dims[0], *ranges[dims[0]], bits=bits)
    gy = grid_coord(dims[1], *ranges[dims[1]], bits=bits)
    return morton_key(gx, gy), ranges


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[str],
    bits: int = MAX_BITS,
    n_files: int = 8,
    ranges: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> dict[str, tuple[float, float]]:
    """Write ``df`` as ``n_files`` parquet files clustered along the Z
    curve of ``dims``. One min/max agg + one range exchange (sampled,
    size-balanced) + in-partition sort; the key column does not land in
    the files. Returns the ranges (persist them: queries that prune
    want the same grid)."""
    key, ranges = zorder_key(df, dims, bits=bits, ranges=ranges)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
    return ranges


def files_touched(
    path: str, box: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """Footer-only pruning simulation: (files a box predicate must
    read, total files). A file must be read iff for EVERY predicate
    column its per-file [min, max] intersects the box — the same
    row-group stats test Spark's parquet reader and any lakehouse
    engine run before touching data pages. Missing stats => must read
    (never prune blind)."""
    import pyarrow.parquet as pq

    data_files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    touched = 0
    for f in data_files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        must_read = True
        for col, (lo, hi) in box.items():
            idx = names.get(col)
            if idx is None:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if not mins:
                continue  # no stats for this column: cannot prune on it
            if min(mins) > hi or max(maxs) < lo:
                must_read = False
                break
        touched += int(must_read)
    return touched, len(data_files)


def compact_zordered(
    spark,
    path: str,
    dest: str,
    dims: list[str],
    ranges: dict[str, tuple[float, float]],
    bits: int = MAX_BITS,
    target_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Layout maintenance (the OPTIMIZE step): re-cluster a directory
    of many small/append-fragmented parquet files into
    ``target_files`` Z-ordered files. Appends break clustering — each
    appended file spans its own key range, so footer pruning degrades
    toward reading everything; periodic compaction restores it.

    Pass the SAME ``ranges`` the original write used (write_zordered
    returns them; persist alongside the data): recomputing ranges from
    the current data would shift every grid cell and re-cluster the
    whole history, while pinned ranges keep the key space stable so
    compaction is a pure re-sort. New data outside the original range
    clamps into the edge cells (grid_coord) — re-range only when that
    edge mass grows large enough to matter, and accept the full
    rewrite that implies.

    ``bits`` must also match the original write (it shapes the same
    grid the ranges pin). ``dest`` must differ from ``path``:
    overwriting a directory that the same job is lazily reading is a
    data-loss foot-gun Spark only sometimes catches — compact to a new
    directory and swap pointers (the streaming atlas CURRENT-pointer
    pattern).

    One range exchange + in-partition sort over the directory being
    compacted — the same cost as the original write; pair with
    partition-dir granularity (compact one date/shard at a time) so a
    100 TB table never compacts in one job."""
    if os.path.abspath(dest) == os.path.abspath(path):
        raise ValueError(
            "compact_zordered: dest must differ from path (overwrite-"
            "while-reading loses data) — write to a new dir and swap a "
            "pointer, like the streaming atlas publish"
        )
    df = spark.read.parquet(path)
    write_zordered(
        df, dest, dims, bits=bits, n_files=target_files,
        ranges=ranges, mode=mode,
    )
