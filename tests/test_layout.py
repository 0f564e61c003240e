"""Z-order layout (operators/layout.py): Morton key correctness vs a
plain-Python bit-interleave, and the data-skipping claim itself —
a box predicate prunes files under a Z-ordered layout that a linear
sort cannot prune."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.layout import (
    files_touched,
    grid_coord,
    morton_key,
    write_zordered,
    zorder_key,
)


def _py_spread(v: int) -> int:
    out = 0
    for b in range(16):
        out |= ((v >> b) & 1) << (2 * b)
    return out


def _py_morton(x: int, y: int) -> int:
    return _py_spread(x) | (_py_spread(y) << 1)


def test_morton_matches_python_reference(spark):
    vals = [0, 1, 2, 3, 255, 256, 12345, 65535, 40000, 21845, 43690]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", morton_key("x", "y").alias("z")).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_grid_coord_clamps_and_degenerates(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (105.0,)], "v double"
    )
    got = [r[0] for r in df.select(grid_coord("v", 0.0, 100.0, bits=4)).collect()]
    # 16 cells over [0, 100): -5 clamps to 0, 100/105 clamp to 15
    assert got == [0, 0, 8, 15, 15]
    flat = [r[0] for r in df.select(grid_coord("v", 7.0, 7.0)).collect()]
    assert flat == [0] * 5
    with pytest.raises(ValueError, match="bits"):
        grid_coord("v", 0.0, 1.0, bits=99)
    with pytest.raises(ValueError, match="exactly 2"):
        zorder_key(df, ["v"])


@pytest.fixture(scope="module")
def xy_frame(spark):
    # 20k points spread over a [0,97) x [0,89) rectangle, decorrelated
    rows = [(i, float(i % 97), float((i * 7919) % 89)) for i in range(20_000)]
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_zorder_prunes_where_linear_sort_cannot(spark, xy_frame, tmp_path):
    zdir, ldir = str(tmp_path / "zord"), str(tmp_path / "linear")
    write_zordered(xy_frame, zdir, ["x", "y"], n_files=16)
    (
        xy_frame.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    # box selective on y ONLY: the x-sorted layout spreads every y
    # everywhere -> reads all files; the Z layout keeps y min/max tight
    box_y = {"y": (10.0, 20.0)}
    zt, ztot = files_touched(zdir, box_y)
    lt, ltot = files_touched(ldir, box_y)
    assert ztot == ltot == 16
    assert lt == 16, "linear-on-x layout cannot prune a y-only predicate"
    assert zt <= 8, f"z-order should skip most files on a y box, read {zt}"

    # box on BOTH dims: z-order still prunes
    box_xy = {"x": (10.0, 25.0), "y": (10.0, 20.0)}
    zt2, _ = files_touched(zdir, box_xy)
    assert zt2 <= zt

    # both layouts return identical rows for the box predicate
    pred = "y >= 10.0 AND y <= 20.0 AND x >= 10.0 AND x <= 25.0"
    a = sorted(r["id"] for r in spark.read.parquet(zdir).filter(pred).collect())
    b = sorted(r["id"] for r in spark.read.parquet(ldir).filter(pred).collect())
    assert a == b and len(a) > 0


def test_write_zordered_returns_reusable_ranges(spark, xy_frame, tmp_path):
    d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    ranges = write_zordered(xy_frame, d1, ["x", "y"], n_files=4)
    assert ranges["x"] == (0.0, 96.0) and ranges["y"] == (0.0, 88.0)
    # second write with pinned ranges: byte-identical clustering
    write_zordered(xy_frame, d2, ["x", "y"], n_files=4, ranges=ranges)
    key, _ = zorder_key(xy_frame, ["x", "y"], ranges=ranges)
    a = spark.read.parquet(d1).withColumn("z", key).groupBy().sum("z").first()[0]
    b = spark.read.parquet(d2).withColumn("z", key).groupBy().sum("z").first()[0]
    assert a == b


def test_compact_restores_pruning_after_appends(spark, xy_frame, tmp_path):
    from argostats_spark.operators.layout import compact_zordered

    frag = str(tmp_path / "frag")
    # simulate append fragmentation: 8 arrival slices, each written
    # unsorted — every file spans the full (x, y) range
    ranges = {"x": (0.0, 96.0), "y": (0.0, 88.0)}
    for i in range(8):
        (
            xy_frame.filter(F.col("id") % 8 == i)
            .write.mode("append").parquet(frag)
        )
    box = {"y": (10.0, 20.0)}
    before, total_before = files_touched(frag, box)
    assert before == total_before, "fragmented layout prunes nothing"

    dest = str(tmp_path / "compacted")
    compact_zordered(spark, frag, dest, ["x", "y"], ranges, target_files=16)
    after, total_after = files_touched(dest, box)
    assert total_after == 16 and after <= 8
    # lossless
    a = sorted(r["id"] for r in spark.read.parquet(frag).collect())
    b = sorted(r["id"] for r in spark.read.parquet(dest).collect())
    assert a == b
