"""Property test for the binned neighborhood join (SURVEY.md §7.4.1):
the bin cover must provably contain the kernel support, so
binned-join ≡ brute-force cross join + distance filter — including
longitude wraparound and high-latitude meridian convergence (the two
ways a fixed halo goes wrong; the reference hard-codes width=3°,
atlas.py:502).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from argostats_spark.functions.geo import haversine_arg
from argostats_spark.operators.spatial import kernel_weighted_mean, neighborhood_join


def _brute_force(spark, grid_pdf, pts_pdf, radius_deg):
    cutoff = math.sin(math.radians(radius_deg) / 2.0) ** 2
    g = spark.createDataFrame(grid_pdf)
    p = spark.createDataFrame(pts_pdf)
    return (
        g.crossJoin(p)
        .withColumn("hav", haversine_arg("glon", "glat", "lon", "lat"))
        .filter(F.col("hav") <= cutoff)
    )


@pytest.mark.parametrize(
    "case",
    [
        # (grid lat range, point lat range, radius) — mid-lat, polar, wrap
        ((-40, 40), (-50, 50), 5.0),
        ((60, 85), (55, 88), 8.0),     # meridian convergence
        ((-80, -60), (-85, -55), 12.0),
    ],
)
def test_binned_equals_brute_force(spark, case):
    (g_lo, g_hi), (p_lo, p_hi), radius = case
    rng = np.random.default_rng(hash(case) % 2**32)
    grid_pdf = pd.DataFrame({
        "glon": rng.uniform(-180, 180, 40),
        "glat": rng.uniform(g_lo, g_hi, 40),
        "cell_id": np.arange(40),
    })
    pts_pdf = pd.DataFrame({
        "lon": rng.uniform(-180, 180, 300),
        "lat": rng.uniform(p_lo, p_hi, 300),
        "pt_id": np.arange(300),
    })

    brute = _brute_force(spark, grid_pdf, pts_pdf, radius)
    binned = neighborhood_join(
        spark.createDataFrame(grid_pdf), spark.createDataFrame(pts_pdf),
        radius_deg=radius,
    )
    want = {(r.cell_id, r.pt_id) for r in brute.select("cell_id", "pt_id").collect()}
    got = {(r.cell_id, r.pt_id) for r in binned.select("cell_id", "pt_id").collect()}
    missing = want - got
    extra = got - want
    assert not missing, f"binned join dropped true pairs: {sorted(missing)[:10]}"
    assert not extra, f"binned join kept out-of-radius pairs: {sorted(extra)[:10]}"


def test_wraparound_pair_found(spark):
    """A grid cell at lon=179.5 must see a point at lon=-179.5."""
    grid = spark.createDataFrame(pd.DataFrame({"glon": [179.5], "glat": [0.0]}))
    pts = spark.createDataFrame(pd.DataFrame({"lon": [-179.5], "lat": [0.0], "v": [1.0]}))
    out = neighborhood_join(grid, pts, radius_deg=2.0).collect()
    assert len(out) == 1


def test_kernel_weighted_mean_single_point(spark):
    """FIXTURES.md §5 golden (a): one point exactly at a grid center ⇒
    the cell mean equals that point's value, weight 1."""
    grid = spark.createDataFrame(pd.DataFrame({"glon": [10.0, 50.0], "glat": [0.0, 20.0]}))
    pts = spark.createDataFrame(
        pd.DataFrame({"lon": [10.0], "lat": [0.0], "val": [42.0]})
    )
    out = kernel_weighted_mean(grid, pts, ["val"], reso_deg=1.0, smoothing_factor=4.0)
    rows = out.collect()
    assert len(rows) == 1  # the far cell has no support
    r = rows[0]
    assert (r.glon, r.glat) == (10.0, 0.0)
    assert r.mean_val == pytest.approx(42.0)
    assert r.sum_w == pytest.approx(1.0)


def test_kernel_weighted_mean_symmetric_pair(spark):
    """FIXTURES.md §5 golden (b): two symmetric points ⇒ exact average."""
    grid = spark.createDataFrame(pd.DataFrame({"glon": [0.0], "glat": [0.0]}))
    pts = spark.createDataFrame(
        pd.DataFrame({"lon": [-1.0, 1.0], "lat": [0.0, 0.0], "val": [10.0, 30.0]})
    )
    out = kernel_weighted_mean(grid, pts, ["val"], reso_deg=1.0, smoothing_factor=4.0)
    r = out.collect()[0]
    assert r.mean_val == pytest.approx(20.0)
    assert r.n_points == 2
