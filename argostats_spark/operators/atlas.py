"""Gridded climatology ("atlas") — SURVEY.md §3.3 / M4+M5.

The reference builds lat/lon grids per domain, crops the profile array
to the domain, tiles it with ±3° halos, and computes per-grid-cell
gaussian-weighted means (and EAPE) in a multiprocessing pool
(reference: src/argostats/atlas.py:379-383, 497-526, 93-142, 152-231).

Spark-first re-expression:

- grid table from spark.range cross-join (F14, atlas.py:83-90)
- optional land-mask gate as a broadcast join *before* compute
  (P10/X9, atlas.py:266-272)
- the tile/halo machinery becomes the binned neighborhood join
  (operators/spatial.py) — one equi-join shuffle, no tiles to assemble
- the weighted per-level mean (A1-A3) runs per cell on Arrow batches
  (applyInPandas), NumPy-vectorized over the (profiles × 64 levels)
  block, exactly the reference's inner kernel shape
- EAPE (A4, R14 algorithm) is the two-pass dataflow: cell-mean profile
  (pass 1) broadcast-joined back to the matched pairs (pass 2).

Scale note: a profile within kernel radius of k cells appears k times
in the pair set — that amplification is inherent to the kernel support
(the reference pays it as per-tile AOS copies, atlas.py:503-514). The
pair set is the one thing worth caching between TS and EAPE passes
(SURVEY §7.4.2).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.blas import limit_blas_threads
from ..functions.teos10 import compute_cf, eape_unit, rho, sound_speed
from ..schemas import DOMAINS, NLEVELS, pref64
from .spatial import explode_neighbor_bins, neighborhood_join, with_bins

# ---------------------------------------------------------------------------
# Grid generation (F14)
# ---------------------------------------------------------------------------


def make_grid(
    spark: SparkSession,
    domain: str | tuple[float, float, float, float],
    reso_deg: float,
) -> DataFrame:
    """Cell-center grid table for a [lon_min, lon_max, lat_min, lat_max]
    domain at ``reso_deg`` (reference get_gridpos, atlas.py:83-90)."""
    if isinstance(domain, str):
        domain = DOMAINS[domain]
    lon_min, lon_max, lat_min, lat_max = domain
    nlon = int(round((lon_max - lon_min) / reso_deg))
    nlat = int(round((lat_max - lat_min) / reso_deg))
    half = reso_deg / 2.0
    lons = spark.range(nlon).select(
        (F.lit(lon_min) + F.col("id") * reso_deg + half).cast("double").alias("glon")
    )
    lats = spark.range(nlat).select(
        (F.lit(lat_min) + F.col("id") * reso_deg + half).cast("double").alias("glat")
    )
    return lons.crossJoin(lats)


def apply_ocean_mask(
    grid: DataFrame,
    mask: DataFrame | None,
    mask_reso_deg: float = 0.1,
) -> DataFrame:
    """P10 land gate: keep ocean cells only, via a broadcast left-semi
    *equi*-join on arithmetic mask-cell indices (J3, the reference's
    nearest-cell lookup re-expressed: bathy/bathy.py:38-50 ``Topo.msk``
    with the idx = (coord - origin)/reso convention of bathy.py:77-78).

    Both sides compute ``lat_idx = floor((lat+90)/reso)``, ``lon_idx =
    floor((lon+180)/reso)`` so Catalyst extracts equi-keys and plans a
    BroadcastHashJoin — O(|grid| + |mask|). A predicate mixing both
    sides in one expression (e.g. round(glon - lon) == 0) has no
    extractable keys and degrades to BroadcastNestedLoopJoin:
    ~6.5e12 comparisons at the reference's 1/10° mask × a 1/4° global
    grid. Plan shape is pinned by tests/test_plans.py.

    mask columns: lat, lon (cell centers), is_ocean — see
    sources/bathy.py.
    """
    if mask is None:
        return grid
    m = mask.filter(F.col("is_ocean") == 1).select(
        F.floor((F.col("lat") + 90.0) / mask_reso_deg).cast("long").alias("lat_idx"),
        F.floor((F.col("lon") + 180.0) / mask_reso_deg).cast("long").alias("lon_idx"),
    )
    g = grid.withColumns(
        {
            "lat_idx": F.floor((F.col("glat") + 90.0) / mask_reso_deg).cast("long"),
            "lon_idx": F.floor((F.col("glon") + 180.0) / mask_reso_deg).cast("long"),
        }
    )
    return g.join(F.broadcast(m), ["lat_idx", "lon_idx"], "left_semi").drop(
        "lat_idx", "lon_idx"
    )


# ---------------------------------------------------------------------------
# Pass 1: weighted per-level means of CT/SR (A1-A3)
# ---------------------------------------------------------------------------

_TS_SCHEMA = T.StructType([
    T.StructField("glon", T.DoubleType(), False),
    T.StructField("glat", T.DoubleType(), False),
    T.StructField("n_points", T.IntegerType(), False),
    T.StructField("CT", T.ArrayType(T.FloatType()), False),
    T.StructField("SR", T.ArrayType(T.FloatType()), False),
    T.StructField("W", T.ArrayType(T.FloatType()), False),
])


def _ts_cell_kernel(theta: float):
    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        limit_blas_threads()
        glon, glat = key
        w = np.exp(-pdf["hav"].to_numpy(dtype="f8") / theta)          # (n,)
        idx = np.stack(pdf["IDX"].to_numpy()).astype("f8")            # (n, 64)
        ct = np.stack(pdf["CT"].to_numpy()).astype("f8")
        sr = np.stack(pdf["SR"].to_numpy()).astype("f8")
        coef = w[:, None] * idx                                       # (n, 64)
        n_lev = coef.sum(axis=0)                                      # (64,)
        ok = n_lev > 0
        ct_m = np.zeros(NLEVELS, dtype="f8")
        sr_m = np.zeros(NLEVELS, dtype="f8")
        ct_m[ok] = (coef * ct).sum(axis=0)[ok] / n_lev[ok]
        sr_m[ok] = (coef * sr).sum(axis=0)[ok] / n_lev[ok]
        return pd.DataFrame(
            {
                "glon": [float(glon)],
                "glat": [float(glat)],
                "n_points": [len(pdf)],
                "CT": [ct_m.astype("f4").tolist()],
                "SR": [sr_m.astype("f4").tolist()],
                "W": [n_lev.astype("f4").tolist()],
            }
        )

    return kernel


def _ts_cell_kernel_arrow(theta: float):
    """Arrow twin of _ts_cell_kernel (row-identical, pinned by test) —
    the DEFAULT since round 5: re-measured at ≥10⁵ cells (VERDICT r4
    item 6) it wins at every group shape; see the clim_ts docstring."""

    def kernel(key, table):
        import pyarrow as pa

        limit_blas_threads()
        glon, glat = (k.as_py() if hasattr(k, "as_py") else k for k in key)
        n = table.num_rows
        hav = table.column("hav").to_numpy(zero_copy_only=False).astype("f8")

        def mat(name: str) -> np.ndarray:
            arr = table.column(name).combine_chunks()
            return (
                arr.flatten().to_numpy(zero_copy_only=False)
                .astype("f8", copy=False).reshape(n, NLEVELS)
            )

        w = np.exp(-hav / theta)
        coef = w[:, None] * mat("IDX")
        n_lev = coef.sum(axis=0)
        ok = n_lev > 0
        ct_m = np.zeros(NLEVELS, dtype="f8")
        sr_m = np.zeros(NLEVELS, dtype="f8")
        ct_m[ok] = (coef * mat("CT")).sum(axis=0)[ok] / n_lev[ok]
        sr_m[ok] = (coef * mat("SR")).sum(axis=0)[ok] / n_lev[ok]
        offs = pa.array(np.array([0, NLEVELS], dtype="i4"))

        def one(v: np.ndarray) -> pa.Array:
            return pa.ListArray.from_arrays(offs, pa.array(v.astype("f4")))

        return pa.table(
            {
                "glon": pa.array([float(glon)], pa.float64()),
                "glat": pa.array([float(glat)], pa.float64()),
                "n_points": pa.array([n], pa.int32()),
                "CT": one(ct_m),
                "SR": one(sr_m),
                "W": one(n_lev),
            }
        )

    return kernel


def match_pairs(
    grid: DataFrame,
    profiles: DataFrame,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    delayed_only: bool = True,
) -> DataFrame:
    """P5 quality gate + J2 neighborhood join → (cell × profile) pairs
    with the exact haversine_arg. The pair set feeds both TS and EAPE
    passes — cache it when computing both."""
    pred = F.col("FLAG") == 1
    if delayed_only:
        pred = pred & (F.col("DATA_MODE") == 1)  # reference atlas.py:253 (P5, parameterized here)
    pts = profiles.filter(pred).select(
        F.col("LONGITUDE").cast("double").alias("lon"),
        F.col("LATITUDE").cast("double").alias("lat"),
        "CT", "SR", "IDX",
    )
    return neighborhood_join(
        grid, pts, radius_deg=smoothing_factor * reso_deg,
    )


def clim_ts(
    grid: DataFrame,
    profiles: DataFrame,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    pairs: DataFrame | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Weighted-mean CT/SR climatology per ocean grid cell (the
    reference's clim_TS, atlas.py:427-437 → proceed_TS_tile:256-279).

    ``engine``: "arrow" (default) or "pandas" — row-identical, pinned by
    test. RE-MEASURED round 5 at the 1/4°-global group shape the
    earlier 2k-cell measurement could not see (scripts/bench_atlas.py,
    local[32], warm-min of 3): 128k cells / 4.3M pairs — arrow 7.3s vs
    pandas 38.3s (5.3×) vs exploded 27.8s; 400 cells / 454k pairs —
    arrow 1.7s vs pandas 5.5s (3.2×). The flat-buffer transport also
    ran far steadier across runs (pandas object-column batches churn
    the worker GC: 15-47s spread). This retires round 4's
    "pandas wins at small groups" note — arrow wins at every measured
    cell count; "pandas" remains as the fallback where applyInArrow is
    unavailable."""
    theta = math.sin(math.radians(smoothing_factor * reso_deg) / 2.0) ** 2
    if pairs is None:
        pairs = match_pairs(grid, profiles, reso_deg, smoothing_factor)
    # pin parallelism for the Python kernel stage (AQE coalescing targets
    # bytes, not UDF CPU — see interpolation.py note)
    n = pairs.sparkSession.sparkContext.defaultParallelism
    # ship only what the kernel reads (round 14, guide §4.1):
    # applyInArrow/applyInPandas forward EVERY input column into the
    # Python worker, so the join's lon/lat (16 B/pair, unused by the
    # kernel) would otherwise cross the repartition exchange AND the
    # Arrow boundary on every pair row
    pairs = pairs.select("glon", "glat", "hav", "CT", "SR", "IDX")
    grouped = pairs.repartition(n, "glon", "glat").groupBy("glon", "glat")
    if engine == "arrow" and hasattr(grouped, "applyInArrow"):
        return grouped.applyInArrow(_ts_cell_kernel_arrow(theta), _TS_SCHEMA)
    return grouped.applyInPandas(_ts_cell_kernel(theta), _TS_SCHEMA)


def clim_ts_exploded(
    grid: DataFrame,
    profiles: DataFrame,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Pure-expression alternative to clim_ts (SURVEY §7.3 'benchmark
    both'): posexplode the 64-level arrays, aggregate per (cell, level)
    entirely in whole-stage codegen, reassemble arrays with
    sort_array(collect_list(...)).

    Tradeoff vs the applyInPandas kernel: 64× the shuffle rows but no
    Python workers and true partial aggregation (map-side combine
    shrinks the exchange to |cells|×64 rows regardless of pair count).

    ATLAS_BENCH (scripts/bench_atlas.py, local[32], 454k pairs / 400
    cells): applyInPandas 2.2s vs exploded 3.9s warm — the Arrow batch +
    NumPy matrix kernel wins at regional scale, so it is the default
    (clim_ts). The exploded form bounds its EXCHANGE by map_tasks ×
    |cells| × 64 partial-agg rows independent of pair count, where the
    kernel variant shuffles the full pair set with arrays attached
    (~850 B/pair). Measured at sf1-equivalent (3M profiles, 352M pairs,
    1° global, polar skew — scripts/bench_atlas_scale.py, SCALE.md):
    exploded completes in 361 s on one node; the kernel variant's
    ~150 GB pair shuffle exceeds local disk (ENOSPC at ≥1.5M profiles).
    Prefer exploded for global fine grids, extreme fan-in/skew, or
    disk-constrained shuffle."""
    theta = math.sin(math.radians(smoothing_factor * reso_deg) / 2.0) ** 2
    if pairs is None:
        pairs = match_pairs(grid, profiles, reso_deg, smoothing_factor)
    w = F.exp(-F.col("hav") / F.lit(theta))
    ex = pairs.select(
        "glon", "glat", w.alias("w"),
        F.posexplode(F.arrays_zip("CT", "SR", "IDX")).alias("lev", "z"),
    ).select(
        "glon", "glat", "lev",
        (F.col("w") * F.col("z.IDX")).alias("coef"),
        F.col("z.CT").alias("ct"),
        F.col("z.SR").alias("sr"),
    )
    per_level = ex.groupBy("glon", "glat", "lev").agg(
        F.sum("coef").alias("n_lev"),
        F.sum(F.col("coef") * F.col("ct")).alias("s_ct"),
        F.sum(F.col("coef") * F.col("sr")).alias("s_sr"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    guarded = per_level.select(
        "glon", "glat", "lev", "n_lev", "n_rows",
        F.when(F.col("n_lev") > 0, F.col("s_ct") / F.col("n_lev")).otherwise(0.0).alias("ct_m"),
        F.when(F.col("n_lev") > 0, F.col("s_sr") / F.col("n_lev")).otherwise(0.0).alias("sr_m"),
    )
    packed = guarded.groupBy("glon", "glat").agg(
        (F.max("n_rows")).cast("int").alias("n_points"),
        F.sort_array(F.collect_list(F.struct("lev", "ct_m", "sr_m", "n_lev"))).alias("z"),
    )
    return packed.select(
        "glon", "glat", "n_points",
        F.transform("z", lambda s: s["ct_m"].cast("float")).alias("CT"),
        F.transform("z", lambda s: s["sr_m"].cast("float")).alias("SR"),
        F.transform("z", lambda s: s["n_lev"].cast("float")).alias("W"),
    )


# measured pair-shuffle cost of the applyInPandas variant: ~850 bytes
# per (cell, profile) pair with the 64-level arrays attached (SCALE.md)
PAIR_SHUFFLE_BYTES = 850


def estimate_pair_count(
    grid: DataFrame,
    profiles: DataFrame,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    delayed_only: bool = True,
) -> int:
    """EXACT size of the binned neighborhood join's output before the
    haversine cutoff (an upper bound on the pair set, ~4/π over it for
    uniform density): Σ_bins |exploded grid rows| × |profiles|. Costs
    two tiny count-aggregations — the profile side map-combines to one
    row per occupied bin — and one driver scalar; nothing like the join
    itself runs."""
    radius = smoothing_factor * reso_deg
    bin_deg = max(radius, 1.0)
    pred = F.col("FLAG") == 1
    if delayed_only:
        pred = pred & (F.col("DATA_MODE") == 1)
    p_hist = (
        with_bins(profiles.filter(pred), "LONGITUDE", "LATITUDE", bin_deg)
        .groupBy("lon_bin", "lat_bin")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    g_hist = (
        explode_neighbor_bins(grid, "glon", "glat", radius, bin_deg)
        .groupBy("lon_bin", "lat_bin")
        .agg(F.count(F.lit(1)).alias("n_g"))
    )
    row = (
        g_hist.join(p_hist, on=["lon_bin", "lat_bin"])
        .agg(F.sum(F.col("n_g") * F.col("n_p")).alias("pairs"))
        .first()
    )
    return int(row["pairs"] or 0)


def choose_clim_ts_variant(
    grid: DataFrame,
    profiles: DataFrame,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    max_pair_shuffle_gb: float = 24.0,
) -> str:
    """The routing decision of clim_ts_auto, separately callable (and
    separately testable): 'kernel' while the estimated pair shuffle fits
    the budget, else 'exploded'."""
    est = estimate_pair_count(grid, profiles, reso_deg, smoothing_factor)
    return (
        "kernel" if est * PAIR_SHUFFLE_BYTES <= max_pair_shuffle_gb * 1e9 else "exploded"
    )


def clim_ts_auto(
    grid: DataFrame,
    profiles: DataFrame,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    max_pair_shuffle_gb: float = 24.0,
    variant: str | None = None,
) -> DataFrame:
    """A3 with automatic physical-variant selection (the SCALE.md
    crossover, previously a caller choice): estimate the pair-set
    shuffle of the applyInPandas kernel; if it fits the budget the
    Arrow+NumPy kernel wins (measured 2.6-2.9×), otherwise route to the
    exploded expression aggregate whose exchange is pair-count-
    independent (map-side combine to |cells|×64 rows) — a global polar-
    skewed fine grid at 3M profiles is 352M pairs ≈ 300 GB of kernel
    shuffle, which ENOSPCed a single node but streams through the
    exploded variant in 361 s (SCALE.md). ``variant`` forces
    'kernel'/'exploded' explicitly."""
    if variant is None:
        variant = choose_clim_ts_variant(
            grid, profiles, reso_deg, smoothing_factor, max_pair_shuffle_gb
        )
    if variant not in ("kernel", "exploded"):
        raise ValueError(f"unknown clim_ts variant: {variant!r}")
    fn = clim_ts if variant == "kernel" else clim_ts_exploded
    return fn(grid, profiles, reso_deg, smoothing_factor)


# per-variable units, matching the reference's UNITS table
# (atlas.py:39-46; plain text rather than TeX markup)
ATLAS_UNITS = {
    "CT": "degC",
    "SR": "g kg-1",
    "RHO": "kg m-3",
    "EAPE": "cm2 s-2",
    "W": "1",
    "lat": "degrees_north",
    "lon": "degrees_east",
    "pres": "dbar",
}


def export_atlas_netcdf(
    atlas_df: DataFrame, path: str, global_attrs: dict | None = None
) -> None:
    """NetCDF atlas export (S9, reference atlas.py:576-635): the gridded
    result is small (cells × 64 floats) so a driver-side assemble is
    appropriate — the primary sink stays Parquet. Written as NetCDF-3
    classic via the dependency-free codec (sources/netcdf3.py, public
    CDF-1 format); netCDF4/xarray read these files natively, so the
    export is REAL in this container, not an env-gated stub.

    Per-variable ``units`` and the global provenance attributes ride in
    the header like the reference's write_atlas_to_netcdf (atlas.py:
    576-607); pass e.g. ``{"latest_profile": str(max_juld)}`` to stamp
    the A10 freshness metadata the reference derives from the AOS."""
    from ..sources.netcdf3 import write_netcdf3

    pdf = atlas_df.orderBy("glat", "glon").toPandas()

    lats = np.sort(pdf.glat.unique())
    lons = np.sort(pdf.glon.unique())
    li = {v: i for i, v in enumerate(lats)}
    lo = {v: i for i, v in enumerate(lons)}
    ix = pdf.glat.map(li).to_numpy()
    jx = pdf.glon.map(lo).to_numpy()
    dims = {"lat": len(lats), "lon": len(lons), "pres": NLEVELS}
    variables: dict = {
        "lat": (("lat",), lats.astype("f4")),
        "lon": (("lon",), lons.astype("f4")),
        "pres": (("pres",), pref64().astype("f4")),
    }
    if "n_points" in pdf.columns:
        npts = np.zeros((len(lats), len(lons)), "i4")
        npts[ix, jx] = pdf.n_points.to_numpy().astype("i4")
        variables["n_points"] = (("lat", "lon"), npts)
    for var in ("CT", "SR", "W", "RHO", "EAPE"):
        if var in pdf.columns:
            grid = np.full((len(lats), len(lons), NLEVELS), np.nan, "f4")
            grid[ix, jx, :] = np.stack(pdf[var].to_numpy()).astype("f4")
            variables[var] = (("lat", "lon", "pres"), grid)
    gattrs = {"name": "Atlas of Argo statistics", **(global_attrs or {})}
    vattrs = {v: {"units": ATLAS_UNITS[v]} for v in variables if v in ATLAS_UNITS}
    write_netcdf3(path, dims, variables, global_attrs=gattrs, var_attrs=vattrs)


# ---------------------------------------------------------------------------
# Pass 2: EAPE, R14 algorithm (A4; atlas.py:152-191, 281-298)
# ---------------------------------------------------------------------------

_EAPE_SCHEMA = T.StructType([
    T.StructField("glon", T.DoubleType(), False),
    T.StructField("glat", T.DoubleType(), False),
    T.StructField("n_points", T.IntegerType(), False),
    T.StructField("RHO", T.ArrayType(T.FloatType()), False),
    T.StructField("EAPE", T.ArrayType(T.FloatType()), False),
])


def _eape_integrand(
    rho_i, sr, ct, rho_bar, ct_bar, sr_bar, pref, unit, algo: str
):
    """eape_i for one (rows × 64) block — shared by the per-pair
    kernels (legacy payload) and the per-profile feature pass (fast
    payload), so both paths run the SAME elementwise f8 arithmetic."""
    if algo == "R14":
        # displacement against the *local* cell-mean profile via
        # isopycnal lookup (atlas.py:184-191)
        cf = compute_cf(rho_bar, sound_speed(sr_bar, ct_bar, pref), pref)
        ref_curve = np.maximum.accumulate(rho_bar * cf)
        disp = np.interp(
            (rho_i * cf[None, :]).ravel(), ref_curve, pref
        ).reshape(rho_i.shape)
        return 0.5 * unit * (rho_i - rho_bar[None, :]) * (disp - pref[None, :])
    if algo == "T25":
        # displacement against the *global* analytic Lorenz profile
        # via gammat bisection (atlas.py:194-231, 300-304)
        from ..functions.lorenz import (
            gammat_analytic,
            lorenz_reference_density,
            pr_from_zref,
        )

        _, zref, _, _ = gammat_analytic(sr.ravel(), ct.ravel())
        disp = pr_from_zref(zref).reshape(rho_i.shape)
        rho_ref_here = lorenz_reference_density(pref)[None, :]
        return 0.5 * unit * (rho_i - rho_ref_here) * (disp - pref[None, :])
    raise ValueError(f"unknown EAPE algo {algo!r} (R14 or T25)")


def _eape_cell_kernel(theta: float, algo: str = "R14", feat: str | None = None):
    """Per-cell EAPE weighted mean (pandas transport). ``feat`` names a
    precomputed per-profile column in the fast payload ("RHO_I" for
    R14, "EI" for T25 — see _eape_profile_features); feat=None is the
    legacy payload (CT/SR aboard every pair, all per-profile math
    in-kernel)."""
    pref = pref64().astype("f8")
    unit = eape_unit()

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        limit_blas_threads()
        glon, glat = key
        w = np.exp(-pdf["hav"].to_numpy(dtype="f8") / theta)
        idx = np.stack(pdf["IDX"].to_numpy()).astype("f8")
        ct_bar = np.asarray(pdf["CT_BAR"].iloc[0], dtype="f8")
        sr_bar = np.asarray(pdf["SR_BAR"].iloc[0], dtype="f8")

        # mean-profile density + compressibility factor (atlas.py:316-324)
        rho_bar = rho(sr_bar, ct_bar, pref)
        if feat == "EI":
            eape_i = np.stack(pdf["EI"].to_numpy()).astype("f8")
        else:
            if feat == "RHO_I":
                rho_i = np.stack(pdf["RHO_I"].to_numpy()).astype("f8")
                sr = ct = None
            else:
                ct = np.stack(pdf["CT"].to_numpy()).astype("f8")
                sr = np.stack(pdf["SR"].to_numpy()).astype("f8")
                rho_i = rho(sr, ct, pref[None, :])
            eape_i = _eape_integrand(
                rho_i, sr, ct, rho_bar, ct_bar, sr_bar, pref, unit, algo
            )

        coef = w[:, None] * idx
        n_lev = coef.sum(axis=0)
        ok = n_lev > 0
        eape_m = np.zeros(NLEVELS, dtype="f8")
        eape_m[ok] = (coef * eape_i).sum(axis=0)[ok] / n_lev[ok]
        return pd.DataFrame(
            {
                "glon": [float(glon)],
                "glat": [float(glat)],
                "n_points": [len(pdf)],
                "RHO": [rho_bar.astype("f4").tolist()],
                "EAPE": [eape_m.astype("f4").tolist()],
            }
        )

    return kernel


def _eape_cell_kernel_arrow(
    theta: float, algo: str = "R14", feat: str | None = None
):
    """Arrow twin of :func:`_eape_cell_kernel` (round 14) — the same
    flat-buffer transport the TS kernel adopted in round 5 (measured
    3-5× on batch materialization there; pandas object-column stacks
    churn the worker GC). Row-identical to the pandas kernel, pinned
    by tests/test_argo_pipeline.py."""
    pref = pref64().astype("f8")
    unit = eape_unit()

    def kernel(key, table):
        import pyarrow as pa

        limit_blas_threads()
        glon, glat = (k.as_py() if hasattr(k, "as_py") else k for k in key)
        n = table.num_rows

        def mat(name: str) -> np.ndarray:
            arr = table.column(name).combine_chunks()
            return (
                arr.flatten().to_numpy(zero_copy_only=False)
                .astype("f8", copy=False).reshape(n, NLEVELS)
            )

        hav = table.column("hav").to_numpy(zero_copy_only=False).astype("f8")
        ct_bar = np.asarray(table.column("CT_BAR")[0].as_py(), dtype="f8")
        sr_bar = np.asarray(table.column("SR_BAR")[0].as_py(), dtype="f8")
        w = np.exp(-hav / theta)
        idx = mat("IDX")
        rho_bar = rho(sr_bar, ct_bar, pref)
        if feat == "EI":
            eape_i = mat("EI")
        else:
            if feat == "RHO_I":
                rho_i = mat("RHO_I")
                sr = ct = None
            else:
                ct = mat("CT")
                sr = mat("SR")
                rho_i = rho(sr, ct, pref[None, :])
            eape_i = _eape_integrand(
                rho_i, sr, ct, rho_bar, ct_bar, sr_bar, pref, unit, algo
            )
        coef = w[:, None] * idx
        n_lev = coef.sum(axis=0)
        ok = n_lev > 0
        eape_m = np.zeros(NLEVELS, dtype="f8")
        eape_m[ok] = (coef * eape_i).sum(axis=0)[ok] / n_lev[ok]
        offs = pa.array(np.array([0, NLEVELS], dtype="i4"))

        def one(v: np.ndarray) -> pa.Array:
            return pa.ListArray.from_arrays(offs, pa.array(v.astype("f4")))

        return pa.table(
            {
                "glon": pa.array([float(glon)], pa.float64()),
                "glat": pa.array([float(glat)], pa.float64()),
                "n_points": pa.array([n], pa.int32()),
                "RHO": one(rho_bar),
                "EAPE": one(eape_m),
            }
        )

    return kernel


def _eape_profile_features(pts: DataFrame, algo: str) -> DataFrame:
    """The cell-independent part of the EAPE integrand, computed ONCE
    per PROFILE instead of once per (cell × profile) pair (round 14,
    guide §1.2 "the distributed algorithm first").

    A profile within kernel radius of k cells appears k times in the
    pair set (k ≈ 12-20 at the bench grids, and it grows with the
    kernel radius). The 75-term TEOS-10 density polynomial (both
    algos) and the 30-iteration gammat bisection (T25 — itself 30
    more 75-term evaluations) depend only on the profile's own
    (SR, CT), so evaluating them inside the per-cell kernel re-pays
    them k times. This one Arrow pass over the profile table computes

    - R14: ``RHO_I`` — ρ(SR, CT, pref) per level (the R14 kernel still
      needs the cell-mean curve for the isopycnal lookup, so only the
      density moves out of the kernel);
    - T25: ``EI`` — the FULL per-profile integrand
      0.5·unit·(ρᵢ − ρref)·(disp − pref): displacement is against the
      global Lorenz profile, so nothing in eape_i depends on the cell.

    Values are elementwise f8, identical arithmetic to the in-kernel
    path (shared :func:`_eape_integrand`), so the downstream weighted
    mean consumes bitwise-identical inputs. The pair shuffle carries
    one f8 array instead of the two f4 CT/SR arrays."""
    import pyarrow as pa

    feat = {"R14": "RHO_I", "T25": "EI"}[algo]
    pref = pref64().astype("f8")
    unit = eape_unit()
    schema = T.StructType([
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("IDX", pts.schema["IDX"].dataType),
        T.StructField(feat, T.ArrayType(T.DoubleType())),
    ])

    def gen(batches):
        limit_blas_threads()
        for tb in batches:  # RecordBatch per mapInArrow contract
            n = tb.num_rows
            if n == 0:
                continue

            def mat(name: str) -> np.ndarray:
                arr = tb.column(name)
                return (
                    arr.flatten().to_numpy(zero_copy_only=False)
                    .astype("f8", copy=False).reshape(n, NLEVELS)
                )

            sr = mat("SR")
            ct = mat("CT")
            rho_i = rho(sr, ct, pref[None, :])
            if algo == "R14":
                out = rho_i
            else:
                # rho_bar/ct_bar/sr_bar unused by the T25 branch
                out = _eape_integrand(
                    rho_i, sr, ct, None, None, None, pref, unit, "T25"
                )
            offs = pa.array(
                np.arange(0, (n + 1) * NLEVELS, NLEVELS, dtype="i4")
            )
            yield pa.record_batch({
                "lon": tb.column("lon"),
                "lat": tb.column("lat"),
                "IDX": tb.column("IDX"),
                feat: pa.ListArray.from_arrays(offs, pa.array(out.ravel())),
            })

    return pts.mapInArrow(gen, schema)


def clim_eape(
    grid: DataFrame,
    profiles: DataFrame,
    reso_deg: float,
    smoothing_factor: float = 4.0,
    pairs: DataFrame | None = None,
    ts: DataFrame | None = None,
    algo: str = "R14",
    engine: str = "arrow",
) -> DataFrame:
    """EAPE climatology: pass 1 cell means → joined back to the pair set
    → per-pair displacement/EAPE → weighted mean (SURVEY §7.4.2 two-pass
    dataflow).

    algo="R14": isopycnal displacement against the local cell-mean
    profile (Roullet et al. 2014). algo="T25": displacement against the
    global analytic Lorenz profile via the gammat bisection (Tailleux &
    Roullet 2025). Same dataflow, different per-pair kernel — unlike the
    reference, the algo switch can't leave variables unbound
    (atlas.py:439-448 defect, SURVEY §2.11).

    Round-14 physical-plan changes (measured, scripts/bench_eape_ab.py;
    output row-identical either way, pinned by tests):

    - ``engine="arrow"`` (default where applyInArrow exists): the cell
      kernel rides the same flat-buffer transport the TS kernel
      adopted in round 5; "pandas" is the fallback.
    - the broadcast means join-back attaches AFTER the pair
      repartition, so the per-cell CT_BAR/SR_BAR arrays (512 B/pair of
      per-cell constants) never cross the pair exchange — the
      BroadcastHashJoin preserves the streamed side's partitioning, so
      the groupBy still needs no extra shuffle (plan-pinned).
    - T25 with the pair set built HERE (``pairs=None``): the
      cell-independent integrand (density + gammat bisection — ALL of
      eape_i, since T25 displaces against the global Lorenz profile)
      moves out of the per-pair kernel into one per-PROFILE Arrow
      pass (:func:`_eape_profile_features`), gated by a bin-cover
      semi-join so only profiles that can reach the grid pay it — a
      profile within radius of k cells otherwise pays the bisection
      k times. R14 keeps the per-pair payload everywhere (its
      cell-independent part is just one density evaluation; measured,
      the extra Python pass costs more than the dedup saves). A
      caller-supplied ``pairs`` (the cached pair set
      argo_atlas_pipeline shares between TS and both EAPE passes)
      keeps the legacy per-pair payload — identical results on every
      path (pinned)."""
    theta = math.sin(math.radians(smoothing_factor * reso_deg) / 2.0) ** 2
    n = grid.sparkSession.sparkContext.defaultParallelism
    # T25 only: R14's cell-independent work is just the density
    # polynomial — measured (scripts/bench_eape_ab.py) the extra
    # Python pass costs more than the k-fold dedup saves there, so
    # R14 keeps the per-pair payload. T25's per-pair work is the
    # 30-iteration gammat bisection (30 more 75-term evaluations),
    # which dwarfs the pass.
    feat = "EI" if algo == "T25" else None
    if pairs is None and feat is not None:
        # fast path: per-profile features, then the neighborhood join
        # ships (hav, IDX, feat) per pair — one f8 array instead of
        # the two f4 CT/SR arrays the legacy payload carried
        radius = smoothing_factor * reso_deg
        pred = (F.col("FLAG") == 1) & (F.col("DATA_MODE") == 1)
        pts = profiles.filter(pred).select(
            F.col("LONGITUDE").cast("double").alias("lon"),
            F.col("LATITUDE").cast("double").alias("lat"),
            "CT", "SR", "IDX",
        )
        # bin-cover semi-join BEFORE the feature pass: on a regional
        # grid most profiles can't reach any cell, and the bisection
        # must not run for them (on a global grid every bin is
        # covered and this is one cheap broadcast semi-join). Same
        # bin geometry as the neighborhood join ⇒ provably a superset
        # of the join's point side.
        bin_deg = max(radius, 1.0)
        gbins = (
            explode_neighbor_bins(grid, "glon", "glat", radius, bin_deg)
            .select("lon_bin", "lat_bin").distinct()
        )
        pts = with_bins(pts, "lon", "lat", bin_deg).join(
            F.broadcast(gbins), ["lon_bin", "lat_bin"], "left_semi"
        ).drop("lon_bin", "lat_bin")
        payload = neighborhood_join(
            grid, _eape_profile_features(pts, algo), radius_deg=radius,
        ).select("glon", "glat", "hav", "IDX", feat)
        if ts is None:
            ts = clim_ts(grid, profiles, reso_deg, smoothing_factor)
    else:
        if pairs is None:
            pairs = match_pairs(grid, profiles, reso_deg, smoothing_factor)
        if ts is None:
            ts = clim_ts(grid, profiles, reso_deg, smoothing_factor,
                         pairs=pairs)
        feat = None  # legacy per-pair payload (or unknown algo: the
        # kernel raises at run time, matching the pre-r14 behavior)
        payload = pairs.select("glon", "glat", "hav", "CT", "SR", "IDX")
    means = ts.select(
        "glon", "glat",
        F.col("CT").alias("CT_BAR"), F.col("SR").alias("SR_BAR"),
    )
    grouped = (
        payload.repartition(n, "glon", "glat")
        .join(F.broadcast(means), on=["glon", "glat"])
        .groupBy("glon", "glat")
    )
    if engine == "arrow" and hasattr(grouped, "applyInArrow"):
        return grouped.applyInArrow(
            _eape_cell_kernel_arrow(theta, algo, feat), _EAPE_SCHEMA
        )
    return grouped.applyInPandas(
        _eape_cell_kernel(theta, algo, feat), _EAPE_SCHEMA
    )
