"""Thermodynamic neutral density (gammat) — SURVEY.md §2.8 F7/F8.

The reference computes gammat via a 30-iteration vectorized bisection
solving rho_ref(zref) = ρ(SR, CT, pr(zref)) against the analytic global
Lorenz reference density profile, followed by a degree-8 polynomial
correction in normalized reference pressure (reference:
src/argostats/lorenz/lorenz_state.py:115-185; the method and all
constants are the published work of Tailleux 2021 / Tailleux & Wolfe,
"gsw_gammat_analytic_CT_exact", public supplementary MATLAB code).

This module reimplements the same published method on this engine's
TEOS-10 75-term density (functions/teos10.py):

- ρref(z) = a/(b+1)·(z+e)^(b+1) + c·z + d — the World-Ocean-Atlas fit
  of Tailleux (2021) with the published parameter set (ID 8/9).
- pr(z) — the exact hydrostatic integral of ρref (g = 9.81, dbar).
- gammat = σref − P8((pref − 1440)/1470) with the published degree-8
  correction coefficients, where σref = ρ(SR, CT, pref) − 1000.

The bisection here keeps explicit lo/hi bracket arrays (the reference
tracks ztop/zbot through sign arithmetic — same fixed-point, different
mechanics), and out-of-range parcels clamp to the surface/bottom. The
reference's own differential-test style (lorenz_state.check():
rewritten kernel vs brute force, allclose) is reproduced in
tests/test_functions.py.

All NumPy-vectorized: inside Spark it runs as an Arrow-batched pandas
UDF over level arrays, the same surface as the other TEOS-10 kernels.
"""

from __future__ import annotations

import numpy as np

from .teos10 import RHO0, rho  # noqa: F401  (RHO0 re-exported for scale uses)

# Published Lorenz reference-profile parameters (Tailleux 2021, ID 8/9).
_A_FIT = 4.56016575
_B_FIT = -1.24898501
_C_FIT = 0.00439778209
_D_FIT = 1030.99373
_E_FIT = 8.32218903

_GRAV = 9.81
ZREF_MAX = 6000.0

# hydrostatic-integral constants of rho_ref
_IA = _A_FIT / ((_B_FIT + 1.0) * (_B_FIT + 2.0))
_ID = _IA * _E_FIT ** (_B_FIT + 2.0)
_IC = _C_FIT / 2.0

# Published degree-8 polynomial correction (Tailleux 2021): gammat =
# sigref − P8(x), x = (pref − 1440)/1470. Coefficients low → high order.
_P8 = np.polynomial.Polynomial(
    [6.431, 6.677, -0.08414, -0.03696, 0.06807, -0.06387, 0.03216, -0.008056, 0.0007824]
)
_P_MEAN = 1440.0
_P_STD = 1470.0


def lorenz_reference_density(zref: np.ndarray) -> np.ndarray:
    """Published analytic Lorenz reference density ρref(z) [kg/m³]
    (Tailleux 2021 World-Ocean-Atlas fit; reference lorenz_state.py:68-84)."""
    z = np.maximum(np.asarray(zref, dtype="f8"), 0.0)
    return _A_FIT / (_B_FIT + 1.0) * (z + _E_FIT) ** (_B_FIT + 1.0) + _C_FIT * z + _D_FIT


def pr_from_zref(zref: np.ndarray) -> np.ndarray:
    """Reference pressure pr(z) [dbar]: exact hydrostatic integral of
    ρref (reference lorenz_state.py:95-100): pr = g/1e4·(IA·(z+e)^(b+2)
    + c/2·z² + d·z − IA·e^(b+2))."""
    z = np.maximum(np.asarray(zref, dtype="f8"), 0.0)
    return (_GRAV / 1e4) * (
        _IA * (z + _E_FIT) ** (_B_FIT + 2.0) + _IC * z * z + _D_FIT * z - _ID
    )


def poly8_correction(pref: np.ndarray) -> np.ndarray:
    """The published degree-8 gammat correction P8((pref−1440)/1470)."""
    return _P8((np.asarray(pref, dtype="f8") - _P_MEAN) / _P_STD)


def gammat_analytic(sr: np.ndarray, ct: np.ndarray, n_iter: int = 30):
    """Vectorized bisection for thermodynamic neutral density.

    For each (SR, CT) sample, find zref ∈ [0, ZREF_MAX] such that
    ρref(zref) = ρ(SR, CT, pr(zref)); return (gammat, zref, pref,
    sigref) exactly like the reference's surface
    (lorenz_state.py:115-185), with gammat = sigref − P8(x).
    """
    sr = np.asarray(sr, dtype="f8")
    ct = np.asarray(ct, dtype="f8")
    lo = np.zeros_like(sr, dtype="f8")
    hi = np.full_like(sr, ZREF_MAX, dtype="f8")

    def f(z):
        return lorenz_reference_density(z) - rho(sr, ct, pr_from_zref(z))

    f_lo = f(lo)
    f_hi = f(hi)
    # no sign change ⇒ no interior root: samples lighter than the surface
    # reference clamp to zref=0 (f>0 everywhere), heavier than the bottom
    # reference clamp to ZREF_MAX (f<0 everywhere)
    clamp_surface = f_lo >= 0.0
    clamp_bottom = f_hi <= 0.0

    for _ in range(n_iter):
        mid = 0.5 * (lo + hi)
        f_mid = f(mid)
        take_low = np.sign(f_mid) == np.sign(f_lo)
        lo = np.where(take_low, mid, lo)
        f_lo = np.where(take_low, f_mid, f_lo)
        hi = np.where(take_low, hi, mid)

    zref = 0.5 * (lo + hi)
    zref = np.where(clamp_surface, 0.0, zref)
    zref = np.where(clamp_bottom, ZREF_MAX, zref)
    pref = pr_from_zref(zref)
    sigref = rho(sr, ct, pref) - 1000.0
    gammat = sigref - poly8_correction(pref)
    return gammat, zref, pref, sigref


def gammat_brute(sr: float, ct: float, n_grid: int = 200_001) -> float:
    """Brute-force oracle: dense zref grid argmin — the differential
    check partner (reference lorenz_state.py:5-29 pattern)."""
    z = np.linspace(0.0, ZREF_MAX, n_grid)
    resid = np.abs(lorenz_reference_density(z) - rho(sr, ct, pr_from_zref(z)))
    zref = z[int(resid.argmin())]
    pref = pr_from_zref(zref)
    sigref = float(rho(sr, ct, pref) - 1000.0)
    return sigref - float(poly8_correction(pref))
