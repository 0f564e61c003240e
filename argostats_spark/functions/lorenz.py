"""Thermodynamic neutral density (gammat) — SURVEY.md §2.8 F7/F8.

The reference computes gammat via a 30-iteration vectorized bisection
solving rho_ref(zref) = ρ(SR, CT, pr(zref)) against an analytic global
(Lorenz) reference density profile, followed by a polynomial correction
(reference: src/argostats/lorenz/lorenz_state.py:115-185, 63-100; the
method is Tailleux & Roullet 2025 / Tailleux 2021 — published work).

This module reimplements the same *algorithmic structure* — analytic
monotone reference profile, fixed-iteration vectorized bisection,
polynomial correction hook — with this engine's simplified EOS
(functions/teos10.py) standing in for the 75-term TEOS-10 polynomial
where gsw is unavailable. The reference's own differential-test style
(lorenz_state.check(): rewritten kernel vs brute force, allclose) is
reproduced in tests/test_functions.py.

All NumPy-vectorized: inside Spark it runs as an Arrow-batched pandas
UDF over level arrays, the same surface as the other TEOS-10 kernels.
"""

from __future__ import annotations

import numpy as np

from .teos10 import RHO0, rho

# Analytic reference ("Lorenz") density profile parameters: a monotone
# power-law-plus-linear increase with depth — the public functional form
# rho_ref(z) = rho_s + A·z^q + B·z with coefficients chosen to span
# realistic ocean densities (1025 at surface → ~1050 at 6000 m).
_RHO_S = 1025.0
_A = 0.18
_Q = 0.78
_B = 1.5e-3
ZREF_MAX = 6000.0


def lorenz_reference_density(zref: np.ndarray) -> np.ndarray:
    """Monotone analytic reference density ρref(z) (reference
    lorenz_state.py:63-80 functional shape)."""
    z = np.asarray(zref, dtype="f8")
    return _RHO_S + _A * np.power(np.maximum(z, 0.0), _Q) + _B * z


def pr_from_zref(zref: np.ndarray) -> np.ndarray:
    """Pressure (dbar) at reference depth z (m): hydrostatic ~1 dbar/m
    with a small quadratic compressibility correction (reference
    lorenz_state.py:86-100 precomputed-polynomial shape)."""
    z = np.asarray(zref, dtype="f8")
    return z * (1.0 + 2.3e-6 * z)


# poly-8 correction hook (identity by default; the reference applies a
# fitted degree-8 polynomial, lorenz_state.py:146-170)
_POLY = np.zeros(9, dtype="f8")
_POLY[-2] = 1.0  # identity: gammat = sigref


def gammat_analytic(sr: np.ndarray, ct: np.ndarray, n_iter: int = 30):
    """Vectorized bisection for thermodynamic neutral density.

    For each (SR, CT) sample, find zref ∈ [0, ZREF_MAX] such that
    ρref(zref) = ρ(SR, CT, pr(zref)); return (gammat, zref, pref,
    sigref) exactly like the reference's surface
    (lorenz_state.py:115-185).
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
    sigref = lorenz_reference_density(zref) - 1000.0
    gammat = np.polyval(_POLY, sigref)
    return gammat, zref, pref, sigref


def gammat_brute(sr: float, ct: float, n_grid: int = 200_001) -> float:
    """Brute-force oracle: dense zref grid argmin — the differential
    check partner (reference lorenz_state.py:5-29 pattern)."""
    z = np.linspace(0.0, ZREF_MAX, n_grid)
    resid = np.abs(lorenz_reference_density(z) - rho(sr, ct, pr_from_zref(z)))
    zref = z[int(resid.argmin())]
    return float(np.polyval(_POLY, lorenz_reference_density(zref) - 1000.0))
