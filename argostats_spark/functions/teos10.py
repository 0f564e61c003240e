"""TEOS-10-style thermodynamic kernels (SURVEY.md §2.8 F4-F6).

The reference calls the GSW library (gsw.SR_from_SP, gsw.CT_from_t,
gsw.density.rho — reference: src/argostats/interpolation.py:200-210,
atlas.py:184-224). GSW is not installed in this environment, so this
module provides:

- ``sr_from_sp``: exact — the TEOS-10 definition is a single public
  constant (SR = SP · 35.16504/35, Millero et al. 2008).
- ``ct_from_t`` / ``rho``: documented simplified approximations with the
  same signatures, units and vectorized NumPy shape as GSW, so the Spark
  plumbing (Arrow-batched pandas UDFs) is real and tested; when the real
  ``gsw`` package is importable it is used instead.

Everything is NumPy-vectorized and exposed to Spark as pandas UDFs over
level arrays — the Arrow batch path the reference's C-accelerated ufuncs
map onto (SURVEY.md §2.10 'vectorized scalar').
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised only where gsw exists
    import gsw as _gsw
except ImportError:
    _gsw = None

# TEOS-10 reference-salinity scale factor (exact, public constant).
UPS = 35.16504 / 35.0

# Simplified EOS coefficients (documented approximation — linearized
# around S=35 g/kg, T=10 °C, p=0 dbar; thermal expansion / haline
# contraction / compressibility values from standard oceanography texts).
RHO0 = 1027.0        # kg/m3
ALPHA = 1.7e-4       # 1/K thermal expansion
BETA = 7.6e-4        # kg/g haline contraction
KAPPA = 4.4e-6       # 1/dbar compressibility


def sr_from_sp(sp: np.ndarray) -> np.ndarray:
    """Reference salinity from practical salinity (exact TEOS-10 scale)."""
    if _gsw is not None:
        return _gsw.SR_from_SP(sp)
    return np.asarray(sp, dtype="f8") * UPS


def pt0_from_t(sa: np.ndarray, t: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Potential temperature referenced to 0 dbar — first-order adiabatic
    correction (documented approximation; Γ ≈ 8.7e-5 K/dbar lapse-rate
    scale near standard ocean conditions)."""
    t = np.asarray(t, dtype="f8")
    p = np.asarray(p, dtype="f8")
    gamma = 8.7e-5 * (1.0 + 0.16 * (np.asarray(t) - 10.0) / 10.0)
    return t - gamma * p


def ct_from_t(sa: np.ndarray, t: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Conservative temperature from in-situ temperature.

    With gsw: exact. Without: CT ≈ pt0 with a small salinity-dependent
    offset (CT−θ is <0.1 K over the Argo range; the offset term keeps the
    derivative structure so downstream density gradients behave)."""
    if _gsw is not None:
        return _gsw.CT_from_t(sa, t, p)
    pt = pt0_from_t(sa, t, p)
    sa = np.asarray(sa, dtype="f8")
    return pt * (1.0 - 0.001 * (sa - 35.0) / 35.0)


def rho(sr: np.ndarray, ct: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Seawater density (kg/m³).

    With gsw: the 75-term TEOS-10 polynomial. Without: linearized EOS
    ρ = ρ0·(1 − α(CT−10) + β(SR−35·UPS) + κ·p) — monotone in the same
    directions with realistic magnitudes, sufficient for the EAPE
    *dataflow* (two-pass join + displacement interpolation) to be real."""
    if _gsw is not None:
        return _gsw.density.rho(sr, ct, p)
    sr = np.asarray(sr, dtype="f8")
    ct = np.asarray(ct, dtype="f8")
    p = np.asarray(p, dtype="f8")
    return RHO0 * (1.0 - ALPHA * (ct - 10.0) + BETA * (sr - 35.0 * UPS) + KAPPA * p)


def sound_speed(sr: np.ndarray, ct: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Sound speed (m/s) — simplified Mackenzie-style form when gsw is
    absent; feeds the compressibility factor CF (reference atlas.py:
    320-324)."""
    if _gsw is not None:
        return _gsw.sound_speed(sr, ct, p)
    ct = np.asarray(ct, dtype="f8")
    p = np.asarray(p, dtype="f8")
    sr = np.asarray(sr, dtype="f8")
    return 1448.96 + 4.591 * ct - 0.05304 * ct**2 + 1.34 * (sr - 35.0) + 0.016 * p


def compute_cf(rho_bar: np.ndarray, c: np.ndarray, pres: np.ndarray) -> np.ndarray:
    """Compressibility factor exp(−cumsum(1e4·ΔP/(ρ̄·c²))) along a profile
    (reference atlas.py:320-324). Operates on a single cell-mean profile."""
    rho_bar = np.asarray(rho_bar, dtype="f8")
    c = np.asarray(c, dtype="f8")
    pres = np.asarray(pres, dtype="f8")
    dp = np.diff(pres, prepend=pres[0])
    integrand = 1e4 * dp / (rho_bar * c * c)
    return np.exp(-np.cumsum(integrand))


def eape_unit() -> float:
    """EAPE unit constant (reference atlas.py:145-149): 1e4/1e6·1e4."""
    return 1e4 / 1e6 * 1e4
