"""1-D interpolation kernels (SURVEY.md §2.8 F9/F10).

The reference interpolates each profile's (SA, CT) onto the 64 fixed
pressure levels with scipy ``interp1d(kind="cubic",
fill_value="extrapolate")`` (reference: src/argostats/interpolation.py:
13-21). scipy is not installed here, so ``cubic_interp`` is a natural
cubic spline implemented directly in NumPy (the standard tridiagonal
algorithm — public textbook material), preferring scipy when available.
``linear_interp`` wraps np.interp (the reference's isopycnal displacement
lookup, atlas.py:187).

Both run inside Arrow-batched pandas UDFs / applyInPandas — per-profile
vectorized work, never row-at-a-time Python.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover
    from scipy.interpolate import interp1d as _interp1d
except ImportError:
    _interp1d = None


def _natural_cubic_coeffs(x: np.ndarray, y: np.ndarray):
    """Second derivatives of the natural cubic spline through (x, y) via
    the Thomas tridiagonal solve."""
    n = x.shape[0]
    h = np.diff(x)
    # tridiagonal system for interior second derivatives
    m = np.zeros(n, dtype="f8")
    if n > 2:
        a = h[:-1].copy()                  # sub-diagonal
        b = 2.0 * (h[:-1] + h[1:])         # diagonal
        c = h[1:].copy()                   # super-diagonal
        d = 6.0 * ((y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1])
        # forward sweep
        for i in range(1, n - 2):
            w = a[i] / b[i - 1]
            b[i] -= w * c[i - 1]
            d[i] -= w * d[i - 1]
        # back substitution
        m[n - 2] = d[-1] / b[-1]
        for i in range(n - 4, -1, -1):
            m[i + 1] = (d[i] - c[i] * m[i + 2]) / b[i]
    return m


def cubic_interp(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Natural cubic spline evaluation with linear extrapolation outside
    the knot span. Matches scipy interp1d(kind='cubic') inside the span
    up to the boundary-condition difference (natural vs not-a-knot);
    differential-tested in tests/test_functions.py."""
    x = np.asarray(x, dtype="f8")
    y = np.asarray(y, dtype="f8")
    xq = np.asarray(xq, dtype="f8")
    if _interp1d is not None:  # pragma: no cover
        f = _interp1d(x, y, kind="cubic", fill_value="extrapolate", assume_sorted=True)
        return f(xq)

    n = x.shape[0]
    if n == 1:
        return np.full_like(xq, y[0])
    if n < 4:
        return linear_interp_extrap(x, y, xq)

    m = _natural_cubic_coeffs(x, y)
    idx = np.clip(np.searchsorted(x, xq) - 1, 0, n - 2)
    h = x[idx + 1] - x[idx]
    t = xq - x[idx]
    out = (
        y[idx]
        + t * ((y[idx + 1] - y[idx]) / h - h * (2.0 * m[idx] + m[idx + 1]) / 6.0)
        + t * t * m[idx] / 2.0
        + t * t * t * (m[idx + 1] - m[idx]) / (6.0 * h)
    )
    # linear extrapolation beyond the span (matching slope at the ends)
    lo = xq < x[0]
    hi = xq > x[-1]
    if lo.any():
        s0 = (y[1] - y[0]) / (x[1] - x[0]) - (x[1] - x[0]) * (2 * m[0] + m[1]) / 6.0
        out[lo] = y[0] + s0 * (xq[lo] - x[0])
    if hi.any():
        hn = x[-1] - x[-2]
        sn = (y[-1] - y[-2]) / hn + hn * (2 * m[-1] + m[-2]) / 6.0
        out[hi] = y[-1] + sn * (xq[hi] - x[-1])
    return out


def linear_interp_extrap(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """np.interp with linear (not constant) extrapolation at both ends."""
    out = np.interp(xq, x, y)
    if x.shape[0] >= 2:
        lo = xq < x[0]
        hi = xq > x[-1]
        if lo.any():
            s = (y[1] - y[0]) / (x[1] - x[0])
            out[lo] = y[0] + s * (xq[lo] - x[0])
        if hi.any():
            s = (y[-1] - y[-2]) / (x[-1] - x[-2])
            out[hi] = y[-1] + s * (xq[hi] - x[-1])
    return out


def monotone_lookup(rho_q: np.ndarray, rho_prof: np.ndarray, pref: np.ndarray) -> np.ndarray:
    """np.interp(rho·CF, RHO·CF, PREF) — the reference's isopycnal
    displacement lookup (atlas.py:187). Assumes rho_prof monotone
    non-decreasing (guaranteed by construction in the EAPE pass)."""
    return np.interp(rho_q, rho_prof, pref)
