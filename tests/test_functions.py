"""Differential tests for the function layer — the reference's own test
style (lorenz_state.check(): rewritten kernel vs original via allclose;
SURVEY.md §5 item 2): every kernel asserted against direct NumPy on the
same arrays, plus the truth tables carried over from the reference's
test suite (FIXTURES.md §7).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from argostats_spark.functions.geo import haversine_arg, haversine_km, dist_threshold
from argostats_spark.functions.interp import cubic_interp, linear_interp_extrap
from argostats_spark.functions.qc import combine_qc, all_good
from argostats_spark.functions.teos10 import UPS, rho, sr_from_sp
from argostats_spark.functions.arrays import array_cumsum, array_diff, array_mid, dot_product


def _np_haversine_arg(lon1, lat1, lon2, lat2):
    dphi = np.radians(lat2 - lat1) / 2
    dlam = np.radians(lon2 - lon1) / 2
    return np.sin(dphi) ** 2 + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(dlam) ** 2


def test_haversine_matches_numpy(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "lon1": rng.uniform(-180, 180, 200), "lat1": rng.uniform(-80, 80, 200),
        "lon2": rng.uniform(-180, 180, 200), "lat2": rng.uniform(-80, 80, 200),
    })
    df = spark.createDataFrame(pdf)
    got = df.select(
        haversine_arg("lon1", "lat1", "lon2", "lat2").alias("h"),
        haversine_km("lon1", "lat1", "lon2", "lat2").alias("km"),
    ).toPandas()
    want_h = _np_haversine_arg(pdf.lon1, pdf.lat1, pdf.lon2, pdf.lat2)
    want_km = 2 * 6371.0 * np.arcsin(np.sqrt(want_h))
    assert np.allclose(got.h, want_h, rtol=1e-12)
    assert np.allclose(got.km, want_km, rtol=1e-12)


def test_dist_threshold_matches_reference_form():
    # sin²(deg2rad(sf·reso)/2) — atlas.py:311-313
    assert dist_threshold(0.25, 4.0) == pytest.approx(
        math.sin(math.radians(1.0) / 2) ** 2
    )


def test_combine_qc_truth_table(spark):
    # reference tests/test_toctools.py:59-60: [1,1,0,1]→0, [1,2,3,4,5]→nonzero
    df = spark.createDataFrame(
        [(1, 1, 0, 1, 1), (1, 2, 3, 4, 5)], "a int, b int, c int, d int, e int"
    )
    got = df.select(combine_qc("a", "b", "c", "d", "e").alias("f")).toPandas()["f"].tolist()
    assert got[0] == 0
    assert got[1] != 0


def test_all_good_per_level(spark):
    df = spark.createDataFrame([([1, 1, 1],), ([1, 4, 1],)], "qc array<int>")
    got = df.select(all_good("qc").alias("g")).toPandas()["g"].tolist()
    assert got == [True, False]


def test_sr_from_sp_exact_scale():
    sp = np.array([33.0, 35.0, 37.0])
    assert np.allclose(sr_from_sp(sp), sp * UPS, rtol=0, atol=0)


def test_rho_monotonicity():
    # denser when colder, saltier, deeper — EOS sanity for the EAPE path
    assert rho(35.2, 5.0, 100.0) > rho(35.2, 15.0, 100.0)
    assert rho(36.0, 10.0, 100.0) > rho(35.0, 10.0, 100.0)
    assert rho(35.2, 10.0, 500.0) > rho(35.2, 10.0, 0.0)


def test_cubic_interp_through_knots_and_smooth():
    x = np.array([0.0, 1.0, 2.5, 4.0, 6.0, 9.0])
    y = np.sin(x)
    # passes through the knots
    assert np.allclose(cubic_interp(x, y, x), y, atol=1e-12)
    # close to the true function between knots (much closer than linear)
    xq = np.linspace(0, 9, 200)
    err_cubic = np.abs(cubic_interp(x, y, xq) - np.sin(xq)).max()
    err_linear = np.abs(np.interp(xq, x, y) - np.sin(xq)).max()
    assert err_cubic < err_linear
    # linear data reproduced exactly (any spline does)
    y_lin = 3.0 * x + 1.0
    assert np.allclose(cubic_interp(x, y_lin, xq), 3.0 * xq + 1.0, atol=1e-9)


def test_cubic_interp_extrapolates_linearly():
    x = np.linspace(0, 10, 11)
    y = 2.0 * x
    xq = np.array([-2.0, 12.0])
    assert np.allclose(cubic_interp(x, y, xq), 2.0 * xq, atol=1e-9)
    assert np.allclose(linear_interp_extrap(x, y, xq), 2.0 * xq, atol=1e-12)


def test_array_ops_match_numpy(spark):
    arr = [1.0, 3.0, 6.0, 10.0]
    df = spark.createDataFrame([(arr,)], "a array<double>")
    got = df.select(
        array_mid("a").alias("mid"),
        array_diff("a").alias("diff"),
        array_cumsum("a").alias("cum"),
        dot_product("a", "a").alias("dot"),
    ).toPandas().iloc[0]
    a = np.array(arr)
    assert np.allclose(got["mid"], 0.5 * (a[1:] + a[:-1]))
    assert np.allclose(got["diff"], np.diff(a))
    assert np.allclose(got["cum"], np.cumsum(a))
    assert got["dot"] == pytest.approx(float(a @ a))


def test_date_parts_leap_year(spark):
    # FIXTURES.md §7: 2000-02-29 → (2000, 2, 29, doy 60); the reference's
    # own datetools test was broken (SURVEY §2.11) — reimplemented right.
    from argostats_spark.functions.datetools import date_parts

    from datetime import datetime

    df = spark.createDataFrame(
        [(datetime(2000, 2, 29, 13, 14, 15),)], "ts timestamp"
    )
    row = df.select(*date_parts("ts")).toPandas().iloc[0]
    assert (row.year, row.month, row.day, row.dayofyear) == (2000, 2, 29, 60)
    assert (row.hour, row.minute, row.second) == (13, 14, 15)


def test_gammat_bisection_vs_brute_force():
    """The reference's own differential-test pattern (lorenz_state.check,
    lorenz_state.py:5-29): vectorized bisection vs dense-grid brute force
    on a (SR, CT) sweep."""
    from argostats_spark.functions.lorenz import gammat_analytic, gammat_brute

    sr = np.linspace(34.0, 36.5, 40)
    ct = np.linspace(2.0, 20.0, 40)
    g_vec, zref, pref_out, sigref = gammat_analytic(sr, ct)
    g_brute = np.array([gammat_brute(s, c) for s, c in zip(sr, ct)])
    # brute grid step 0.03 m → density quantization ~1.3e-3
    assert np.allclose(g_vec, g_brute, atol=3e-3)
    # zref within bounds, pref consistent with zref
    assert (zref >= 0).all() and (zref <= 6000).all()
    # colder water sinks deeper (monotone physics through the solver)
    _, z_cold, _, _ = gammat_analytic(np.array([35.0]), np.array([2.0]))
    _, z_warm, _, _ = gammat_analytic(np.array([35.0]), np.array([25.0]))
    assert z_cold[0] > z_warm[0]


# ---------------------------------------------------------------------------
# TEOS-10 differential tests vs published check values (the reference's
# own lorenz_state.check() pattern, src/argostats/lorenz/lorenz_state.py:5-29)
# ---------------------------------------------------------------------------


def test_specvol_paper_check_value():
    """Roquet et al. 2015 check value: v(SA=30, CT=10, p=1000 dbar)."""
    from argostats_spark.functions.teos10 import specvol

    assert abs(float(specvol(30.0, 10.0, 1000.0)) - 9.732819628e-4) < 1e-12


def test_rho_gsw_standard_profile():
    """75-term rho vs the GSW standard-profile check densities."""
    from argostats_spark.functions.teos10 import rho

    sa = np.array([34.7118, 34.8915, 35.0256, 34.8472, 34.7366, 34.7324])
    ct = np.array([28.809919826700281, 28.439227816091140, 22.786176893078498,
                   10.226189266620782, 6.827213633479988, 4.323575748610455])
    p = np.array([10.0, 50.0, 125.0, 250.0, 600.0, 1000.0])
    expect = np.array([1021.840173, 1022.262689, 1024.427715,
                       1027.790201, 1029.837714, 1032.002404])
    assert np.allclose(rho(sa, ct, p), expect, rtol=0, atol=1e-3)


def test_adiabatic_lapse_rate_unesco_check():
    """Fofonoff & Millard 1983: atg(40, 40, 10000) = 3.255976e-4."""
    from argostats_spark.functions.teos10 import adiabatic_lapse_rate

    assert abs(float(adiabatic_lapse_rate(40.0, 40.0, 10000.0)) - 3.255976e-4) < 1e-10


def test_potential_temperature_unesco_check():
    """Fofonoff & Millard 1983: theta(40, 40, 10000 -> 0) = 36.89073."""
    from argostats_spark.functions.teos10 import pt_from_t

    assert abs(float(pt_from_t(40.0, 40.0, 10000.0)) - 36.89073) < 1e-4


def test_ct_from_pt_identity_at_sso():
    """McDougall 2003 design property: at SA = SSO the potential-enthalpy
    polynomial is anchored so CT == theta exactly at 0 and 25 degC, with
    |CT - theta| <= ~0.011 K in between."""
    from argostats_spark.functions.teos10 import ct_from_pt

    for pt in [0.0, 25.0]:
        assert abs(float(ct_from_pt(35.16504, pt)) - pt) < 2e-5
    for pt in [5.0, 10.0, 15.0, 20.0, 30.0]:
        assert abs(float(ct_from_pt(35.16504, pt)) - pt) < 0.02


def test_ct_from_t_gsw_standard_profile():
    """Composite t->theta->CT vs GSW CT_from_t check values (<=2.1e-4 K;
    the residual is the EOS-80 vs Gibbs theta difference)."""
    from argostats_spark.functions.teos10 import ct_from_t

    sa = np.array([34.7118, 34.8915, 35.0256, 34.8472, 34.7366, 34.7324])
    t = np.array([28.7856, 28.4329, 22.8103, 10.2600, 6.8863, 4.4036])
    p = np.array([10.0, 50.0, 125.0, 250.0, 600.0, 1000.0])
    expect = np.array([28.809919826700281, 28.439227816091140, 22.786176893078498,
                       10.226189266620782, 6.827213633479988, 4.323575748610455])
    assert np.allclose(ct_from_t(sa, t, p), expect, rtol=0, atol=3e-4)


def test_sound_speed_and_expansion_coefficients():
    """Sound speed from the analytic dv/dz (~1542 m/s warm surface,
    increasing with depth); alpha/beta signs and magnitudes."""
    from argostats_spark.functions.teos10 import alpha, beta, sound_speed

    c_surf = float(sound_speed(34.7118, 28.8099, 10.0))
    assert abs(c_surf - 1542.6) < 1.0
    assert float(sound_speed(34.73, 4.32, 1000.0)) > float(sound_speed(34.73, 4.32, 10.0))
    a = float(alpha(35.0, 15.0, 100.0))
    b = float(beta(35.0, 15.0, 100.0))
    assert 1.5e-4 < a < 2.5e-4
    assert 7.0e-4 < b < 8.0e-4


def test_gammat_poly8_correction_is_published_fit():
    """The degree-8 correction is the published Tailleux 2021 fit, not an
    identity: P8(0) = p9 = 6.431 at pref = 1440 dbar, and gammat differs
    from sigref by the correction everywhere."""
    from argostats_spark.functions.lorenz import gammat_analytic, poly8_correction

    assert abs(float(poly8_correction(1440.0)) - 6.431) < 1e-12
    g, _, pref, sig = gammat_analytic(np.array([35.0, 34.5]), np.array([10.0, 3.0]))
    assert np.all(np.abs(g - sig) > 1.0)  # non-identity correction applied
    assert np.allclose(g, sig - poly8_correction(pref))


# ---------------------------------------------------------------------------
# F9 boundary-condition divergence: natural spline (ours) vs not-a-knot
# (the reference's scipy interp1d kind="cubic", interpolation.py:13-17).
# The cubic interpolant is unique given knots + boundary conditions, so a
# direct tridiagonal not-a-knot solve below IS scipy's answer — no scipy
# needed to quantify the divergence in this container.
# ---------------------------------------------------------------------------


def _notaknot_interp(x, y, xq):
    """Reference stand-in: cubic spline with not-a-knot BCs (third
    derivative continuous across the first/last interior knot)."""
    n = len(x)
    h = np.diff(x)
    a = np.zeros((n, n))
    d = np.zeros(n)
    for i in range(1, n - 1):
        a[i, i - 1] = h[i - 1]
        a[i, i] = 2 * (h[i - 1] + h[i])
        a[i, i + 1] = h[i]
        d[i] = 6 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    a[0, 0], a[0, 1], a[0, 2] = h[1], -(h[0] + h[1]), h[0]
    a[n - 1, n - 3] = h[n - 2]
    a[n - 1, n - 2] = -(h[n - 3] + h[n - 2])
    a[n - 1, n - 1] = h[n - 3]
    m = np.linalg.solve(a, d)
    idx = np.clip(np.searchsorted(x, xq) - 1, 0, n - 2)
    hh = x[idx + 1] - x[idx]
    t = xq - x[idx]
    return (
        y[idx] + t * ((y[idx + 1] - y[idx]) / hh - hh * (2 * m[idx] + m[idx + 1]) / 6)
        + t * t * m[idx] / 2 + t ** 3 * (m[idx + 1] - m[idx]) / (6 * hh)
    )


def test_cubic_natural_vs_notaknot_divergence_bounded():
    """Quantifies the F9 divergence (COVERAGE.md F9 row): on SMOOTH
    Argo-like profiles (>=2 dbar spacing) the two boundary conditions
    agree to <=0.05 units overall and <=0.01 in the interior (measured
    0.029 / 0.0027 over 50 trials); on NOISY dense profiles the
    not-a-knot cubic can overshoot the data envelope by tens of units
    at the edge while the natural spline stays bounded — the natural
    BC is a deliberate robustness choice, not an approximation error."""
    from argostats_spark.functions.interp import cubic_interp

    rng = np.random.default_rng(0)
    for _ in range(25):
        nl = int(rng.integers(20, 120))
        x = np.sort(rng.choice(np.arange(0.0, 2000.0, 2.0), size=nl, replace=False))
        y = 25 - 20 * (x / 2000.0) + 3 * np.exp(-x / 300.0)  # thermocline-ish
        xq = np.linspace(x[0], x[-1], 300)
        dev = np.abs(cubic_interp(x, y, xq) - _notaknot_interp(x, y, xq))
        assert dev.max() < 0.05
        interior = (xq > x[2]) & (xq < x[-3])
        assert dev[interior].max() < 0.01

    # noisy-data robustness: natural never overshoots the sample
    # envelope by more than not-a-knot does (usually far less)
    worst_nak, worst_nat = 0.0, 0.0
    for _ in range(25):
        nl = int(rng.integers(20, 120))
        x = np.sort(rng.choice(np.arange(0.0, 2000.0, 2.0), size=nl, replace=False))
        y = 25 - 20 * (x / 2000.0) + rng.normal(0, 0.3, nl)
        xq = np.linspace(x[0], x[-1], 300)
        lo, hi = y.min(), y.max()
        nat = cubic_interp(x, y, xq)
        nak = _notaknot_interp(x, y, xq)
        worst_nat = max(worst_nat, float(np.maximum(nat - hi, lo - nat).max()))
        worst_nak = max(worst_nak, float(np.maximum(nak - hi, lo - nak).max()))
    assert worst_nat <= worst_nak


def test_cubic_matches_scipy_where_installed():
    """Differential vs the reference's ACTUAL implementation — runs
    wherever scipy exists (skipped in this container)."""
    scipy_interp = pytest.importorskip("scipy.interpolate")
    from argostats_spark.functions.interp import cubic_interp

    x = np.arange(0.0, 200.0, 4.0)
    y = 25 - 20 * (x / 200.0) + 3 * np.exp(-x / 30.0)
    xq = np.linspace(5.0, 190.0, 200)
    ref = scipy_interp.interp1d(x, y, kind="cubic")(xq)
    ours = cubic_interp(x, y, xq)
    interior = (xq > x[2]) & (xq < x[-3])
    assert np.abs(ours - ref).max() < 0.05
    assert np.abs(ours - ref)[interior].max() < 0.01
    # and the stand-in used by the divergence test IS scipy's spline
    assert np.allclose(_notaknot_interp(x, y, xq), ref, atol=1e-8)


# -------------------------------------------------------------------------
# Gopher-style repetition stats (functions/text.py, round 6): the sorted-
# run aggregate vs a direct Python Counter on the same strings.
# -------------------------------------------------------------------------

def test_repetition_stats_match_counter(spark):
    from collections import Counter

    from argostats_spark.functions.text import (
        dup_ngram_frac, is_repetitive, top_token_frac, with_repetition_stats,
    )

    rng = np.random.default_rng(7)
    vocab = ["aa", "bb", "cc", "dd", "spam", "x"]
    docs = [
        "",                         # empty → all fracs 0.0, not NaN
        "one",                      # single token, no 2-grams
        "a a a a",                  # pure repetition: top=1.0, dup2=2/3
        "a b a b a b",              # alternating: top=0.5, all 2-grams repeat after first pair
        "Tab\tand  double  space",  # whitespace variety
        "MiXeD CaSe mixed case",    # lowering folds tokens
    ] + [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 40, size=25)
    ]

    def py_stats(text: str):
        toks = [t.lower() for t in text.split()]
        n = len(toks)
        top = (max(Counter(toks).values()) / n) if n else 0.0

        def dup(k):
            grams = [" ".join(toks[i:i + k]) for i in range(n - k + 1)] if n >= k else []
            return (1 - len(set(grams)) / len(grams)) if grams else 0.0

        return top, dup(2), dup(3)

    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i long, text string")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            top_token_frac("text").alias("top"),
            dup_ngram_frac("text", 2).alias("d2"),
            dup_ngram_frac("text", 3).alias("d3"),
            is_repetitive("text").alias("rep"),
        ).collect()
    }
    # the staged (hot-path) form must agree exactly with the inline form
    staged = {
        r["i"]: r
        for r in with_repetition_stats(df).select(
            "i", "top_raw", "d2_raw", "d3_raw"
        ).collect()
    }
    for i, text in enumerate(docs):
        top, d2, d3 = py_stats(text)
        r = got[i]
        assert math.isclose(r["top"], top, abs_tol=1e-12), (i, text, r["top"], top)
        assert math.isclose(r["d2"], d2, abs_tol=1e-12), (i, text, r["d2"], d2)
        assert math.isclose(r["d3"], d3, abs_tol=1e-12), (i, text, r["d3"], d3)
        assert r["rep"] == (top > 0.20 or d2 > 0.20 or d3 > 0.18), (i, text)
        s = staged[i]
        assert (s["top_raw"], s["d2_raw"], s["d3_raw"]) == (r["top"], r["d2"], r["d3"]), (i, text)


def test_pii_scrub_and_counts_match_re(spark):
    """PII patterns evaluated by Spark's Java regex must agree with the
    same patterns under Python re on planted + adversarial strings."""
    import re

    from argostats_spark.functions.text import PII_PATTERNS, pii_counts, scrub_pii

    docs = [
        "contact john.doe+spam@example.co.uk or admin@sub.domain.org today",
        "server at 192.168.0.1 and 255.255.255.255 but not 999.1.1.1 or 1.2.3.4.5",
        "call +4915123456789 or (555) 123-4567 or 555-123-4567 x89",
        "no pii here, just pi 3.14159 and a year 2026",
        "mixed: a@b.io at 10.0.0.7 ring 333.444.5555",
        "",
        "v1.2.3.4 release notes",           # version string, not an IP (no \b break fails? digits flanked by letters)
        "+123456 too short, +1234567 just long enough",
        "call 555-123-4567. Then +4915123456789. done",  # sentence-final '.' must redact
        "not a phone: 1.555-123-4567 nor 555-123-4567.1",  # dotted-digit continuations
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i long, text string")
    got = {
        r["i"]: r
        for r in df.select("i", pii_counts("text").alias("c"), scrub_pii("text").alias("s")).collect()
    }
    for i, text in enumerate(docs):
        email, ipv4, phone = (PII_PATTERNS[k] for k in ("email", "ipv4", "phone"))
        exp_counts = (
            len(re.findall(email, text)),
            len(re.findall(ipv4, text)),
            len(re.findall(phone, text)),
        )
        s = re.sub(email, "<EMAIL>", text)
        s = re.sub(ipv4, "<IP>", s)
        s = re.sub(phone, "<PHONE>", s)
        r = got[i]
        assert (r["c"]["emails"], r["c"]["ipv4s"], r["c"]["phones"]) == exp_counts, (i, text, r["c"])
        assert r["s"] == s, (i, text, r["s"], s)


def test_url_extract_and_normalize(spark):
    from argostats_spark.functions.text import extract_urls, normalize_url, url_host

    cases = [
        # (raw, expected_host, expected_normalized)
        # userinfo keeps its case (RFC 3986: credentials are case-
        # sensitive); only scheme and host[:port] fold
        ("HTTPS://User:Pw@Example.COM:8080/Path/?utm_source=x&q=1#frag",
         "example.com",
         "https://User:Pw@example.com:8080/Path/?q=1"),
        ("http://example.org/", "example.org", "http://example.org"),
        ("http://EXAMPLE.org/a/B/c?utm_medium=email", "example.org",
         "http://example.org/a/B/c"),
        ("https://a.b.c.d/e?x=1&utm_campaign=z&y=2#s", "a.b.c.d",
         "https://a.b.c.d/e?x=1&y=2"),
        ("not a url", "", "not a url"),
        # pass-through must be byte-for-byte even when the input
        # CONTAINS fragment/utm-looking substrings (round-6 review: the
        # cleanup passes used to run outside the scheme branch)
        ("example.com/page#section", "", "example.com/page#section"),
        ("notes?utm_source=x&k=v", "", "notes?utm_source=x&k=v"),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], "i long, u string")
    got = {r["i"]: r for r in df.select("i", url_host("u").alias("h"), normalize_url("u").alias("n")).collect()}
    for i, (raw, host, norm) in enumerate(cases):
        assert got[i]["h"] == host, (raw, got[i]["h"], host)
        assert got[i]["n"] == norm, (raw, got[i]["n"], norm)

    text = "see http://a.io/x and https://b.io/y?z=1 plus ftp://skip.me and HTTPS://C.io/z"
    urls = spark.createDataFrame([(text,)], "t string").select(
        extract_urls("t").alias("u")
    ).first()["u"]
    # uppercase schemes extract too — the sibling url_host/normalize_url
    # accept them, so extraction must not silently drop them
    assert urls == ["http://a.io/x", "https://b.io/y?z=1", "HTTPS://C.io/z"]


def test_char_entropy(spark):
    """Shannon char entropy: closed-form values, gibberish-vs-prose
    ordering, and a Counter-mirror differential on real-shaped text."""
    import collections
    import math

    from argostats_spark.functions.text import char_entropy

    rows = [
        (0, "aaaa"),            # one symbol -> 0 bits
        (1, "ab"),              # uniform binary -> 1 bit
        (2, "abcd"),            # uniform 4-ary -> 2 bits
        (3, ""),                # empty -> 0 by contract
        # ordinary prose (NOT a pangram — a pangram's near-uniform
        # alphabet usage would beat the blob), letter-frequency skew
        (4, "this sentence states that the test tests the tests"),
        (5, "QmFzZTY0IGJsb2JzIGxvb2sgbGlrZSB0aGlzIQ=="),  # base64 blob
        (6, "aaaaaaaaaaaaaaaaaaaaaab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["h"] for r in
           df.select("doc_id", char_entropy("text").alias("h")).collect()}
    assert got[0] == 0.0 and got[3] == 0.0
    assert got[1] == 1.0 and got[2] == 2.0
    # base64 blob carries more per-char entropy than prose; spam less
    assert got[5] > got[4] > got[6]
    for i, text in rows:
        if not text:
            continue
        c = collections.Counter(text)
        n = len(text)
        expect = round(-sum(v / n * math.log2(v / n) for v in c.values()), 6)
        assert abs(got[i] - expect) <= 1e-6, (i, got[i], expect)


def test_variant_json_path_miss_behavior(spark):
    """The json_extract query's variant column (F15 modernized): the
    variant path and the regex path must MISS identically — malformed
    JSON, absent key, and non-numeric k all contribute NULL to both
    sums, so the two engine paths stay hash-equal on dirty data."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ('{"k": 7}',),        # clean
            ('{"k": "x"}',),      # non-numeric -> NULL (typed get)
            ('{"j": 1}',),        # absent key -> NULL
            ("not json",),        # malformed -> NULL (try_parse_json)
            (None,),              # NULL props -> NULL
        ],
        "props string",
    )
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).try_cast("long")
    # plain variant_get raises INVALID_VARIANT_CAST on {"k": "x"} —
    # try_variant_get is the dirty-data contract
    vk = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    r = df.agg(
        F.sum(k).alias("rk"), F.sum(vk).alias("vk"),
        F.count(k).alias("nrk"), F.count(vk).alias("nvk"),
    ).collect()[0]
    assert r["rk"] == r["vk"] == 7
    assert r["nrk"] == r["nvk"] == 1
