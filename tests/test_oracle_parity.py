"""Local mirror of the driver's correctness gate: run every queries()
entry in Spark AND its oracle_sql() twin in DuckDB on the same parquet
tables, then compare row count, column names, and order-insensitive
values.

This is the test that must stay green before anything ships — the
driver runs the same comparison at sf0.01 (here sf0.001 for speed;
set ARGOSTATS_PARITY_SF=/root/testdata/sf0.01 to match the driver).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from argostats_spark.queries import ORACLES, QUERIES
from argostats_spark.sources.tables import TESTDATA_TABLES

PARITY_SF = os.environ.get("ARGOSTATS_PARITY_SF", "/root/testdata/sf0.001")


def _duck(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, tuple)):
            df[c] = df[c].apply(lambda v: tuple(v) if v is not None else None)
        # normalize datetimes to ns for cross-engine compare
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, PARITY_SF).toPandas()
    odf = _duck(PARITY_SF, ORACLES[name])

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"

    s, o = _canon(sdf), _canon(odf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, ov))
            if not _values_equal(a, b)
        ][:5]
        assert not bad, f"{name}.{col}: first mismatches {bad}"


def test_all_queries_have_entries():
    assert QUERIES, "query inventory is empty"
    # every oracle refers to a real query
    assert set(ORACLES) <= set(QUERIES)


def test_registry_sized_to_driver_window():
    """The correctness driver records the first 50 queries() entries
    (COVERAGE.md 'Registry sizing'). The registry must stay EXACTLY 50 —
    adding a 51st entry silently drops it out of the driver's window,
    and shrinking wastes a row — and EVERY entry must carry an oracle
    (the last holdout, argo_atlas_pipeline, gained a DuckDB twin in
    round 5 via the materialized-parquet intermediate + generated
    TEOS-10 polynomial SQL)."""
    assert len(QUERIES) == 50, f"registry drifted to {len(QUERIES)} entries"
    missing = set(QUERIES) - set(ORACLES)
    assert missing == set(), (
        f"rows-only queries appeared: {sorted(missing)} — new entries need "
        "a DuckDB twin or a documented justification in COVERAGE.md"
    )


def test_np_interp_sql_matches_numpy_property():
    """Hypothesis property test for queries._np_interp_sql — the
    trickiest fragment of the atlas-pipeline oracle. Adversarial
    non-decreasing curves (duplicate knots from maximum.accumulate flats
    included) and probe points sampled inside, outside, and EXACTLY ON
    knots must reproduce np.interp bit-for-bit-ish (1e-9), including the
    duplicate-knot tie rule (np.interp returns the LAST duplicate's y)
    and both end clamps."""
    import duckdb
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from argostats_spark.queries import _np_interp_sql

    @settings(max_examples=60, deadline=None)
    @given(
        incs=st.lists(
            st.sampled_from([0.0, 0.25, 1.0, 3.5]), min_size=2, max_size=12
        ).filter(lambda v: sum(v) > 0),
        probes=st.lists(
            st.floats(min_value=-3.0, max_value=40.0,
                      allow_nan=False, allow_infinity=False),
            min_size=1, max_size=8,
        ),
        knot_probe_idx=st.integers(min_value=0, max_value=100),
    )
    def check(incs, probes, knot_probe_idx):
        xp = np.concatenate([[1.0], 1.0 + np.cumsum(incs)])  # non-decreasing
        yp = np.arange(len(xp), dtype="f8") * 7.5            # strictly increasing
        # probe set: random points + one exact knot + both exact ends
        xs = list(probes) + [float(xp[knot_probe_idx % len(xp)]),
                             float(xp[0]), float(xp[-1])]
        expected = np.interp(xs, xp, yp)

        con = duckdb.connect()
        # CAST every float literal to DOUBLE: DuckDB types bare reprs
        # like 0.3333333333333333 as DECIMAL(17,16) and the segment
        # arithmetic then overflows decimal widening — and DECIMAL
        # evaluation differs from the DOUBLE semantics np.interp defines
        # (and the real oracle runs, over DOUBLE parquet columns).
        knots = ", ".join(
            f"(0.0, 0.0, {k}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE))"
            for k, (x, y) in enumerate(zip(xp, yp))
        )
        probes_rows = ", ".join(
            f"({i}, 0.0, 0.0, CAST({v!r} AS DOUBLE))" for i, v in enumerate(xs)
        )
        got = con.execute(f"""
            WITH cellcurve(glon, glat, lev, curve, p) AS (VALUES {knots}),
            seg AS (
              SELECT glon, glat, curve AS ck, p AS yk,
                     lead(curve) OVER (PARTITION BY glon, glat ORDER BY lev) AS ck1,
                     lead(p) OVER (PARTITION BY glon, glat ORDER BY lev) AS yk1
              FROM cellcurve
            ),
            cbound AS (
              SELECT glon, glat,
                     arg_min(curve, lev) AS c_first, arg_min(p, lev) AS p_first,
                     arg_max(curve, lev) AS c_last, arg_max(p, lev) AS p_last
              FROM cellcurve GROUP BY glon, glat
            ),
            pi(i, glon, glat, x) AS (VALUES {probes_rows})
            SELECT {_np_interp_sql("pi.x")} AS disp
            FROM pi JOIN cbound b ON b.glon = pi.glon AND b.glat = pi.glat
            ORDER BY pi.i
        """).df()["disp"].to_numpy()
        np.testing.assert_allclose(got, expected, rtol=0, atol=1e-9)

    check()


def test_specvol_poly_sql_matches_numpy_property():
    """Hypothesis property test for queries._specvol_poly_sql — the
    GENERATED 75-term TEOS-10 polynomial (and its analytic z-derivative)
    must match the NumPy evaluation (functions/teos10.py::_poly3, einsum
    contraction) across the Argo range to ~1e-12 relative; the oracle's
    ρ, sound speed and EAPE all flow through these two expressions."""
    import duckdb
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from argostats_spark.functions.teos10 import (
        _OFFSET,
        _SFAC,
        _V,
        _V_DZ,
        _norm,
        _poly3,
    )
    from argostats_spark.queries import _specvol_poly_sql

    v_sql, dvdz_sql = _specvol_poly_sql("xs", "ys", "zz")

    @settings(max_examples=40, deadline=None)
    @given(
        sa=st.floats(min_value=0.0, max_value=42.0, allow_nan=False),
        ct=st.floats(min_value=-3.0, max_value=40.0, allow_nan=False),
        p=st.floats(min_value=0.0, max_value=10_000.0, allow_nan=False),
    )
    def check(sa, ct, p):
        xs, ys, z = _norm(sa, ct, p)
        want_v = float(_poly3(_V, xs, ys, z))
        want_dvdz = float(_poly3(_V_DZ, xs, ys, z))
        got_v, got_dvdz = duckdb.connect().execute(f"""
            WITH n(xs, ys, zz) AS (VALUES (
              sqrt(greatest({_SFAC!r}*{sa!r} + {_OFFSET!r}, 0.0)),
              {ct!r}*0.025, {p!r}*1e-4))
            SELECT {v_sql}, {dvdz_sql} FROM n
        """).fetchone()
        np.testing.assert_allclose(got_v, want_v, rtol=1e-11)
        np.testing.assert_allclose(got_dvdz, want_dvdz, rtol=1e-9, atol=1e-18)

    check()


def test_model_parquets_order_independent(spark):
    """The ann_suite/clustering_suite oracles read model parquets the
    Spark builders write. If the driver evaluates oracle SQL FIRST,
    ensure_model_parquets regenerates them — and because both trainings
    are partition-independent (content-ordered PQ sample; content-hash
    k-means init + exact DECIMAL Lloyd sums), the bytes it writes must
    be IDENTICAL to what the query builders then overwrite them with,
    making the ordering immaterial."""
    import pyarrow.parquet as pq

    from argostats_spark.queries_documents import (
        _model_parquet_path,
        ensure_model_parquets,
    )

    ensure_model_parquets(PARITY_SF)
    before = {
        n: pq.read_table(_model_parquet_path(n))
        for n in ("pq_codebooks", "kmeans_centroids", "bpe_words", "bpe_merges")
    }
    # the builders' own writers, called exactly as the query bodies
    # call them (ann_suite -> _train_and_write_pq, clustering_suite ->
    # _train_and_write_kmeans, bpe_subwords -> _train_and_write_bpe):
    # the guard is "builder-written bytes == ensure_model_parquets
    # bytes"; constructing the full query frames on top re-ran their
    # other eager prefixes and plan analysis for nothing (round 15,
    # driver-pytest budget)
    from argostats_spark.queries_documents import (
        _train_and_write_bpe,
        _train_and_write_kmeans,
        _train_and_write_pq,
    )

    _train_and_write_pq(spark, PARITY_SF)
    _train_and_write_kmeans(spark, PARITY_SF)
    _train_and_write_bpe(spark, PARITY_SF)
    for n, t in before.items():
        assert pq.read_table(_model_parquet_path(n)).equals(t), n
