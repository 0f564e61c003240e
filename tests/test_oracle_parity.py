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
