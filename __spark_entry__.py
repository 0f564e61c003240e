"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (gridded kernel-weighted climatology,
  the reference's atlas core re-expressed as a binned neighborhood join +
  weighted aggregation) on /root/testdata/sf0.001.
- ``queries()`` — one entry per implemented operator cluster from
  SURVEY.md §2 (see argostats_spark/queries.py for the inventory and the
  operator-ID mapping in each docstring).
- ``oracle_sql()`` — the DuckDB twins, hash-compared by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable no matter where the driver loads this file from
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from argostats_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: kernel-weighted gridded climatology (SURVEY §2.3 J2 +
    §2.4 A1-A3) at sf0.001."""
    return QUERIES["clim_kernel_grid"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # the argo_atlas_pipeline oracle reads a materialized parquet
    # intermediate, and the ann_suite / clustering_suite oracles read
    # materialized model parquets (PQ codebooks, k-means centroids);
    # make sure all of them exist even if the driver evaluates the SQL
    # before running the Spark queries. Both guards regenerate
    # deterministically (the trainings are partition-independent), so
    # any ordering yields byte-identical models.
    from argostats_spark.queries import ensure_atlas_oracle_parquet
    from argostats_spark.queries_documents import ensure_model_parquets

    ensure_atlas_oracle_parquet()
    ensure_model_parquets()
    return dict(ORACLES)
