"""Date-part extraction (SURVEY.md §2.8 F1).

The reference hand-rolls year/month/day/dayofyear/hour/minute/second by
datetime64 integer casting (reference: src/argostats/tools/datetools.py:
7-62, including a broken self-test, SURVEY.md §2.11). Spark's built-in
date functions replace all 45 lines; this module just bundles them so the
engine's API surface matches the reference's ``YMDhms``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def date_parts(ts, prefix: str = "") -> list[Column]:
    """year..second columns for a timestamp — the reference's ``YMDhms``
    (datetools.py:55-62) as seven aliased built-in expressions."""
    t = _c(ts)
    return [
        F.year(t).alias(f"{prefix}year"),
        F.month(t).alias(f"{prefix}month"),
        F.dayofmonth(t).alias(f"{prefix}day"),
        F.dayofyear(t).alias(f"{prefix}dayofyear"),
        F.hour(t).alias(f"{prefix}hour"),
        F.minute(t).alias(f"{prefix}minute"),
        F.second(t).alias(f"{prefix}second"),
    ]
