"""Upsert / CDC / SCD-2 emulation tests (no Delta in the image; the
anti-join + union + window patterns stand in for MERGE INTO)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from argostats_spark.operators.upsert import latest_wins, scd2_close_out, upsert


def test_upsert_replaces_and_inserts(spark):
    base = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    updates = spark.createDataFrame(
        pd.DataFrame({"k": [2, 4], "v": ["B", "d"]})
    )
    out = upsert(base, updates, ["k"]).toPandas().sort_values("k").reset_index(drop=True)
    assert out.k.tolist() == [1, 2, 3, 4]
    assert out.v.tolist() == ["a", "B", "c", "d"]


def test_latest_wins_compaction(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2], "ver": [1, 3, 2, 1], "v": ["x", "z", "y", "w"]})
    )
    out = latest_wins(df, ["k"], "ver").toPandas().sort_values("k").reset_index(drop=True)
    assert out.v.tolist() == ["z", "w"]


def test_scd2_close_out(spark):
    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "v": ["old1", "cur1", "cur2"],
                "effective_from": [1, 5, 3],
                "effective_to": [5.0, None, None],
            }
        )
    )
    updates = spark.createDataFrame(
        pd.DataFrame({"k": [1], "v": ["new1"], "effective_from": [9], "effective_to": [None]})
    ).withColumn("effective_to", F.col("effective_to").cast("double"))
    out = scd2_close_out(base, updates, ["k"]).toPandas()
    # key 1: old row untouched, current row closed at 9, new open row
    k1 = out[out.k == 1].sort_values("effective_from")
    assert k1.effective_to.tolist()[0] == 5.0
    assert k1.effective_to.tolist()[1] == 9.0
    assert pd.isna(k1.effective_to.tolist()[2])
    # key 2 untouched and still open
    k2 = out[out.k == 2]
    assert len(k2) == 1 and pd.isna(k2.effective_to.iloc[0])


def test_scd2_multiple_updates_one_key_chain(spark):
    """Two updates for one key in a single batch must chain: base closes
    at the earliest, update #1 closes at update #2, update #2 stays open
    — and the closed base row is NOT duplicated (the round-1 defect)."""
    base = spark.createDataFrame(
        pd.DataFrame({"k": [1], "v": ["cur"], "effective_from": [1], "effective_to": [None]})
    ).withColumn("effective_to", F.col("effective_to").cast("double"))
    updates = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1, 1], "v": ["u1", "u2", "u2dup"],
             "effective_from": [5, 9, 9], "effective_to": [None, None, None]}
        )
    ).withColumn("effective_to", F.col("effective_to").cast("double"))
    out = (
        scd2_close_out(base, updates, ["k"])
        .toPandas()
        .sort_values("effective_from")
        .reset_index(drop=True)
    )
    assert len(out) == 3  # base + 2 distinct updates, no dup of base
    assert out.effective_to.tolist()[0] == 5.0  # base closed at earliest
    assert out.effective_to.tolist()[1] == 9.0  # u1 closed at u2
    assert pd.isna(out.effective_to.tolist()[2])  # u2 open
    # the (k=1, from=9) duplicate resolves DETERMINISTICALLY: max over
    # payload lexicographic order ('u2dup' > 'u2'), same on every rerun
    # and partitioning — not dropDuplicates's arbitrary survivor
    assert out.v.tolist()[2] == "u2dup"
