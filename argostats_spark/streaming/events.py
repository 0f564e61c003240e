"""Structured Streaming surface (SURVEY.md §2.9 — green-field scope;
the reference is pure batch and reprocesses whole files on rebuild,
toctools.py:86-90).

Streams here are incremental versions of the batch operators:

- windowed event aggregation with watermarked late-data handling,
- incremental climatology refresh: the kernel-weighted mean is
  algebraic (Σwx and Σw commute with union), so an update-mode
  stateful aggregation keeps per-cell partial sums exactly.

Tests drive these with a file source + memory sink and
``processAllAvailable()`` (synchronous, no timing races).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])


def read_event_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int | None = 4
) -> DataFrame:
    """File-based streaming source (swap for kafka in production — the
    downstream plan is identical)."""
    reader = spark.readStream.schema(schema or EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums with late-data watermark — the
    streaming twin of queries.py::events_hourly_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def incremental_cell_means(
    points: DataFrame,
    bin_deg: float = 1.0,
    watermark: str = "1 day",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    value_col: str = "value",
) -> DataFrame:
    """Incremental kernel-cell statistics: per spatial bin, running
    Σw·x / Σw / n — the algebraic partials of the atlas weighted mean.
    In update output mode each micro-batch refreshes only touched cells;
    a full atlas recompute (the reference's only option) never happens."""
    binned = points.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.floor((F.col(lon_col) + 180.0) / bin_deg).cast("int").alias("lon_bin"),
        F.floor((F.col(lat_col) + 90.0) / bin_deg).cast("int").alias("lat_bin"),
        F.col(value_col).alias("x"),
    )
    return binned.groupBy("lon_bin", "lat_bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_x"),
        (F.sum("x") / F.count(F.lit(1))).alias("mean_x"),
    )


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    session tracking with explicit state (session count, last event
    time, current-session length) — the operator class the reference
    has no analog for (SURVEY §2.9: streaming is green-field scope).

    Emits one row per user per micro-batch with the running session
    stats; state times out with the watermark.

    Ordering contract: events must arrive in event-time order *across*
    micro-batches (within a batch they are sorted here). That's the
    standard contract for gap-based streaming sessionization — a
    time-shuffled replay needs the watermark-buffered variant (state
    holds the open session until watermark passes), which trades memory
    for disorder-tolerance."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_epoch", T.DoubleType(), False),
    ])

    def update(key, pdfs, state):
        (user_id,) = key
        n_sessions, n_events, last_epoch = (
            state.get if state.exists else (0, 0, float("-inf"))
        )
        ts_all = []
        for pdf in pdfs:
            ts_all.append(pdf["ts"])
        ts = pd.concat(ts_all).sort_values()
        for t in ts:
            e = t.timestamp()
            if e - last_epoch > gap_seconds:
                n_sessions += 1
            last_epoch = e
            n_events += 1
        state.update((n_sessions, n_events, last_epoch))
        # µs-integral timestamp: Arrow rejects unsafe ns→µs truncation
        last_ts = pd.Timestamp(int(last_epoch * 1_000_000), unit="us", tz="UTC")
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "last_ts": [last_ts],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def sessionize_buffered(
    events: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Disorder-tolerant sessionization: the watermark-buffered variant
    of ``sessionize_stateful``.

    Events are buffered in per-user state until the watermark passes
    them; only then are they folded (in event-time order) into the
    session stats. Replaying time-shuffled micro-batches therefore
    yields exactly the batch answer, as long as disorder stays within
    the watermark delay (Spark drops older-than-watermark rows before
    any stateful operator — that is the watermark contract, not this
    operator's).

    Mechanics: state = (finalized stats, pending event-time buffer).
    Each invocation appends new events to the buffer, folds every
    buffered event <= current watermark, and re-arms an event-time
    timeout at the earliest still-pending event so the buffer drains on
    watermark advance even with no new data for the user (Structured
    Streaming's no-data micro-batches fire the timeout). Memory cost is
    O(events inside the watermark window) per user — the price of
    disorder tolerance the in-order variant's docstring advertises."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_pending", T.LongType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_epoch", T.DoubleType(), False),
        T.StructField("pending", T.ArrayType(T.DoubleType()), False),
    ])

    def update(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            n_sessions, n_events, last_epoch, pending = state.get
            pending = list(pending or [])
        else:
            n_sessions, n_events, last_epoch, pending = 0, 0, float("-inf"), []
        for pdf in pdfs:
            if len(pdf):
                pending.extend(float(t.timestamp()) for t in pdf["ts"])
        wm_ms = state.getCurrentWatermarkMs()
        wm_s = wm_ms / 1000.0
        pending.sort()
        ready = [e for e in pending if e <= wm_s]
        pending = [e for e in pending if e > wm_s]
        for e in ready:
            if e - last_epoch > gap_seconds:
                n_sessions += 1
            last_epoch = e
            n_events += 1
        state.update((n_sessions, n_events, last_epoch, pending))
        if pending:
            # wake when the watermark passes the earliest buffered event
            state.setTimeoutTimestamp(max(int(pending[0] * 1000), wm_ms + 1))
        last_ts = (
            pd.Timestamp(int(last_epoch * 1_000_000), unit="us", tz="UTC")
            if n_events
            else None
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "n_pending": [len(pending)],
                "last_ts": [last_ts],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "update"):
    """Drive a streaming query synchronously into an in-memory table;
    returns the query handle (caller stops it)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    within_watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup for document ingestion: emit a row only the
    first time its content hash is seen (the streaming twin of
    operators/dedup.py::dedup_keep_first).

    Two state regimes:
    - ``within_watermark=None``: global first-wins dedup. State is one
      16-byte hash per distinct document, forever — correct for a
      bounded backfill, unbounded for an endless stream.
    - ``within_watermark="24 hours"``: dropDuplicatesWithinWatermark —
      state bounded by the watermark horizon; a duplicate arriving
      after the horizon is re-emitted. The right tradeoff for rolling
      ingestion where upstream re-sends cluster within a day.
    """
    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    if within_watermark is not None:
        return hashed.withWatermark(ts_col, within_watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
