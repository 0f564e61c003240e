"""JSONL (newline-delimited JSON) corpus ingestion — the interchange
format real training-data pipelines exchange documents in (one JSON
object per line; e.g. the public formats of The Pile, C4, Dolma dumps).

Green-field scope beyond the reference (training-data pipeline family).
Spark does the heavy lifting (distributed text scan + the same Jackson
parser behind `spark.read.json`, as a `from_json` column); this module
adds the two things a 100 TB ingest actually needs on top:

- **Explicit schema, never inference.** Schema inference runs a FULL
  extra pass over the corpus, and a schema drifting with the data
  silently changes every downstream plan. Here the schema is a
  required argument.
- **Corrupt-record quarantine, not silent drops.** Unparseable lines
  come back as a quarantine frame carrying the RAW LINE so the ingest
  can count/inspect/replay them; the clean frame has exactly the
  caller's schema. A malformed 0.001% of a 100 TB crawl is a fact to
  record, not an exception to die on or a row of NULLs to mistake for
  data.

Why text + from_json rather than `spark.read.json` with
`_corrupt_record`: Spark disallows querying ONLY the corrupt column
from a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
COLUMN — the documented workaround is caching the whole parse, a
non-starter at ingest scale). Parsing each line with `from_json`
keeps the raw line as an ordinary column, sidesteps the restriction,
and is the same parser on the same one-pass scan. Blank lines are
skipped per the JSONL convention (they are separators, not records).

Scale shape: one scan, no shuffle — the good/bad split is two lazy
filters over the same parse; a caller materializing both branches
should persist the parsed frame to avoid a second file read. Text
compression (gzip/zstd) and multi-file globs ride on the stock reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """Read a JSONL corpus with an enforced schema.

    Returns ``(good, bad)``: ``good`` has exactly the caller's schema
    (corrupt lines removed); ``bad`` is one ``raw_line`` string column
    holding every line that failed to parse AS WRITTEN, or ``None``
    when ``quarantine=False`` (corrupt lines are then silently
    dropped — for ingests that already counted them upstream).

    A caller's schema must not claim the reserved ``_corrupt_record``
    column; the parser uses it internally."""
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema must not define the reserved column {_CORRUPT!r}")
    full = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    parsed = (
        spark.read.text(path)
        .filter(F.trim("value") != F.lit(""))  # JSONL: blank lines skip
        .select(
            F.col("value"),
            F.from_json(
                "value", full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
            ).alias("j"),
        )
    )
    is_bad = F.col("j").isNull() | F.col(f"j.{_CORRUPT}").isNotNull()
    good = parsed.filter(~is_bad).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    if not quarantine:
        return good, None
    bad = parsed.filter(is_bad).select(F.col("value").alias("raw_line"))
    return good, bad


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> DataFrame:
    """Continuous JSONL ingestion (Structured Streaming file source):
    the same enforced-schema parse as :func:`read_jsonl`, returned as
    ONE stream with the caller's columns plus an ``is_corrupt`` flag
    and the ``raw_line``.

    One stream, not a (good, bad) pair: a streaming source cannot be
    consumed twice without reading every file twice, so the split
    belongs at the SINK — route ``is_corrupt`` inside one foreachBatch
    (or two filters feeding two sinks off a persisted batch). Good
    rows carry their parsed columns; corrupt rows carry NULLs there
    and the raw line for replay — the batch reader's quarantine
    contract, streamified. Blank lines skip as in batch."""
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema must not define the reserved column {_CORRUPT!r}")
    full = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    parsed = (
        spark.readStream.text(path)
        .filter(F.trim("value") != F.lit(""))
        .select(
            F.col("value"),
            F.from_json(
                "value", full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
            ).alias("j"),
        )
    )
    is_bad = F.col("j").isNull() | F.col(f"j.{_CORRUPT}").isNotNull()
    return parsed.select(
        *[
            F.when(~is_bad, F.col(f"j.{f.name}")).alias(f.name)
            for f in schema.fields
        ],
        is_bad.alias("is_corrupt"),
        F.col("value").alias("raw_line"),
    )


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write a frame as JSONL (one object per line per the interchange
    convention), compressed by default — the shape downstream trainers
    and the public corpus dumps consume."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
