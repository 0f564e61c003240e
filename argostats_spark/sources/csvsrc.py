"""CSV/TSV corpus ingestion with the jsonl.py ingest contract —
explicit schema, corrupt-row quarantine, streaming variant.

Green-field scope (training-data pipeline family): metadata tables,
label files, and URL lists still arrive as CSV/TSV beside the JSONL
document dumps. The failure modes are the same at 100 TB — schema
inference costs a full extra pass and drifts with the data; malformed
rows must be QUARANTINED with their raw text, not silently nulled or
fatal. This module mirrors :mod:`.jsonl` exactly, swapping the parser:
``from_csv`` over a text scan (the same UniVocity parser behind
``spark.read.csv``, as a column expression), which sidesteps the same
corrupt-column-only query restriction the JSONL module documents.

Caveat, stated rather than hidden: line-level text splitting means
MULTILINE quoted fields (embedded newlines) are not supported here —
each physical line is one record, the dominant machine-written CSV
shape. A corpus with multiline quoting needs ``spark.read.csv`` with
``multiLine=true`` (which gives up per-line quarantine and splittable
parallel reads anyway — multiline CSV files parse whole-file).

Scale shape: one scan, no shuffle; good/bad are two lazy filters over
one parse. Compression and globs ride on the stock text reader.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _parse(
    reader,
    path: str,
    schema: StructType,
    sep: str,
    header: bool,
):
    if _CORRUPT in schema.fieldNames():
        raise ValueError(
            f"schema must not define the reserved column {_CORRUPT!r}"
        )
    full = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": _CORRUPT,
        "sep": sep,
    }
    lines = reader.text(path).filter(F.trim("value") != F.lit(""))
    if header:
        # drop every line that IS the header (the per-FILE header
        # cannot be addressed positionally on a distributed text scan).
        # Comparison is NORMALIZED — quotes stripped, whitespace around
        # separators collapsed, case-folded — so the real-world header
        # variants ('a, b', '"a","b"', 'A,B') are all caught instead of
        # silently parsing as a clean all-strings data row (review
        # finding, round 9). Residual contract: a DATA row whose
        # normalized form equals the header's is dropped too — name
        # your columns unlike your data.
        hdr = sep.lower().join(f.name.lower() for f in schema.fields)
        sep_re = re.escape(sep)
        norm = F.lower(
            F.regexp_replace(
                F.regexp_replace(F.trim(F.col("value")), '"', ""),
                rf"\s*{sep_re}\s*", sep,
            )
        )
        lines = lines.filter(norm != F.lit(hdr))
    # from_csv takes a DDL schema string, not a StructType (probed on
    # 4.1.2); CSV schemas are flat so simpleString() is lossless here
    parsed = lines.select(
        F.col("value"),
        F.from_csv("value", full.simpleString(), opts).alias("c"),
    )
    is_bad = F.col("c").isNull() | F.col(f"c.{_CORRUPT}").isNotNull()
    return parsed, is_bad


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = False,
    quarantine: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """Read a CSV/TSV table with an enforced schema.

    Returns ``(good, bad)``: ``good`` has exactly the caller's schema;
    ``bad`` is one ``raw_line`` column of every line that failed to
    parse (or ``None`` when ``quarantine=False``). ``header=True``
    drops lines equal to the schema's header line (see module caveat).
    """
    parsed, is_bad = _parse(spark.read, path, schema, sep, header)
    good = parsed.filter(~is_bad).select(
        *[F.col(f"c.{f.name}").alias(f.name) for f in schema.fields]
    )
    if not quarantine:
        return good, None
    bad = parsed.filter(is_bad).select(F.col("value").alias("raw_line"))
    return good, bad


def read_csv_corpus_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """Continuous CSV ingestion: ONE stream carrying the caller's
    columns plus ``is_corrupt`` and ``raw_line`` — the
    :func:`read_jsonl_stream` contract (the good/bad split belongs at
    the sink; a streaming source can't be consumed twice)."""
    parsed, is_bad = _parse(spark.readStream, path, schema, sep, header)
    return parsed.select(
        *[
            F.when(~is_bad, F.col(f"c.{f.name}")).alias(f.name)
            for f in schema.fields
        ],
        is_bad.alias("is_corrupt"),
        F.col("value").alias("raw_line"),
    )


def write_csv_corpus(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    compression: str | None = "gzip",
) -> None:
    """Write a frame as CSV, headered and compressed by default."""
    w = df.write.mode("overwrite").option("sep", sep).option(
        "header", str(header).lower()
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
