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

Header contract (ADVICE r9): the per-FILE header cannot be addressed
positionally on a distributed text scan, so header handling is
match-based — every line whose NORMALIZED form (quotes stripped,
whitespace around separators collapsed, case-folded) equals a known
header form is dropped from the good frame. ``header=True`` derives
that form from the schema's field names; ``expected_header`` supplies
the real files' header spelling(s) when they differ from the schema
(different names, different order — previously those parsed as data
rows, silently for all-string schemas). ``quarantine_headers=True``
makes the residual observable: matched header lines land in the
quarantine frame tagged ``reason='header'`` instead of vanishing, so
"one header per part file" is a countable invariant and a DATA row
that collides with the header spelling is recoverable, not lost.

Scale shape: one scan, no shuffle; good/bad are two lazy filters over
one parse. Compression and globs ride on the stock text reader.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _pad_ws_class(sep: str) -> str:
    """Whitespace-around-separator class that EXCLUDES the separator
    itself. A bare ``\\s`` matches a tab separator, so for TSV a run
    of tabs (a header with an empty field) would collapse to ONE
    separator — such a header form could never match and adjacent
    fields could falsely collide (review finding, round 10). The
    double-negative class ``[^\\S<sep>]`` = "whitespace that is not
    the separator" parses identically in Python and Java regex."""
    return rf"[^\S{re.escape(sep)}]*"


def _norm_py(s: str, sep: str) -> str:
    """Driver-side mirror of the normalization the scan applies to
    every line: quotes out, padding whitespace around separators
    collapsed (never the separator itself — see :func:`_pad_ws_class`),
    case folded. Applied to caller-supplied expected headers so both
    sides of the comparison are in normal form."""
    s = s.strip().replace('"', "")
    ws = _pad_ws_class(sep)
    s = re.sub(rf"{ws}{re.escape(sep)}{ws}", sep, s)
    return s.lower()


def _header_forms(
    schema: StructType,
    sep: str,
    header: bool,
    expected_header: str | list[str] | None,
) -> list[str]:
    forms: list[str] = []
    if header:
        forms.append(sep.join(f.name.lower() for f in schema.fields))
    if expected_header is not None:
        variants = (
            [expected_header]
            if isinstance(expected_header, str)
            else list(expected_header)
        )
        forms.extend(_norm_py(v, sep) for v in variants)
    return forms


def _parse(
    reader,
    path: str,
    schema: StructType,
    sep: str,
    header: bool,
    expected_header: str | list[str] | None = None,
):
    """One text scan → (parsed, is_bad, is_header). ``parsed`` carries
    the raw line and the permissive from_csv struct; the two predicate
    columns drive the good/quarantine split without a second read."""
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
    forms = _header_forms(schema, sep, header, expected_header)
    if forms:
        # NORMALIZED comparison — quotes stripped, whitespace around
        # separators collapsed, case-folded — so the real-world header
        # variants ('a, b', '"a","b"', 'A,B') are all caught instead of
        # silently parsing as a clean all-strings data row (review
        # finding, round 9). Residual contract: a DATA row whose
        # normalized form equals a header's matches too — pass
        # quarantine_headers=True upstream to make those observable.
        sep_re = re.escape(sep)
        ws = _pad_ws_class(sep)
        norm = F.lower(
            F.regexp_replace(
                F.regexp_replace(F.trim(F.col("value")), '"', ""),
                rf"{ws}{sep_re}{ws}", sep,
            )
        )
        is_header = norm.isin(forms)
    else:
        is_header = F.lit(False)
    # from_csv takes a DDL schema string, not a StructType (probed on
    # 4.1.2); CSV schemas are flat so simpleString() is lossless here
    parsed = lines.select(
        F.col("value"),
        is_header.alias("__is_header"),
        F.from_csv("value", full.simpleString(), opts).alias("c"),
    )
    is_bad = F.col("c").isNull() | F.col(f"c.{_CORRUPT}").isNotNull()
    return parsed, is_bad, F.col("__is_header")


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = False,
    quarantine: bool = True,
    expected_header: str | list[str] | None = None,
    quarantine_headers: bool = False,
) -> tuple[DataFrame, DataFrame | None]:
    """Read a CSV/TSV table with an enforced schema.

    Returns ``(good, bad)``: ``good`` has exactly the caller's schema;
    ``bad`` carries ``raw_line`` plus a ``reason`` column — ``'parse'``
    for lines that failed the typed parse, ``'header'`` for dropped
    header-form lines when ``quarantine_headers=True`` (or ``None``
    when ``quarantine=False``). ``header=True`` drops lines matching
    the schema-derived header; ``expected_header`` adds the files' own
    header spelling(s) when they differ from the schema's field names
    (see module header contract).
    """
    parsed, is_bad, is_header = _parse(
        spark.read, path, schema, sep, header, expected_header
    )
    good = parsed.filter(~is_bad & ~is_header).select(
        *[F.col(f"c.{f.name}").alias(f.name) for f in schema.fields]
    )
    if not quarantine:
        return good, None
    keep_bad = (is_bad & ~is_header) | (
        is_header & F.lit(bool(quarantine_headers))
    )
    bad = parsed.filter(keep_bad).select(
        F.col("value").alias("raw_line"),
        F.when(is_header, F.lit("header"))
        .otherwise(F.lit("parse"))
        .alias("reason"),
    )
    return good, bad


def read_csv_corpus_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = False,
    expected_header: str | list[str] | None = None,
) -> DataFrame:
    """Continuous CSV ingestion: ONE stream carrying the caller's
    columns plus ``is_corrupt`` and ``raw_line`` — the
    :func:`read_jsonl_stream` contract (the good/bad split belongs at
    the sink; a streaming source can't be consumed twice). Header-form
    lines (schema-derived and ``expected_header`` alike) are dropped
    pre-parse — a stream has no natural place for the batch reader's
    ``quarantine_headers`` observability, so count headers at the
    batch backfill if the invariant matters."""
    parsed, is_bad, is_header = _parse(
        spark.readStream, path, schema, sep, header, expected_header
    )
    return parsed.filter(~is_header).select(
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
