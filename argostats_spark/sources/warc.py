"""WARC ingest — the Common Crawl entry point of a training-data
pipeline: parse WARC/1.0 archives (ISO 28500) into one row per
*response* record with the fetched URL, HTTP metadata, and the
extracted plain text, dependency-free (stdlib ``gzip``/``html`` only —
the same no-optional-deps posture as the NetCDF-3 codec).

Spark shape: archives are listed by a ``binaryFile`` scan, records are
parsed inside ``mapInPandas`` (0..N rows per file — the UDTF shape the
NetCDF ingest uses, sources/netcdf.py), and the HTML→text step is a
pure function applied in the same pass so page bytes never travel
twice. At crawl scale each WARC is ~1 GiB and self-contained, so the
file is the natural partition unit — parallelism = file count, no
shuffle anywhere in ingest.

Coverage policy (documented, tested): uncompressed ``.warc`` and
MEMBER-concatenated ``.warc.gz`` (each record its own gzip member —
the Common Crawl layout; stdlib gzip reads concatenated members as
one stream) both parse. Malformed records quarantine into an error
row per file rather than killing the scan (the JSONL contract).
"""

from __future__ import annotations

import gzip
import io
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "parse_warc_stream",
    "parse_warc_bytes",
    "html_to_text",
    "read_warc",
    "WARC_SCHEMA",
]

WARC_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType(), False),
    T.StructField("record_no", T.LongType(), False),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("n_payload_bytes", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
])


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def parse_warc_stream(stream) -> Iterator[dict]:
    """Iterate WARC records INCREMENTALLY from a binary stream
    (anything with ``readline()`` and ``read(n)`` — a GzipFile
    decompresses member-by-member as this consumes it). Peak memory is
    ONE record's header+payload, never the inflated archive: a 1 GiB
    Common Crawl .warc.gz inflating to several GiB of text costs one
    record at a time here (review finding r8 — the old whole-buffer
    inflate was the first OOM at real crawl scale). Yields one dict per
    record: warc headers + http status/content-type + payload bytes for
    response records. Raises ValueError on a structurally broken
    archive (caller quarantines)."""
    pos = 0
    while True:
        line = stream.readline()
        pos += len(line)
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue  # inter-record blank lines
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC/ header at offset {pos - len(line)}"
            )
        hdr_lines = [line]
        while True:
            ln = stream.readline()
            pos += len(ln)
            if not ln:
                raise ValueError(
                    "truncated record header: EOF before blank line"
                )
            if ln in (b"\r\n", b"\n"):
                break
            hdr_lines.append(ln)
        headers = _split_headers(b"".join(hdr_lines))
        length = int(headers.get("content-length", "-1"))
        if length < 0:
            raise ValueError("record missing Content-Length")
        body = stream.read(length)
        pos += len(body)
        if len(body) < length:
            raise ValueError(
                f"truncated record: Content-Length {length} exceeds "
                f"remaining {len(body)} bytes"
            )
        rec = {
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": None,
            "content_type": headers.get("content-type"),
            "payload": body,
        }
        if rec["warc_type"] == "response" and body[:5] == b"HTTP/":
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = body[:body.find(b"\r\n")].decode("latin-1", "replace")
                # HTTP/2 and HTTP/3 status lines have no dotted minor
                m = re.match(r"HTTP/\d(?:\.\d)?\s+(\d{3})", status_line)
                http_headers = _split_headers(body[:http_end])
                rec["http_status"] = int(m.group(1)) if m else None
                rec["content_type"] = http_headers.get(
                    "content-type", rec["content_type"]
                )
                rec["payload"] = body[http_end + 4:]
        yield rec


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Iterate WARC records from raw archive bytes. Gzip archives
    (whole-stream or member-concatenated — stdlib GzipFile reads
    concatenated members transparently) decompress INCREMENTALLY
    through :func:`parse_warc_stream`, so peak memory is the compressed
    buffer plus one record, not the inflated archive."""
    if data[:2] == b"\x1f\x8b":
        stream: io.BufferedIOBase = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        stream = io.BytesIO(data)
    yield from parse_warc_stream(stream)


_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|section|article|header"
    r"|footer|blockquote|pre)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n\s*\n+")


def html_to_text(html: str) -> str:
    """Dependency-free HTML→text: drop script/style/comments, turn
    block-level tags into newlines, strip remaining tags, unescape
    entities, collapse whitespace. A deterministic baseline extractor
    (trafilatura-class boilerplate removal is model-assisted and out
    of scope); good enough to feed the text operators, and pinned by
    test so its behavior can't drift silently."""
    import html as _html

    s = _SCRIPT_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s)
    s = _NL_RE.sub("\n", s)
    return "\n".join(line.strip() for line in s.split("\n")).strip()


def read_warc(
    spark: SparkSession,
    path: str,
    responses_only: bool = True,
    extract_text: bool = True,
) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` listing → per-file parse in
    ``mapInPandas`` (0..N rows per archive). One row per record (or per
    *response* record with ``responses_only``), text extracted in the
    same pass for ``text/html`` payloads; non-HTML responses carry NULL
    text but keep their metadata row. A structurally broken archive
    yields ONE error row carrying the exception AND drops any rows
    already parsed from that file (true quarantine: a file is either
    fully ingested or a single error row — partial files can't leak in
    silently; review finding r8) — the scan never dies on one bad
    file."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                frows: list[tuple] = []
                try:
                    for i, rec in enumerate(parse_warc_bytes(bytes(content))):
                        if responses_only and rec["warc_type"] != "response":
                            continue
                        ctype = (rec["content_type"] or "").lower()
                        text = None
                        if extract_text and "html" in ctype:
                            # honor the declared charset (a large share
                            # of real crawl pages are Shift_JIS / GBK /
                            # latin-1); quoted values are legal per RFC
                            # 9110 (charset="shift_jis"); unknown or
                            # absent -> utf-8
                            cs = "utf-8"
                            mcs = re.search(r'charset="?([\w\-]+)', ctype)
                            if mcs:
                                try:
                                    import codecs

                                    codecs.lookup(mcs.group(1))
                                    cs = mcs.group(1)
                                except LookupError:
                                    pass
                            text = html_to_text(
                                rec["payload"].decode(cs, "replace")
                            )
                        frows.append((
                            fname, i, rec["warc_type"], rec["url"],
                            rec["warc_date"], rec["http_status"],
                            rec["content_type"],
                            len(rec["payload"]), text, None,
                        ))
                except Exception as exc:  # quarantine, never kill the scan
                    frows = [(
                        fname, -1, None, None, None, None, None, None, None,
                        f"{type(exc).__name__}: {exc}"[:500],
                    )]
                rows.extend(frows)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(run, WARC_SCHEMA)


def warc_to_documents(
    warc_rows: DataFrame,
    min_text_chars: int = 1,
) -> DataFrame:
    """Bridge a :func:`read_warc` frame into the engine's ``documents``
    shape (doc_id, url, source, lang, text, n_chars, n_tokens) so every
    downstream curation operator — dedup, LM/DSIR/classifier scoring,
    blocklist, chunk/pack, split — composes directly with a crawl:

    - ``doc_id``: content-addressed 62-bit id from
      pmod(xxhash64(url, text), 2^62)
      (stable across re-crawls of identical content; re-runs and
      retries can't mint new ids — the split/dedup operators depend on
      content-addressing);
    - ``source``: the URL host (functions.text.url_host), the stratum
      column the samplers/packers use;
    - ``lang``: the engine's stopword-vote langid heuristic
      (functions.text.lang_guess; 'und' when no marker hits — honest,
      not 'en'-by-default).

    Keeps only successfully-extracted HTML text rows (status 200,
    non-NULL text of at least ``min_text_chars``). Row-local — no
    shuffle beyond what read_warc already did (none)."""
    from ..functions.text import lang_guess, tokens, url_host

    good = warc_rows.where(
        F.col("error").isNull()
        & (F.col("http_status") == 200)
        & F.col("text").isNotNull()
        & (F.length("text") >= min_text_chars)
    )
    tk = tokens(F.lower(F.col("text")))
    return good.select(
        F.pmod(F.xxhash64("url", "text"), F.lit(1 << 62)).alias("doc_id"),
        "url",
        url_host(F.col("url")).alias("source"),
        lang_guess(F.col("text")).alias("lang"),
        "text",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tk).cast("long").alias("n_tokens"),
    )
