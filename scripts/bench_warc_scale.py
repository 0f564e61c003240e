#!/usr/bin/env python
"""WARC ingest scale probe: measure read_warc -> warc_to_documents
throughput (records/s and input MB/s) over synthetic member-gzip
archives at local[32].

Axes swept independently, mirroring the other scale probes:
- file count at fixed records/file (parallelism axis — the file is the
  partition unit, so throughput should scale with files up to core
  count);
- records/file at fixed file count (per-task stream length axis — the
  record-streaming parser should be flat per record regardless of
  archive length, since peak state is one record).

Usage: python scripts/bench_warc_scale.py [out_dir]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGE = (
    "<html><head><title>t{i}</title></head><body><h1>Doc {i}</h1>"
    "<p>{body}</p></body></html>"
)
BODY_WORDS = ("the quick brown fox jumps over the lazy dog and keeps "
              "running through synthetic crawl pages ").split()


def make_archive(file_no: int, n_records: int) -> bytes:
    import hashlib

    recs = []
    for i in range(n_records):
        # semi-random filler so gzip ratios are crawl-realistic (~3-4x),
        # not the 50x a repeated phrase would give
        seed = hashlib.md5(f"{file_no}:{i}".encode()).hexdigest()
        body = " ".join(
            BODY_WORDS[(i + j) % len(BODY_WORDS)]
            + hashlib.md5((seed + str(j)).encode()).hexdigest()[:6]
            for j in range(120)
        )
        html = PAGE.format(i=i, body=body).encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                b"charset=utf-8\r\n\r\n" + html)
        hdr = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://host" + str(file_no % 97).encode()
            + b".example.com/p" + str(i).encode() + b"\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        recs.append(hdr + http + b"\r\n\r\n")
    # member-gzip in blocks of 64 records (Common Crawl shape)
    out = []
    for s in range(0, len(recs), 64):
        out.append(gzip.compress(b"".join(recs[s:s + 64]), mtime=0))
    return b"".join(out)


def main() -> None:
    import shutil
    import tempfile

    from argostats_spark.session import get_spark
    from argostats_spark.sources.warc import read_warc, warc_to_documents

    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="warc_scale_"
    )
    spark = get_spark(app_name="bench_warc_scale")

    def measure(n_files: int, recs_per_file: int) -> dict:
        d = os.path.join(out_dir, f"f{n_files}_r{recs_per_file}")
        os.makedirs(d, exist_ok=True)
        total_bytes = 0
        for f in range(n_files):
            p = os.path.join(d, f"part-{f:04d}.warc.gz")
            if not os.path.exists(p):
                data = make_archive(f, recs_per_file)
                with open(p, "wb") as fh:
                    fh.write(data)
            total_bytes += os.path.getsize(p)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = warc_to_documents(
                read_warc(spark, os.path.join(d, "*.warc.gz"))
            ).count()
            best = min(best, time.perf_counter() - t0)
        rec = {
            "n_files": n_files,
            "recs_per_file": recs_per_file,
            "rows_out": n,
            "gz_mb": round(total_bytes / 1e6, 2),
            "sec": round(best, 3),
            "records_per_sec": round(n_files * recs_per_file / best, 1),
            "gz_mb_per_sec": round(total_bytes / 1e6 / best, 2),
        }
        print(json.dumps(rec))
        return rec

    # parallelism axis
    for nf in (1, 8, 32, 64):
        measure(nf, 500)
    # per-file stream length axis
    for rpf in (250, 1000, 4000):
        measure(8, rpf)
    # volume checkpoint: ~100 MB of realistic-ratio gzip input
    measure(32, 8000)

    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
