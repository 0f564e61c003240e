"""WARC ingest (sources/warc.py): synthetic spec-correct archives
(response + request + warcinfo records, exact Content-Lengths,
member-gzip variant), HTML→text extraction pins, quarantine on a
broken archive, and the end-to-end Spark scan."""

from __future__ import annotations

import gzip

import pytest

from argostats_spark.sources.warc import (
    html_to_text,
    parse_warc_bytes,
    read_warc,
)

HTML_A = (
    b"<html><head><script>var x = '<p>not text</p>';</script>"
    b"<style>body { color: red }</style></head>"
    b"<body><h1>Title &amp; More</h1><!-- hidden -->"
    b"<p>First para.</p><p>Second &lt;para&gt;.</p></body></html>"
)
HTML_B = b"<html><body><div>Alpha</div><div>Beta</div></body></html>"


def _record(warc_type: bytes, extra: bytes, body: bytes) -> bytes:
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n" + extra +
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
    )
    return hdr + b"\r\n" + body + b"\r\n\r\n"


def _http_response(html: bytes, ctype: bytes = b"text/html; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Server: test\r\n"
        b"\r\n" + html
    )


def _archive() -> bytes:
    recs = [
        _record(b"warcinfo", b"", b"software: synthetic\r\n"),
        _record(
            b"request",
            b"WARC-Target-URI: http://example.com/a\r\n",
            b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        ),
        _record(
            b"response",
            b"WARC-Target-URI: http://example.com/a\r\n"
            b"WARC-Date: 2026-08-14T00:00:00Z\r\n",
            _http_response(HTML_A),
        ),
        _record(
            b"response",
            b"WARC-Target-URI: http://example.com/b\r\n",
            _http_response(HTML_B),
        ),
        _record(
            b"response",
            b"WARC-Target-URI: http://example.com/img\r\n",
            _http_response(b"\x89PNGbytes", ctype=b"image/png"),
        ),
    ]
    return b"".join(recs)


def test_parse_records_and_http_metadata():
    recs = list(parse_warc_bytes(_archive()))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response",
    ]
    a = recs[2]
    assert a["url"] == "http://example.com/a"
    assert a["http_status"] == 200
    assert a["content_type"].startswith("text/html")
    assert a["warc_date"] == "2026-08-14T00:00:00Z"
    assert a["payload"] == HTML_A
    img = recs[4]
    assert img["content_type"] == "image/png" and img["payload"] == b"\x89PNGbytes"


def test_member_gzip_variant_parses_identically():
    # Common Crawl layout: each record its own gzip member, concatenated
    plain = list(parse_warc_bytes(_archive()))
    recs_bytes = _archive()
    # two members: split after the second record
    cut = recs_bytes.index(b"WARC/1.0", 10)
    cut = recs_bytes.index(b"WARC/1.0", cut + 10)
    gz = gzip.compress(recs_bytes[:cut]) + gzip.compress(recs_bytes[cut:])
    gzed = list(parse_warc_bytes(gz))
    assert [(r["warc_type"], r["url"]) for r in gzed] == [
        (r["warc_type"], r["url"]) for r in plain
    ]


def test_html_to_text_pins():
    t = html_to_text(HTML_A.decode())
    assert "Title & More" in t
    assert "First para." in t and "Second <para>." in t
    assert "not text" not in t          # script dropped
    assert "color" not in t             # style dropped
    assert "hidden" not in t            # comment dropped
    # block tags became line breaks: title and paras on separate lines
    lines = t.split("\n")
    assert any("Title" in ln for ln in lines)
    assert html_to_text(HTML_B.decode()) == "Alpha\nBeta"


def test_spark_scan_and_quarantine(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "good.warc").write_bytes(_archive())
    (d / "good2.warc.gz").write_bytes(gzip.compress(_archive()))
    (d / "broken.warc").write_bytes(b"WARC/1.0\r\nno-length: x\r\n\r\nbody")

    out = read_warc(spark, str(d / "*")).toPandas()
    errs = out[out.error.notna()]
    assert len(errs) == 1 and "broken.warc" in errs.iloc[0]["warc_file"]
    good = out[out.error.isna()]
    # 3 responses per good archive x 2 archives
    assert len(good) == 6
    assert set(good.http_status) == {200}
    by_url = good[good.url == "http://example.com/b"]
    assert set(by_url.text) == {"Alpha\nBeta"}
    img = good[good.url == "http://example.com/img"]
    assert img.text.isna().all() and set(img.n_payload_bytes) == {9}
    # responses_only=False surfaces all record types
    allrecs = read_warc(spark, str(d / "good.warc"), responses_only=False)
    assert allrecs.count() == 5


def test_http2_status_charset_and_truncation():
    """Round-7 second review pass: HTTP/2 status lines (no dotted
    minor) must parse; declared legacy charsets must decode (no
    mojibake); a record truncated mid-body must raise (quarantine),
    not silently yield short text."""
    from argostats_spark.sources.warc import html_to_text

    sjis_html = "<html><body><p>日本語のページ</p></body></html>".encode("shift_jis")
    recs_bytes = b"".join([
        _record(
            b"response",
            b"WARC-Target-URI: http://example.com/h2\r\n",
            b"HTTP/2 200\r\nContent-Type: text/html\r\n\r\n" + HTML_B,
        ),
        _record(
            b"response",
            b"WARC-Target-URI: http://example.jp/sjis\r\n",
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=Shift_JIS\r\n\r\n" + sjis_html,
        ),
    ])
    recs = list(parse_warc_bytes(recs_bytes))
    assert recs[0]["http_status"] == 200  # HTTP/2 line parsed

    # truncated record: Content-Length beyond EOF -> ValueError
    truncated = recs_bytes[:-20]
    with pytest.raises(ValueError, match="truncated record"):
        list(parse_warc_bytes(truncated))

    # charset honored end-to-end through the decode+extract pass
    import pandas as pd  # noqa: F401 — mirrors the scan's decode logic
    import re as _re

    ctype = recs[1]["content_type"].lower()
    m = _re.search(r"charset=([\w\-]+)", ctype)
    assert m and m.group(1).lower() == "shift_jis"
    text = html_to_text(recs[1]["payload"].decode(m.group(1), "replace"))
    assert "日本語のページ" in text


class _BoundedReader:
    """File-like wrapper that FORBIDS whole-buffer reads: any read()
    without a size, or larger than the cap, fails the test. Proves the
    parser's peak memory is one record, not the inflated archive."""

    def __init__(self, raw, cap: int):
        self.raw, self.cap = raw, cap

    def read(self, n=-1):
        assert n is not None and 0 <= n <= self.cap, (
            f"whole-buffer read forbidden (asked for {n}, cap {self.cap})"
        )
        return self.raw.read(n)

    def readline(self):
        return self.raw.readline()


def test_streaming_parse_bounded_memory():
    """Multi-member gzip archive parsed through a reader that forbids
    whole-buffer access: the parser may only ever ask for one record's
    bytes at a time, and must produce the same rows as the plain
    parse."""
    import io

    from argostats_spark.sources.warc import parse_warc_stream

    recs_bytes = _archive()
    cut = recs_bytes.index(b"WARC/1.0", 10)
    cut = recs_bytes.index(b"WARC/1.0", cut + 10)
    gz = gzip.compress(recs_bytes[:cut]) + gzip.compress(recs_bytes[cut:])
    # cap = largest single record body + slack, far below the archive
    cap = max(len(HTML_A), len(HTML_B)) + 256
    assert cap < len(recs_bytes)
    stream = _BoundedReader(gzip.GzipFile(fileobj=io.BytesIO(gz)), cap)
    got = list(parse_warc_stream(stream))
    want = list(parse_warc_bytes(recs_bytes))
    assert [(r["warc_type"], r["url"], r["payload"]) for r in got] == [
        (r["warc_type"], r["url"], r["payload"]) for r in want
    ]


def test_quarantine_drops_partial_file(spark, tmp_path):
    """A file that breaks MID-archive (after parseable records) must
    contribute exactly ONE error row and NONE of its already-parsed
    rows — a file is all-or-nothing (true quarantine)."""
    good_rec = _record(
        b"response",
        b"WARC-Target-URI: http://example.com/ok\r\n",
        _http_response(HTML_B),
    )
    # two good records then a record whose body is cut short
    partial = good_rec + good_rec + _record(
        b"response",
        b"WARC-Target-URI: http://example.com/cut\r\n",
        _http_response(HTML_A),
    )[:-30]
    d = tmp_path / "w"
    d.mkdir()
    (d / "partial.warc").write_bytes(partial)
    (d / "whole.warc").write_bytes(good_rec)
    out = read_warc(spark, str(d / "*")).toPandas()
    bad = out[out.warc_file.str.endswith("partial.warc")]
    assert len(bad) == 1 and bad.iloc[0]["record_no"] == -1
    assert "truncated" in bad.iloc[0]["error"]
    ok = out[out.warc_file.str.endswith("whole.warc")]
    assert len(ok) == 1 and ok.iloc[0]["error"] is None


def test_quoted_charset(spark, tmp_path):
    """RFC 9110 allows charset="shift_jis" (quoted); the scan must
    honor it instead of mojibake-decoding as utf-8."""
    sjis_html = "<html><body><p>日本語</p></body></html>".encode("shift_jis")
    arc = _record(
        b"response",
        b"WARC-Target-URI: http://example.jp/q\r\n",
        b"HTTP/1.1 200 OK\r\n"
        b'Content-Type: text/html; charset="Shift_JIS"\r\n\r\n' + sjis_html,
    )
    d = tmp_path / "w"
    d.mkdir()
    (d / "a.warc").write_bytes(arc)
    [row] = read_warc(spark, str(d / "a.warc")).collect()
    assert "日本語" in row["text"]


def test_spark_scan_http2_and_charset(spark, tmp_path):
    sjis_html = "<html><body><p>日本語</p></body></html>".encode("shift_jis")
    arc = b"".join([
        _record(
            b"response",
            b"WARC-Target-URI: http://example.com/h2\r\n",
            b"HTTP/2 200\r\nContent-Type: text/html\r\n\r\n" + HTML_B,
        ),
        _record(
            b"response",
            b"WARC-Target-URI: http://example.jp/sjis\r\n",
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=Shift_JIS\r\n\r\n" + sjis_html,
        ),
    ])
    d = tmp_path / "w"
    d.mkdir()
    (d / "a.warc").write_bytes(arc)
    from argostats_spark.sources.warc import read_warc

    out = {r["url"]: r for r in read_warc(spark, str(d / "a.warc")).collect()}
    assert out["http://example.com/h2"]["http_status"] == 200
    assert out["http://example.com/h2"]["text"] == "Alpha\nBeta"
    assert "日本語" in out["http://example.jp/sjis"]["text"]


def test_warc_roundtrip_property():
    """Property (hypothesis): ANY list of records — bodies containing
    \\r\\n\\r\\n, fake 'WARC/1.0' headers, null bytes, empty bodies —
    serialized to an archive and split into arbitrary gzip members
    parses back to exactly the same records, because framing is
    Content-Length-driven, never delimiter-driven."""
    from hypothesis import given, settings, strategies as st

    body_st = st.binary(min_size=0, max_size=200).map(
        # splice adversarial substrings into some bodies
        lambda b: b[: len(b) // 2] + b"\r\n\r\nWARC/1.0\r\n" + b[len(b) // 2:]
    ) | st.binary(min_size=0, max_size=300)
    rec_st = st.tuples(
        st.sampled_from([b"response", b"request", b"metadata", b"warcinfo"]),
        st.integers(min_value=0, max_value=10_000),  # fake uri suffix
        body_st,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(rec_st, min_size=1, max_size=8), st.data())
    def run(recs, data):
        blob = b"".join(
            _record(t, b"WARC-Target-URI: http://h/" + str(u).encode() + b"\r\n", b)
            for t, u, b in recs
        )
        # random member split points for the gzip variant
        n_cuts = data.draw(st.integers(min_value=0, max_value=2))
        offsets = sorted(
            data.draw(st.integers(min_value=0, max_value=len(blob)))
            for _ in range(n_cuts)
        )
        parts, prev = [], 0
        for off in offsets + [len(blob)]:
            parts.append(blob[prev:off])
            prev = off
        gz = b"".join(gzip.compress(p, mtime=0) for p in parts if p) or gzip.compress(b"")

        for variant in (blob, gz):
            got = list(parse_warc_bytes(variant))
            assert len(got) == len(recs)
            for (t, u, b), r in zip(recs, got):
                assert r["warc_type"] == t.decode()
                assert r["url"] == f"http://h/{u}"
                # response records with HTTP-looking bodies get their
                # payload re-framed past the HTTP headers; everything
                # else round-trips the body verbatim
                if not (t == b"response" and b[:5] == b"HTTP/"):
                    assert r["payload"] == b

    run()
