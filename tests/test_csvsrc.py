"""CSV/TSV ingestion (sources/csvsrc.py): schema enforcement,
corrupt-row quarantine (bad casts, wrong arity, broken quoting),
header dropping, write/read roundtrip, streaming==batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from argostats_spark.sources.csvsrc import (
    read_csv_corpus,
    read_csv_corpus_stream,
    write_csv_corpus,
)

SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("label", StringType()),
    StructField("score", DoubleType()),
])


@pytest.fixture(scope="module")
def csv_path(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "part-000.csv"
    lines = [
        "doc_id,label,score",          # header
        "1,spam,0.91",
        '2,"ham, sort of",0.25',       # quoted separator
        "3,unk,notanumber",            # bad cast -> quarantine
        "4,toofew",                    # wrong arity -> quarantine
        "5,x,0.5,extra",               # extra field -> quarantine
        "6,ok,0.125",
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_split_good_and_quarantine(spark, csv_path):
    good, bad = read_csv_corpus(spark, csv_path, SCHEMA, header=True)
    g = {r["doc_id"]: (r["label"], r["score"]) for r in good.collect()}
    assert g == {1: ("spam", 0.91), 2: ("ham, sort of", 0.25),
                 6: ("ok", 0.125)}
    assert good.columns == ["doc_id", "label", "score"]
    raw = sorted(r["raw_line"] for r in bad.collect())
    assert raw == ["3,unk,notanumber", "4,toofew", "5,x,0.5,extra"]


def test_quarantine_off_and_validation(spark, csv_path):
    good, bad = read_csv_corpus(
        spark, csv_path, SCHEMA, header=True, quarantine=False
    )
    assert bad is None and good.count() == 3
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_corpus(
            spark, csv_path,
            StructType([StructField("_corrupt_record", StringType())]),
        )


def test_tsv_and_headerless(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("tsv") / "t.tsv"
    p.write_text("7\thello world\t1.5\n8\ttab\tseparated\t2.0\n")
    good, bad = read_csv_corpus(spark, str(p), SCHEMA, sep="\t")
    assert {r["doc_id"] for r in good.collect()} == {7}
    assert bad.count() == 1  # 4 fields


def test_write_read_roundtrip(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csv_rt") / "out")
    df = spark.createDataFrame(
        [(1, "a,b", 0.5), (2, 'quo"te', -1.25), (3, None, 0.0)],
        SCHEMA,
    )
    write_csv_corpus(df, d)
    back, bad = read_csv_corpus(spark, d, SCHEMA, header=True)
    assert bad.count() == 0
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_streaming_matches_batch(spark, csv_path, tmp_path_factory):
    import shutil

    from argostats_spark.streaming.events import run_to_memory

    d = tmp_path_factory.mktemp("csv_stream")
    shutil.copy(csv_path, d / "part-000.csv")
    stream = read_csv_corpus_stream(spark, str(d), SCHEMA, header=True)
    assert stream.isStreaming
    q = run_to_memory(stream, "csv_stream", output_mode="append")
    try:
        rows = spark.table("csv_stream").collect()
    finally:
        q.stop()
    good = {r["doc_id"] for r in rows if not r["is_corrupt"]}
    bad = sorted(r["raw_line"] for r in rows if r["is_corrupt"])
    bgood, bbad = read_csv_corpus(spark, csv_path, SCHEMA, header=True)
    assert good == {r["doc_id"] for r in bgood.collect()}
    assert bad == sorted(r["raw_line"] for r in bbad.collect())
    for r in rows:
        if r["is_corrupt"]:
            assert r["doc_id"] is None and r["score"] is None


def test_multiline_streaming_matches_batch(spark, tmp_path_factory):
    """multiline=True streaming mirrors the batch multiline split:
    same good rows (embedded newline intact), same corrupt verdicts;
    expected_header rejected on the stream too."""
    from argostats_spark.streaming.events import run_to_memory

    d = tmp_path_factory.mktemp("csv_ml_stream")
    (d / "part-000.csv").write_text(
        'doc_id,label,score\n'
        '1,"two\nlines",0.5\n'
        '2,plain,1.25\n'
        '3,bad,notanumber\n'
    )
    stream = read_csv_corpus_stream(
        spark, str(d), SCHEMA, header=True, multiline=True
    )
    assert stream.isStreaming
    q = run_to_memory(stream, "csv_ml_stream", output_mode="append")
    try:
        rows = spark.table("csv_ml_stream").collect()
    finally:
        q.stop()
    good = {(r["doc_id"], r["label"], r["score"])
            for r in rows if not r["is_corrupt"]}
    bgood, bbad = read_csv_corpus(
        spark, str(d), SCHEMA, header=True, multiline=True
    )
    assert good == {tuple(r) for r in bgood.collect()}
    bad = [r for r in rows if r["is_corrupt"]]
    assert len(bad) == 1 and "notanumber" in bad[0]["raw_line"]
    assert bad[0]["doc_id"] is None and bad[0]["score"] is None
    with pytest.raises(ValueError, match="line-split"):
        read_csv_corpus_stream(
            spark, str(d), SCHEMA, multiline=True, expected_header="a,b,c"
        )


def test_header_variants_are_dropped(spark, tmp_path_factory):
    """Review finding (r9): real-world header spellings (spaces after
    separators, quoted fields, different case) must not leak through
    as clean all-string data rows."""
    p = tmp_path_factory.mktemp("csv_hdr") / "h.csv"
    p.write_text(
        'doc_id, label, score\n'
        '"doc_id","label","score"\n'
        'DOC_ID,LABEL,SCORE\n'
        '1,ok,0.5\n'
    )
    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("label", StringType()),
        StructField("score", StringType()),
    ])
    good, bad = read_csv_corpus(spark, str(p), schema, header=True)
    assert bad.count() == 0
    assert [tuple(r) for r in good.collect()] == [("1", "ok", "0.5")]


def test_tsv_header_normalization_keeps_empty_fields(spark, tmp_path_factory):
    """ADVICE r10: the header normalizer's whitespace class must not
    match the separator itself — for TSV, a bare \\s collapsed runs of
    tabs, so a DATA row with an empty field ('a\\t\\tb') normalized to
    the same form as a two-field header ('a\\tb') and was falsely
    dropped. Only PADDING whitespace may collapse."""
    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("mid", StringType()),
        StructField("score", StringType()),
    ])
    # a 3-field data row with an EMPTY middle field must NOT collide
    # with the 2-field expected_header form "doc_id\tscore"
    p = tmp_path_factory.mktemp("tsv_hdr") / "h.tsv"
    p.write_text(
        "doc_id\tmid\tscore\n"
        "doc_id\t\tscore\n"      # DATA: (doc_id, '', score)
        "1\tx\t0.5\n"
    )
    good, bad = read_csv_corpus(
        spark, str(p), schema, sep="\t", header=True,
        expected_header="doc_id\tscore",
    )
    got = sorted(tuple(r) for r in good.collect())
    # the empty field parses as NULL; the point is the row SURVIVES
    # as data instead of being dropped as a header
    assert got == [("1", "x", "0.5"), ("doc_id", None, "score")]
    assert bad.count() == 0
    # padding spaces around tabs still collapse: a padded spelling of
    # the real header matches the schema-derived form
    p2 = tmp_path_factory.mktemp("tsv_hdr2") / "h2.tsv"
    p2.write_text("doc_id \t mid \t score\n2\ty\t1.5\n")
    good2, bad2 = read_csv_corpus(
        spark, str(p2), schema, sep="\t", header=True,
    )
    assert [tuple(r) for r in good2.collect()] == [("2", "y", "1.5")]
    assert bad2.count() == 0


def test_expected_header_catches_foreign_spelling(spark, tmp_path_factory):
    """ADVICE r9: a file whose real header uses different names/order
    than the schema used to parse as a data row (silently, for
    all-string schemas). expected_header names the files' spelling(s)
    and those lines now drop like any header."""
    p = tmp_path_factory.mktemp("csv_xhdr") / "x.csv"
    p.write_text(
        "id, category , weight\n"   # foreign spelling + spacing
        "1,ok,0.5\n"
        "2,also,1.25\n"
    )
    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("label", StringType()),
        StructField("score", StringType()),
    ])
    # without expected_header the foreign header leaks through as data
    leaked, _ = read_csv_corpus(spark, str(p), schema, header=True)
    assert leaked.count() == 3
    good, bad = read_csv_corpus(
        spark, str(p), schema, header=True,
        expected_header="ID,CATEGORY,WEIGHT",
    )
    assert {r["doc_id"] for r in good.collect()} == {"1", "2"}
    assert bad.count() == 0
    # list form: several known spellings at once
    good2, _ = read_csv_corpus(
        spark, str(p), schema,
        expected_header=["id,category,weight", "col_a,col_b,col_c"],
    )
    assert good2.count() == 2


def test_multiline_quoted_newlines(spark, tmp_path_factory):
    """VERDICT r10 item 6: multiline=True parses quoted embedded
    newlines under the same (good, bad) contract; the default
    line-split path quarantines the same rows observably; and the
    line-split-only options are rejected loudly with multiline."""
    p = tmp_path_factory.mktemp("csv_ml") / "m.csv"
    p.write_text(
        'doc_id,label,score\n'
        '1,"two\nlines",0.5\n'
        '2,plain,1.25\n'
        '3,bad,notanumber\n'
    )
    good, bad = read_csv_corpus(
        spark, str(p), SCHEMA, header=True, multiline=True
    )
    assert sorted(tuple(r) for r in good.collect()) == [
        (1, "two\nlines", 0.5), (2, "plain", 1.25),
    ]
    brows = bad.collect()
    assert len(brows) == 1 and brows[0]["reason"] == "parse"
    assert "notanumber" in brows[0]["raw_line"]
    # quarantine=False drops the bad frame, same as the line-split path
    g2, b2 = read_csv_corpus(
        spark, str(p), SCHEMA, header=True, multiline=True,
        quarantine=False,
    )
    assert b2 is None and g2.count() == 2
    # the default path can't join the split halves back — but each half
    # QUARANTINES (observable), never silently parses wrong
    gd, bd = read_csv_corpus(spark, str(p), SCHEMA, header=True)
    assert {r["doc_id"] for r in gd.collect()} == {2}
    assert bd.count() == 3  # two halves of the quoted row + the bad cast
    # line-split-only options are rejected, not ignored
    with pytest.raises(ValueError, match="line-split"):
        read_csv_corpus(spark, str(p), SCHEMA, multiline=True,
                        expected_header="a,b,c")
    with pytest.raises(ValueError, match="line-split"):
        read_csv_corpus(spark, str(p), SCHEMA, multiline=True,
                        quarantine_headers=True)


def test_quarantine_headers_makes_residual_observable(spark, csv_path):
    """ADVICE r9: quarantine_headers=True routes header-form lines to
    the bad frame tagged reason='header' (instead of vanishing), so a
    data row colliding with the header spelling is recoverable and
    'one header per part file' is countable. Parse failures keep
    reason='parse'."""
    good, bad = read_csv_corpus(
        spark, csv_path, SCHEMA, header=True, quarantine_headers=True
    )
    assert good.count() == 3  # split unchanged
    rows = {(r["raw_line"], r["reason"]) for r in bad.collect()}
    assert ("doc_id,label,score", "header") in rows
    assert {r for r in rows if r[1] == "parse"} == {
        ("3,unk,notanumber", "parse"),
        ("4,toofew", "parse"),
        ("5,x,0.5,extra", "parse"),
    }
    # default: headers stay out of quarantine, reason is all-parse
    _, bad_default = read_csv_corpus(spark, csv_path, SCHEMA, header=True)
    assert {r["reason"] for r in bad_default.collect()} == {"parse"}
