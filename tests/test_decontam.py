"""Benchmark decontamination (operators/decontam.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.decontam import ngram_contamination


@pytest.fixture(scope="module")
def tables(spark):
    corpus = spark.createDataFrame(
        [
            # shares the full benchmark 3-gram "the quick brown" + more
            (1, "the quick brown fox jumps over the lazy dog"),
            # clean: no 3-gram in common with the benchmark
            (2, "completely unrelated text about spark physical plans"),
            # short doc (< 3 tokens): zero n-grams, never contaminated
            (3, "two tokens"),
            # one overlapping 3-gram exactly ("pack my box")
            (4, "please pack my box tonight"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [
            (100, "the quick brown fox"),
            (101, "pack my box with five dozen jugs"),
        ],
        "doc_id long, text string",
    )
    return corpus, benchmark


def test_planted_contamination_flags(spark, tables):
    corpus, benchmark = tables
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, benchmark, n=3).collect()
    }
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] >= 2
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0
    # short doc: empty n-gram set, ratio 0, not contaminated
    assert out[3]["n_grams"] == 0 and out[3]["contaminated"] == 0
    assert out[3]["hit_ratio"] == 0.0
    assert out[4]["contaminated"] == 1 and out[4]["n_hits"] == 1


def test_every_corpus_doc_reported_once(spark, tables):
    corpus, benchmark = tables
    out = ngram_contamination(corpus, benchmark, n=3)
    assert out.count() == corpus.count()
    assert out.select("doc_id").distinct().count() == corpus.count()


def test_min_hits_threshold(spark, tables):
    corpus, benchmark = tables
    out = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_contamination(corpus, benchmark, n=3, min_hits=2).collect()
    }
    # doc 4 has exactly one colliding 3-gram -> clean under min_hits=2
    assert out[4] == 0
    assert out[1] == 1


def test_benchmark_side_is_broadcast(spark, tables):
    from argostats_spark.plans.explain import physical_plan

    corpus, benchmark = tables
    plan = physical_plan(ngram_contamination(corpus, benchmark, n=3))
    assert "BroadcastHashJoin" in plan
    # the corpus n-gram stream must not sort-merge against the benchmark
    assert "SortMergeJoin" not in plan.split("n_hits")[0]


def test_advisor_consumer_broadcast_outcome(spark, tables):
    """VERDICT r12 item 4: ngram_contamination(advisor=True) consults
    choose_join_strategy end-to-end. Small benchmark -> broadcast
    decision, identical plan family AND identical rows to the
    default hard-coded broadcast."""
    from argostats_spark.plans.explain import physical_plan

    corpus, benchmark = tables
    rec: dict = {}
    out = ngram_contamination(
        corpus, benchmark, n=3, advisor=True, advisor_record=rec
    )
    assert rec["strategy"] in ("broadcast_a", "broadcast_b")
    assert "reason" in rec and rec["est"] >= 0
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan
    default = ngram_contamination(corpus, benchmark, n=3)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, default.collect())
    )


def test_advisor_store_makes_second_call_scan_free(spark, tables,
                                                   tmp_path):
    """VERDICT r13 item 4 'done' gate: with a SketchStore, the SECOND
    advisor call runs ZERO extra Spark jobs for the pre-flight (both
    sketches load from disk), reaches the same decision, and the
    store-less path is unchanged. Passing a store without fingerprints
    raises — staleness is the caller's contract."""
    import pytest as _pytest

    from argostats_spark.operators.joinsize import SketchStore

    corpus, benchmark = tables
    store = SketchStore(str(tmp_path / "advisor_sketches"))
    with _pytest.raises(ValueError, match="advisor_fingerprints"):
        ngram_contamination(
            corpus, benchmark, n=3, advisor=True, advisor_store=store
        )
    rec1: dict = {}
    out1 = ngram_contamination(
        corpus, benchmark, n=3, advisor=True, advisor_record=rec1,
        advisor_store=store, advisor_fingerprints=("c_v1", "b_v1"),
    )
    rows1 = sorted(map(tuple, out1.collect()))
    # second call: the pre-flight itself must launch no jobs — pin by
    # job-group: building the lazy result DataFrame (advisor included)
    # runs entirely driver-side once both sketches are cache hits
    sc = spark.sparkContext
    sc.setJobGroup("advisor_warm", "warm advisor pre-flight")
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup("advisor_warm"))
    rec2: dict = {}
    out2 = ngram_contamination(
        corpus, benchmark, n=3, advisor=True, advisor_record=rec2,
        advisor_store=store, advisor_fingerprints=("c_v1", "b_v1"),
    )
    after = set(tracker.getJobIdsForGroup("advisor_warm"))
    sc.setJobGroup(None, None)
    assert before == after, "warm advisor pre-flight ran Spark jobs"
    assert rec2 == rec1
    assert sorted(map(tuple, out2.collect())) == rows1
    # and the decision matches the plain scan-every-time advisor
    rec3: dict = {}
    ngram_contamination(
        corpus, benchmark, n=3, advisor=True, advisor_record=rec3
    )
    assert rec3 == rec1


def test_advisor_consumer_salted_outcome(spark):
    """The salted leg of the consumer: benchmark over the row budget,
    one corpus n-gram hot enough to dominate a partition -> the
    advisor salts the corpus-gram side and the executed join carries
    the salt column; rows still match the plain broadcast form."""
    from argostats_spark.plans.explain import physical_plan

    # hot corpus: one 3-gram ("aa bb cc") repeated across many docs;
    # benchmark contains that gram plus enough distinct grams to
    # overflow a deliberately tiny broadcast budget
    corpus = spark.createDataFrame(
        [(i, "aa bb cc dd") for i in range(3000)]
        + [(9000, "zz yy xx ww")],
        "doc_id long, text string",
    )
    bench_rows = [(100, "aa bb cc")] + [
        (200 + i, f"t{i} u{i} v{i} w{i}") for i in range(300)
    ]
    benchmark = spark.createDataFrame(bench_rows, "doc_id long, text string")
    rec: dict = {}
    out = ngram_contamination(
        corpus, benchmark, n=3, advisor=True, advisor_record=rec,
        advisor_opts={
            "broadcast_rows": 100, "shuffle_partitions": 32,
            "skew_factor": 2.0,
        },
    )
    assert rec["strategy"] == "salted" and rec["salt_side"] == "a", rec
    assert "__argostats_salt" in physical_plan(out)
    default = ngram_contamination(corpus, benchmark, n=3)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, default.collect())
    )


# -------------------------------------------------------------------------
# Corpus-internal duplicated passages (window-hash substring dedup)
# -------------------------------------------------------------------------

@pytest.fixture(scope="module")
def passage_corpus(spark):
    shared = "alpha beta gamma delta epsilon"          # 5-token span
    return spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),        # shares span with 2
            (2, f"{shared} five six seven eight nine"),
            (3, "ten eleven twelve thirteen fourteen fifteen"),   # clean
            (4, "rep rep rep rep rep rep rep rep"),     # within-doc repeat
            (5, "short doc"),                           # < window tokens
        ],
        "doc_id long, text string",
    )


def _py_windows(text: str, window: int, stride: int):
    toks = text.split()
    return [
        " ".join(toks[s : s + window])
        for s in range(0, len(toks) - window + 1, stride)
    ]


def test_duplicate_passages_planted(spark, passage_corpus):
    from argostats_spark.operators.decontam import duplicate_passages

    out = duplicate_passages(passage_corpus, window=5, stride=1).collect()
    # cross-doc: exactly the shared 5-gram; within-doc: every "rep"*5
    # window of doc 4 hashes identically (4 occurrences, 1 doc)
    by_docs = {(r["n_docs"], r["n_occurrences"]) for r in out}
    assert (2, 2) in by_docs            # the alpha..epsilon span
    assert (1, 4) in by_docs            # doc 4's repeated window
    assert all(r["n_occurrences"] >= 2 for r in out)
    cross = [r for r in out if r["n_docs"] == 2]
    assert len(cross) == 1 and cross[0]["first_doc_id"] == 1


def test_duplicate_passages_differential_vs_python(spark, passage_corpus):
    """Window census agrees with a pure-Python rolling-window counter."""
    from collections import Counter

    from argostats_spark.operators.decontam import duplicate_passages

    rows = passage_corpus.collect()
    for window, stride in ((5, 1), (3, 2), (8, 1)):
        cnt = Counter()
        for r in rows:
            cnt.update(_py_windows(r["text"], window, stride))
        expect = sorted(c for c in cnt.values() if c >= 2)
        got = sorted(
            r["n_occurrences"]
            for r in duplicate_passages(
                passage_corpus, window=window, stride=stride
            ).collect()
        )
        assert got == expect, (window, stride)


def test_flag_duplicate_passages_per_doc(spark, passage_corpus):
    from argostats_spark.operators.decontam import flag_duplicate_passages

    out = {
        r["doc_id"]: r
        for r in flag_duplicate_passages(
            passage_corpus, window=5, stride=1
        ).collect()
    }
    assert 5 not in out                       # shorter than the window
    assert out[3]["has_dup"] == 0 and out[3]["n_dup_windows"] == 0
    assert out[1]["has_dup"] == 1 and out[2]["has_dup"] == 1
    assert out[4]["n_windows"] == 4 and out[4]["n_dup_windows"] == 4
    assert out[4]["dup_frac"] == 1.0
    # doc 1: 9 tokens -> 5 windows, exactly one duplicated
    assert out[1]["n_windows"] == 5 and out[1]["n_dup_windows"] == 1


def test_passage_hashers_and_validation(spark, passage_corpus):
    from argostats_spark.operators.decontam import duplicate_passages

    a = duplicate_passages(passage_corpus, window=5, hasher="xxhash64")
    b = duplicate_passages(passage_corpus, window=5, hasher="md5")
    # same census regardless of hash family
    key = lambda df: sorted(  # noqa: E731
        (r["n_docs"], r["n_occurrences"]) for r in df.collect()
    )
    assert key(a) == key(b)
    with pytest.raises(ValueError, match="hasher"):
        duplicate_passages(passage_corpus, hasher="sha1").collect()
    with pytest.raises(ValueError, match="window"):
        duplicate_passages(passage_corpus, window=0).collect()


def test_duplicate_passages_randomized_differential(spark):
    """Randomized sweep: small-vocab corpora force genuine cross-doc
    window collisions; the engine's census must equal a pure-Python
    rolling-window counter for every (window, stride) drawn."""
    from collections import Counter

    import numpy as np

    from argostats_spark.operators.decontam import duplicate_passages

    rng = np.random.default_rng(17)
    vocab = [f"t{i}" for i in range(6)]   # tiny vocab -> dense collisions
    for trial in range(5):
        docs = [
            (i, " ".join(rng.choice(vocab, size=rng.integers(0, 25))))
            for i in range(30)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        window = int(rng.integers(2, 6))
        stride = int(rng.integers(1, window + 1))
        cnt = Counter()
        for _, t in docs:
            toks = t.split()
            cnt.update(
                " ".join(toks[s:s + window])
                for s in range(0, len(toks) - window + 1, stride)
            )
        expect = sorted(c for c in cnt.values() if c >= 2)
        got = sorted(
            r["n_occurrences"]
            for r in duplicate_passages(df, window=window, stride=stride).collect()
        )
        assert got == expect, (trial, window, stride)


def test_remove_duplicate_passages(spark):
    """Removal form of exact substring dedup: a passage repeated across
    documents survives ONLY in its canonical first occurrence; the
    non-canonical copy loses exactly the passage tokens (overlapping
    stride-1 spans merge into one cut interval); unique text and
    sub-window docs pass through; a within-document repeat keeps its
    first occurrence."""
    from argostats_spark.operators.decontam import remove_duplicate_passages

    passage = " ".join(f"p{i}" for i in range(10))
    passage2 = " ".join(f"q{i}" for i in range(10))
    rows = [
        # doc 1: canonical first occurrence (lowest doc_id)
        (1, f"alpha beta {passage} gamma delta"),
        # doc 2: same passage mid-document -> cut
        (2, f"one two three {passage} four five six"),
        # doc 3: unique text, longer than window -> untouched
        (3, " ".join(f"u{i}" for i in range(15))),
        # doc 4: shorter than window -> untouched
        (4, "tiny doc"),
        # doc 5: a DIFFERENT passage twice IN ONE doc -> second cut
        # (its first copy is the corpus-wide canonical)
        (5, f"{passage2} mid {passage2} tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in remove_duplicate_passages(df, window=10, stride=1).collect()
    }
    assert got[1]["text_dedup"] == rows[0][1]          # canonical kept
    assert got[1]["n_tokens_removed"] == 0
    assert got[2]["text_dedup"] == "one two three four five six"
    assert got[2]["n_tokens_removed"] == 10
    assert got[3]["text_dedup"] == rows[2][1]
    assert got[3]["n_tokens_removed"] == 0
    assert got[4]["text_dedup"] == "tiny doc"
    assert got[4]["n_tokens_removed"] == 0
    # within-doc repeat: first kept, second cut. The spans between the
    # two copies ("mid" windows) are unique, so only the second copy's
    # tokens go.
    assert got[5]["text_dedup"] == f"{passage2} mid tail"
    assert got[5]["n_tokens_removed"] == 10
    # schema: inputs carried + the two new columns
    assert set(got[1].asDict()) == {
        "doc_id", "text", "text_dedup", "n_tokens_removed"
    }


# ---------------------------------------------------------------------------
# Line-level dedup (CCNet paragraph-hash / RefinedWeb line dedup family)
# ---------------------------------------------------------------------------

_BOILER = "cookie consent required"


@pytest.fixture(scope="module")
def line_corpus(spark):
    rows = [
        # doc 1: canonical first occurrence of the boilerplate line
        (1, f"{_BOILER}\nunique alpha content\nmore alpha"),
        # doc 2: same line again (trailing spaces + CRLF -> same hash)
        (2, f"beta opening\n  {_BOILER}  \r\nbeta closing"),
        # doc 3: same line a third time, plus a blank line that stays
        (3, f"{_BOILER}\n\ngamma body"),
        # doc 4: no duplicated lines at all
        (4, "delta only\nsecond delta line"),
        # doc 5: a WITHIN-document repeated line
        (5, "echo echo\nmiddle\necho echo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_lines_census(spark, line_corpus):
    from argostats_spark.operators.decontam import duplicate_lines

    dup = duplicate_lines(line_corpus).collect()
    by_first = {r["first_doc_id"]: r for r in dup}
    assert set(by_first) == {1, 5}
    assert by_first[1]["n_occurrences"] == 3 and by_first[1]["n_docs"] == 3
    assert by_first[5]["n_occurrences"] == 2 and by_first[5]["n_docs"] == 1
    # census is threshold-gated
    from argostats_spark.operators.decontam import duplicate_lines as dl

    assert dl(line_corpus, min_occurrences=3).count() == 1


def test_remove_duplicate_lines_keep_first(spark, line_corpus):
    from argostats_spark.operators.decontam import remove_duplicate_lines

    got = {r["doc_id"]: r for r in remove_duplicate_lines(line_corpus).collect()}
    # canonical first occurrence kept byte-for-byte
    assert got[1]["text_dedup"] == f"{_BOILER}\nunique alpha content\nmore alpha"
    assert got[1]["n_lines_removed"] == 0
    # later occurrences cut; surrounding lines keep their ORIGINAL bytes
    assert got[2]["text_dedup"] == "beta opening\nbeta closing"
    assert got[2]["n_lines_removed"] == 1
    # blank line survives (never a duplicate, slot preserved)
    assert got[3]["text_dedup"] == "\ngamma body"
    assert got[3]["n_lines_removed"] == 1
    assert got[4]["text_dedup"] == got[4]["text"]
    # within-doc repeat: first kept, second cut
    assert got[5]["text_dedup"] == "echo echo\nmiddle"
    assert got[5]["n_lines_removed"] == 1
    # n_lines counts NON-BLANK input lines
    assert got[3]["n_lines"] == 2
    assert set(got[1].asDict()) == {
        "doc_id", "text", "text_dedup", "n_lines", "n_lines_removed"
    }


def test_remove_duplicate_lines_strip_all(spark, line_corpus):
    """keep_first=False (boilerplate-strip): every occurrence goes,
    including the canonical first."""
    from argostats_spark.operators.decontam import remove_duplicate_lines

    got = {
        r["doc_id"]: r
        for r in remove_duplicate_lines(line_corpus, keep_first=False).collect()
    }
    assert got[1]["text_dedup"] == "unique alpha content\nmore alpha"
    assert got[3]["text_dedup"] == "\ngamma body"
    assert got[5]["text_dedup"] == "middle"
    assert got[5]["n_lines_removed"] == 2


def test_remove_duplicate_lines_differential_vs_python(spark):
    """Randomized differential: Spark removal == a naive Python mirror
    (global first-occurrence scan ordered by (doc_id, line_no))."""
    import random

    from argostats_spark.operators.decontam import remove_duplicate_lines

    rng = random.Random(8)
    vocab = ["nav", "home", "about", "contact", "body", "text", "foo", "bar"]
    rows = []
    for i in range(40):
        lines = [
            " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
            for _ in range(rng.randint(1, 6))
        ]
        if rng.random() < 0.3:
            lines.insert(rng.randrange(len(lines) + 1), "")
        rows.append((i, "\n".join(lines)))

    from collections import Counter

    counts = Counter(
        ln.strip()
        for _, text in rows
        for ln in text.split("\n")
        if ln.strip() != ""
    )
    seen: set[str] = set()
    expect: dict[int, str] = {}
    for i, text in rows:
        kept = []
        for ln in text.split("\n"):
            t = ln.strip()
            if t == "":
                kept.append(ln)
            elif counts[t] < 2 or t not in seen:
                kept.append(ln)
                seen.add(t)
        expect[i] = "\n".join(kept)

    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    got = {
        r["doc_id"]: r["text_dedup"]
        for r in remove_duplicate_lines(df).collect()
    }
    assert got == expect


def test_line_hasher_validation(spark, line_corpus):
    from argostats_spark.operators.decontam import duplicate_lines

    with pytest.raises(ValueError, match="hasher"):
        duplicate_lines(line_corpus, hasher="sha1").collect()
    # md5 path (the oracle family) agrees with xxhash64 on the census
    a = sorted(
        (r["first_doc_id"], r["n_occurrences"])
        for r in duplicate_lines(line_corpus, hasher="md5").collect()
    )
    b = sorted(
        (r["first_doc_id"], r["n_occurrences"])
        for r in duplicate_lines(line_corpus).collect()
    )
    assert a == b
