"""Unigram-LM tokenizer (operators/unigram.py, Kudo 2018): seeding,
Viterbi determinism, EM monotonicity, pruning closure, encode paths,
and streaming==batch."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.unigram import (
    substring_seed,
    unigram_encode,
    unigram_encode_rows,
    unigram_train,
    viterbi_segment,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .cache()
    )


def test_viterbi_prefers_high_prob_long_pieces():
    logp = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.5),
            "c": math.log(0.1)}
    assert viterbi_segment("abc", logp, 8) == (["ab", "c"], True)
    # unseen char covers itself, flagged OOV
    pieces, known = viterbi_segment("axb", logp, 8)
    assert pieces == ["a", "x", "b"] and not known
    # exact tie -> longer piece wins (deterministic)
    tie = {"a": math.log(0.25), "aa": math.log(0.0625)}
    assert viterbi_segment("aa", tie, 8) == (["aa"], True)


def test_substring_seed_counts(spark):
    words = spark.createDataFrame(
        [("aba", 2), ("ab", 3)], "word string, n long"
    )
    seed = dict(substring_seed(words, max_piece_len=3, seed_size=100))
    # 'ab' occurs once in 'aba' (x2) and once in 'ab' (x3) = 5
    assert seed["ab"] == 5
    # 'a' occurs twice in 'aba' (x2) + once in 'ab' (x3) = 7
    assert seed["a"] == 7 and seed["b"] == 5
    assert seed["aba"] == 2 and "abab" not in seed
    # seed_size caps multi-char pieces but single chars always survive
    tiny = dict(substring_seed(words, max_piece_len=3, seed_size=1))
    assert "a" in tiny and "b" in tiny


def test_train_learns_frequent_piece_and_bounds_vocab(spark):
    rows = [(i, "sparkling sparks spark") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram_train(docs, vocab_size=12, em_rounds=2, seed_size=60)
    probs = dict(model)
    assert "spark" in probs
    alphabet = {p for p in probs if len(p) == 1}
    assert len(model) <= 12 + len(alphabet)
    # single-char closure: every character of the corpus is a piece
    assert {"s", "p", "a", "r", "k", "l", "i", "n", "g"} <= set(probs)
    # probabilities normalized
    assert abs(sum(math.exp(lp) for _, lp in model) - 1.0) < 1e-9
    # encoding uses the learned long piece
    enc = unigram_encode(docs.limit(1), model)
    got = {r["word"]: r["pieces"] for r in enc.collect()}
    assert got["spark"] == ["spark"]
    # the 9-char word compresses into few learned pieces (never chars)
    assert "".join(got["sparkling"]) == "sparkling"
    assert len(got["sparkling"]) <= 3


def test_train_partition_independent(spark, corpus):
    a = unigram_train(corpus.coalesce(1), vocab_size=300, em_rounds=2)
    b = unigram_train(corpus.repartition(13), vocab_size=300, em_rounds=2)
    assert a == b  # exact equality: model order, pieces AND logps


def test_viterbi_objective_monotone_over_rounds(spark, corpus):
    """Hard-EM sanity: the total Viterbi log-likelihood of the word
    table is non-decreasing as rounds add (each E-step is optimal for
    the previous M-step; each M-step maximizes the hard-count
    likelihood)."""
    from argostats_spark.operators.bpe import word_freqs

    wf = [(r["word"], r["n"]) for r in word_freqs(corpus).collect()]

    def total_ll(model):
        logp = dict(model)
        tot = 0.0
        for w, n in wf:
            pieces, _ = viterbi_segment(w, logp, 8)
            tot += n * sum(logp.get(p, -100.0) for p in pieces)
        return tot

    lls = [
        total_ll(unigram_train(corpus, vocab_size=5000, em_rounds=r,
                               seed_size=5000))
        for r in (1, 2, 3)
    ]
    assert lls[0] <= lls[1] + 1e-6 and lls[1] <= lls[2] + 1e-6, lls


def test_encode_roundtrip_and_rows_equal_join(spark, corpus):
    model = unigram_train(corpus, vocab_size=400, em_rounds=2)
    enc = unigram_encode(corpus, model)
    # pieces concatenate back to the word, every token encodable
    bad = enc.filter(
        F.concat_ws("", F.col("pieces")) != F.col("word")
    ).count()
    assert bad == 0
    assert enc.filter(~F.col("in_vocab")).count() == 0  # trained corpus
    # join path == row-local path (flattened in pos order)
    per_doc: dict[int, list] = {}
    for r in sorted(enc.collect(), key=lambda r: (r["doc_id"], r["pos"])):
        per_doc.setdefault(r["doc_id"], []).extend(r["pieces"])
    rows_out = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode_rows(corpus, model).collect()
    }
    assert rows_out == per_doc


def test_encode_rows_streaming_equals_batch(spark, corpus, tmp_path_factory):
    model = unigram_train(corpus, vocab_size=200, em_rounds=1)
    src = str(tmp_path_factory.mktemp("unistream") / "in")
    corpus.limit(40).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    batch = {r["doc_id"]: list(r["pieces"]) for r in
             unigram_encode_rows(spark.read.parquet(src), model).collect()}
    stream = unigram_encode_rows(
        spark.readStream.schema(schema).parquet(src), model
    )
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("uni_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: list(r["pieces"]) for r in
               spark.sql("SELECT * FROM uni_stream").collect()}
    finally:
        q.stop()
    assert got == batch


def test_validation(spark, corpus):
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train(corpus, vocab_size=0)
    with pytest.raises(ValueError, match="em_rounds"):
        unigram_train(corpus, vocab_size=10, em_rounds=0)


def test_vocab_ids_and_encode_ids(spark, corpus):
    from argostats_spark.operators.unigram import unigram_encode_ids, unigram_vocab

    model = unigram_train(corpus, vocab_size=200, em_rounds=1)
    vocab = unigram_vocab(model, specials=("<pad>", "<eos>"))
    assert vocab[0] == ("<pad>", 0, None) and vocab[1] == ("<eos>", 1, None)
    ids = [v[1] for v in vocab]
    assert ids == list(range(len(vocab)))  # dense, gap-free
    by_piece = {p: i for p, i, _ in vocab}
    out = unigram_encode_ids(corpus.limit(10), model, vocab).collect()
    for r in out:
        assert list(r["ids"]) == [by_piece.get(p, -1) for p in r["pieces"]]
        assert all(i >= 0 for i in r["ids"])  # trained corpus: no unk
    # out-of-alphabet char at inference time -> unk_id
    alien = spark.createDataFrame([(0, "zzzézzz")], "doc_id long, text string")
    got = unigram_encode_ids(alien, model, vocab, unk_id=-7).collect()[0]
    assert -7 in list(got["ids"])


def test_encode_rows_unicode_whitespace_matches_join_path(spark):
    """NBSP/ideographic space are NOT token separators in either path
    (Spark trim is space-only, Java \\s is ASCII); the row-local mirror
    must agree byte-for-byte (review r8)."""
    docs = spark.createDataFrame(
        [(0, " foo bar　baz "), (1, "plain text")],
        "doc_id long, text string",
    )
    model = [("f", -1.0), ("o", -1.0), ("a", -1.0), ("b", -1.0),
             ("r", -1.0), ("z", -1.0), ("t", -1.0)]
    enc = unigram_encode(docs, model)
    per_doc: dict[int, list] = {}
    for r in sorted(enc.collect(), key=lambda r: (r["doc_id"], r["pos"])):
        per_doc.setdefault(r["doc_id"], []).extend(r["pieces"])
    rows_out = {r["doc_id"]: list(r["pieces"])
                for r in unigram_encode_rows(docs, model).collect()}
    assert rows_out == per_doc
    # the NBSP stayed glued to its token in both paths
    assert any(p == " " for p in rows_out[0])


def test_empty_corpus_rejected(spark):
    from argostats_spark.operators.unigram import unigram_train

    empty = spark.createDataFrame([(0, "   ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        unigram_train(empty, vocab_size=10)


def test_vocab_size_is_an_exact_bound(spark):
    """ADVICE r8: the final model must never exceed vocab_size (unless
    the alphabet alone does — closure floor). Use a vocab_size small
    enough that some singles fall outside the top-N by count."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog zzz qqq xyzw")
         for i in range(20)],
        "doc_id long, text string",
    )
    alphabet = {c for c in "thequickbrownfoxjumpsoverlazydogzqxyw"}
    for vs in (len(alphabet) + 3, len(alphabet) + 10, 200):
        model = unigram_train(docs, vocab_size=vs, em_rounds=1, seed_size=80)
        assert len(model) <= max(vs, len(alphabet)), vs
        # closure: every single char survives
        pieces = {p for p, _ in model}
        assert alphabet <= pieces
    # alphabet bigger than vocab_size: the floor wins, model = singles
    tiny = unigram_train(docs, vocab_size=5, em_rounds=1, seed_size=80)
    assert {p for p, _ in tiny} == alphabet


def test_duckdb_viterbi_twin_matches_python_exactly():
    """The bpe_subwords 'uword' oracle replays Viterbi with a DuckDB
    recursive CTE. This differential pins the construction against the
    engine kernel (viterbi_segment) on a model with an ENGINEERED
    EXACT-FLOAT TIE ('th' vs 't'+'h') — the case where anything short
    of bit-identical scores + the same tie-break diverges. Mirrors the
    CTE in queries_documents._bpe_suite_oracle_sql."""
    import math
    import random

    import duckdb

    random.seed(7)
    pieces = list("abcdefghijklmnopqrstuvwxyz012") + [
        "th", "he", "in", "er", "an", "ing", "ion", "ent", "the", "and",
        "tion", "ed", "es", "re", "at", "st", "on", "qu", "ck",
    ]
    logp = {p: math.log(random.uniform(1, 500)) - math.log(5000)
            for p in pieces}
    logp["th"] = logp["t"] + logp["h"]  # exact tie: longer piece must win
    words = ["the", "thing", "quick", "entertain", "station", "zzz",
             "q0x", "ingestion", "anon", "attention", "hehehe", "th",
             "a", "extraordinarily"]
    py = {w: viterbi_segment(w, logp, 8) for w in words}

    con = duckdb.connect()
    con.execute("CREATE TABLE model(piece VARCHAR, logp DOUBLE)")
    con.executemany("INSERT INTO model VALUES (?, ?)", list(logp.items()))
    con.execute("CREATE TABLE uw(word VARCHAR)")
    con.executemany("INSERT INTO uw VALUES (?)", [(w,) for w in words])
    got = {r[0]: (r[1], r[2]) for r in con.execute(r"""
    WITH RECURSIVE um AS (SELECT map(list(piece), list(logp)) AS mp FROM model),
    udp AS (
      SELECT word, 0 AS i, [0.0]::DOUBLE[] AS best,
             [-1]::INT[] AS bj, ['']::VARCHAR[] AS bp FROM uw
      UNION ALL
      SELECT word, i + 1,
             best || [win.s], bj || [CAST(win.j AS INT)], bp || [win.piece]
      FROM (
        SELECT word, i, best, bj, bp,
               list_filter(scored, c -> c.s = list_aggregate(
                 list_transform(scored, x -> x.s), 'max'))[1] AS win
        FROM (
          SELECT d.word, d.i, d.best, d.bj, d.bp,
            list_transform(
              list_filter(
                list_transform(range(greatest(0, d.i + 1 - 8), d.i + 1),
                  j -> struct_pack(
                    j := j,
                    piece := substr(d.word, CAST(j + 1 AS INT),
                                    CAST(d.i + 1 - j AS INT)),
                    lp := CASE
                      WHEN len(um.mp[substr(d.word, CAST(j + 1 AS INT),
                                            CAST(d.i + 1 - j AS INT))]) > 0
                        THEN um.mp[substr(d.word, CAST(j + 1 AS INT),
                                          CAST(d.i + 1 - j AS INT))][1]
                      WHEN d.i + 1 - j = 1 THEN -100.0
                      ELSE NULL END)),
                c -> c.lp IS NOT NULL),
              c -> struct_pack(j := c.j, piece := c.piece,
                               s := d.best[CAST(c.j + 1 AS INT)] + c.lp)
            ) AS scored
          FROM udp d, um WHERE d.i < len(d.word)
        )
      )
    ),
    ufin AS (SELECT word, bj, bp FROM udp WHERE i = len(word)),
    ubt AS (
      SELECT word, len(word) AS pos, []::VARCHAR[] AS ps, bj, bp FROM ufin
      UNION ALL
      SELECT word, bj[pos + 1], list_prepend(bp[pos + 1], ps), bj, bp
      FROM ubt WHERE pos > 0
    )
    SELECT b.word, b.ps,
           len(list_filter(b.ps, p -> len(um.mp[p]) = 0)) = 0
    FROM ubt b, um WHERE b.pos = 0
    """).fetchall()}
    assert got == {w: (py[w][0], py[w][1]) for w in words}
    # the tie case specifically: longer piece won on both engines
    assert got["th"][0] == ["th"]
