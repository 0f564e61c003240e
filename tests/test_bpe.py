"""BPE training/encoding (operators/bpe.py) — differential tests
against a plain-Python reference implementation of Sennrich et al.
2016 (the same verification pattern the k-means / PQ operators use:
the iterative trainer is pinned engine-side by an exact differential,
the encode+aggregate path is driver-hashed via the materialized-model
oracle in the bpe_subwords registry row)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from argostats_spark.operators.bpe import (
    EOW,
    apply_merge,
    bpe_encode,
    bpe_train,
    word_freqs,
)


def _ref_bpe(word_counts: dict[str, int], k: int, min_pair_count: int = 2):
    """Reference BPE: dict word -> symbol list, leftmost non-overlapping
    merge, tiebreak (count desc, a asc, b asc)."""
    vocab = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            n = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest widest"),
]


def test_train_matches_reference_exactly(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    wc = Counter()
    for _, t in CORPUS:
        wc.update(t.split())
    ref_merges, ref_vocab = _ref_bpe(dict(wc), 12)
    merges, words = bpe_train(docs, 12)
    assert merges == ref_merges
    got = {r["word"]: list(r["symbols"]) for r in words.collect()}
    assert got == ref_vocab
    # counts survived training untouched
    n = {r["word"]: r["n"] for r in words.collect()}
    assert n == dict(wc)


def test_train_partition_independent(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    m1, _ = bpe_train(docs.repartition(7), 8)
    m2, _ = bpe_train(docs.coalesce(1), 8)
    assert m1 == m2 and len(m1) == 8


def test_apply_merge_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["x", "a", "a"],)],
        "symbols array<string>",
    )
    out = [
        list(r["m"])
        for r in df.select(apply_merge(F.col("symbols"), "a", "a").alias("m")).collect()
    ]
    assert out == [["aa", "a"], ["aa", "aa"], ["x", "aa"]]


def test_encode_roundtrip_and_oov(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    _, words = bpe_train(docs, 10)
    enc = bpe_encode(docs, words)
    rows = enc.collect()
    # every in-vocab token's subwords concatenate back to word + EOW
    assert all(r["in_vocab"] for r in rows)
    for r in rows:
        assert "".join(r["subwords"]) == r["word"] + EOW
        assert r["n_subwords"] == len(r["subwords"])
    # OOV word falls back to characters + EOW, flagged
    new = spark.createDataFrame([(9, "unseen low")], "doc_id bigint, text string")
    erows = {r["word"]: r for r in bpe_encode(new, words).collect()}
    assert not erows["unseen"]["in_vocab"]
    assert list(erows["unseen"]["subwords"]) == list("unseen") + [EOW]
    assert erows["low"]["in_vocab"]


def test_min_pair_count_stops_training(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id bigint, text string")
    merges, _ = bpe_train(docs, 50, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_word_freqs_is_lowercased_count(spark):
    docs = spark.createDataFrame(
        [(1, "Low LOW low"), (2, "wide")], "doc_id bigint, text string"
    )
    got = {r["word"]: r["n"] for r in word_freqs(docs).collect()}
    assert got == {"low": 3, "wide": 1}


def test_vocab_ids_dense_frequency_ordered(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    from argostats_spark.operators.bpe import bpe_vocab

    _, words = bpe_train(docs, 10)
    v = bpe_vocab(words).collect()
    ids = sorted(r["id"] for r in v)
    assert ids == list(range(len(v)))  # dense from 0
    by_id = sorted(v, key=lambda r: r["id"])
    freqs = [r["freq"] for r in by_id]
    assert freqs == sorted(freqs, reverse=True)
    # specials take the lowest ids in order
    v2 = {r["subword"]: r for r in bpe_vocab(words, ("<pad>", "<eos>")).collect()}
    assert v2["<pad>"]["id"] == 0 and v2["<eos>"]["id"] == 1
    assert v2["<pad>"]["freq"] is None
    assert min(r["id"] for s, r in v2.items() if s not in ("<pad>", "<eos>")) == 2


def test_encode_ids_roundtrip_and_unk(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    from argostats_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    _, words = bpe_train(docs, 10)
    vocab = bpe_vocab(words)
    inv = {r["id"]: r["subword"] for r in vocab.collect()}
    rows = bpe_encode_ids(docs, words, vocab).collect()
    for r in rows:
        assert [inv[i] for i in r["ids"]] == list(r["subwords"])
    # OOV characters at inference map to unk_id
    new = spark.createDataFrame([(9, "zzq")], "doc_id bigint, text string")
    r = bpe_encode_ids(new, words, vocab, unk_id=-1).collect()[0]
    assert not r["in_vocab"]
    assert list(r["subwords"]) == ["z", "z", "q", "</w>"]
    assert r["ids"].count(-1) >= 1  # 'z'/'q' never occur in the corpus
    assert inv[r["ids"][-1]] == "</w>"


def test_encode_ids_partition_independent(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    from argostats_spark.operators.bpe import bpe_encode_ids

    _, words = bpe_train(docs, 8)

    def run(d):
        return sorted(
            (r["doc_id"], r["pos"], tuple(r["ids"]))
            for r in bpe_encode_ids(d, words).collect()
        )

    assert run(docs.repartition(7)) == run(docs.coalesce(1))


def test_train_local_equals_distributed(spark, sf_dir):
    """bpe_train_local (driver-side heap loop) must produce the EXACT
    (merges, words) contract of bpe_train — on the toy corpus AND on
    real testdata documents, including the early-stop behavior."""
    from argostats_spark.operators.bpe import bpe_train_local

    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    m_d, w_d = bpe_train(docs, 12)
    m_l, w_l = bpe_train_local(docs, 12)
    assert m_l == m_d
    got_d = {r["word"]: (r["n"], list(r["symbols"])) for r in w_d.collect()}
    got_l = {r["word"]: (r["n"], list(r["symbols"])) for r in w_l.collect()}
    assert got_l == got_d

    # real corpus slice, more merge rounds than the demo uses
    real = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 150
    )
    m_d, w_d = bpe_train(real, 30)
    m_l, w_l = bpe_train_local(real, 30)
    assert m_l == m_d
    assert {r["word"]: list(r["symbols"]) for r in w_l.collect()} == {
        r["word"]: list(r["symbols"]) for r in w_d.collect()
    }


def test_train_local_truncation_and_early_stop(spark):
    """max_words keeps the most frequent words (word-asc ties) before
    training; min_pair_count stops the local loop exactly like the
    distributed one."""
    from argostats_spark.operators.bpe import bpe_train_local

    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    # min_pair_count high enough that training stops immediately
    m, w = bpe_train_local(docs, 10, min_pair_count=10**6)
    assert m == []
    # truncation to 2 words trains on {newest, low} only (top counts)
    m2, w2 = bpe_train_local(docs, 4, max_words=2)
    kept = {r["word"] for r in w2.collect()}
    assert len(kept) == 2
    sub = docs.sparkSession.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(
            [("newest", 7), ("low", 6)])],
        "doc_id bigint, text string",
    )
    m_ref, _ = bpe_train(sub, 4)
    assert [ab[:2] for ab in m2] == [ab[:2] for ab in m_ref]


def test_vocab_specials_overlap_guard(spark):
    """Round-6 advice: a LEARNED subword equal to a special string must
    not produce a duplicate vocab key (which would blow up
    bpe_encode_ids' create_map under DUPLICATED_MAP_KEY). The special
    owns the string; the learned subword is excluded from the ranking."""
    from argostats_spark.operators.bpe import bpe_encode_ids, bpe_train, bpe_vocab

    # corpus where the literal token '<pad>' is frequent enough that
    # its full form '<pad></w>' is learned as a subword
    docs = spark.createDataFrame(
        [(0, "<pad> <pad> <pad> <pad> <pad> <pad>"), (1, "x <pad> y")],
        "doc_id bigint, text string",
    )
    merges, words = bpe_train(docs, 16)
    learned = {r["subword"] for r in bpe_vocab(words).collect()}
    clash = "<pad></w>" if "<pad></w>" in learned else None
    assert clash, "corpus failed to learn the clashing subword"

    vocab = bpe_vocab(words, specials=(clash, "<eos>"))
    rows = vocab.collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))
    subs = [r["subword"] for r in rows]
    assert len(subs) == len(set(subs)), "duplicate vocab key survived"
    by_sub = {r["subword"]: r for r in rows}
    assert by_sub[clash]["id"] == 0 and by_sub[clash]["freq"] is None

    # and the id-encode path runs clean end-to-end
    out = bpe_encode_ids(docs, words, vocab=vocab)
    assert out.count() > 0
