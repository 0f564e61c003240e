#!/usr/bin/env python
"""BPE training scale probe: the marquee claim is that training cost is
a function of the DISTINCT-WORD table, not the corpus — verify it by
holding the corpus row count fixed and sweeping the vocabulary size,
then holding the vocabulary fixed and sweeping the corpus 10×.

Corpus is generated executor-side (spark.range → hash-derived words, no
driver materialization). Words are letter-quintuple strings so the
symbol alphabet is realistic (26 letters + </w>), word length 5-15
chars — enough pair structure for 12 meaningful merges.

Usage: python scripts/bench_bpe_scale.py
Writes measurements to stdout; SCALE.md records the numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from argostats_spark.operators.bpe import bpe_train  # noqa: E402
from argostats_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n_docs: int, vocab: int, wpd: int = 40):
    """n_docs rows, wpd words each, drawn from a ``vocab``-sized set of
    letter-string words (deterministic, executor-side)."""
    word = (
        # word id in [0, vocab) per slot; LENGTH and letters both derive
        # from the word id so each id is exactly one string
        "transform(sequence(1, {wpd}), i -> "
        " array_join(transform("
        "   sequence(0, 4 + pmod(xxhash64(pmod(xxhash64(id, i), {vocab}), 7), 11)), "
        "   j -> char(97 + pmod(xxhash64(pmod(xxhash64(id, i), {vocab}), j), 26))), ''))"
    ).format(wpd=wpd, vocab=vocab)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"array_join({word}, ' ')").alias("text"),
    )


def probe(spark, n_docs: int, vocab: int, merges: int = 12) -> dict:
    docs = synth_docs(spark, n_docs, vocab).localCheckpoint(eager=True)
    # separate the ONE corpus pass (word_freqs + symbol init + eager
    # checkpoint = num_merges=0) from the per-round vocabulary-table
    # cost; min-of-2 per measurement to shave scheduler jitter
    corpus_pass = round_cost = 1e9
    nwords, nmerges = 0, 0
    for _ in range(2):
        t0 = time.time()
        _, w0 = bpe_train(docs, 0)
        this_pass = time.time() - t0
        corpus_pass = min(corpus_pass, this_pass)
        nwords = w0.count()
        t0 = time.time()
        learned, _ = bpe_train(docs, merges)
        nmerges = len(learned)
        total = time.time() - t0
        # subtract the SAME iteration's corpus pass so a cold first
        # pass can't push the round cost negative
        round_cost = min(round_cost, (total - this_pass) / max(nmerges, 1))
    docs.unpersist()
    return {
        "n_docs": n_docs,
        "vocab_req": vocab,
        "distinct_words": nwords,
        "merges": nmerges,
        "corpus_pass_s": round(corpus_pass, 2),
        "per_round_s": round(round_cost, 3),
    }


def probe_unigram(spark, n_docs: int, vocab: int, em_rounds: int = 2) -> dict:
    """Unigram-trainer sibling of :func:`probe`: the same marquee claim
    (training cost tracks the DISTINCT-WORD table, not the corpus) for
    the Viterbi-EM loop — the E-step pandas UDF runs once per distinct
    word per round."""
    from argostats_spark.operators.bpe import word_freqs
    from argostats_spark.operators.unigram import unigram_train

    docs = synth_docs(spark, n_docs, vocab).localCheckpoint(eager=True)
    nwords = word_freqs(docs).count()
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        model = unigram_train(
            docs, vocab_size=4000, em_rounds=em_rounds, seed_size=8000
        )
        best = min(best, time.time() - t0)
    docs.unpersist()
    return {
        "n_docs": n_docs,
        "distinct_words": nwords,
        "model_pieces": len(model),
        "em_rounds": em_rounds,
        "total_s": round(best, 2),
        "words_per_round_per_s": int(nwords * em_rounds / best),
    }


def main():
    spark = get_spark(app_name="bpe_scale_probe")
    if len(sys.argv) > 1 and sys.argv[1] == "unigram":
        print("== unigram corpus sweep (vocab fixed at 10k words) ==")
        for n in (50_000, 500_000):
            print(probe_unigram(spark, n, 10_000))
        spark.stop()
        return
    print("== vocab sweep (corpus fixed at 50k docs / 2M tokens) ==")
    for vocab in (1_000, 10_000, 100_000):
        print(probe(spark, 50_000, vocab))
    print("== corpus sweep (vocab fixed at 10k words) ==")
    for n in (50_000, 500_000):
        print(probe(spark, n, 10_000))
    spark.stop()


if __name__ == "__main__":
    main()
