"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-construction step of a training-data pipeline, Spark-first.

The scale trick (same as every serious BPE implementation): training
never iterates over the corpus. One corpus pass aggregates to the
WORD-FREQUENCY table (distinct word → count — vocabulary-sized, orders
of magnitude smaller than 100 TB of text), and every merge round runs
against that table only:

- pair counting is an explode over adjacent symbol pairs weighted by
  word count → groupBy(pair) → one aggregate whose output is bounded
  by the live pair vocabulary (map-side combine does the heavy
  lifting);
- the argmax pair comes back via orderBy(...).limit(1) — TakeOrdered,
  ONE ROW of driver traffic per round (ties broken (count desc, a asc,
  b asc) so training is deterministic on any partitioning);
- the merge is applied to the symbol arrays with a left-fold
  (F.aggregate): scan symbols left→right, replacing the last emitted
  symbol when (last, current) == (a, b) — exactly BPE's leftmost
  non-overlapping merge semantics (a merged symbol a‖b can never equal
  a, so a fresh merge can't cascade within the same round);
- the words table is localCheckpointed every round: k rounds would
  otherwise stack k interpreted fold expressions into one plan.

Encoding is a JOIN, not a re-run of the merges: the trained words
table IS the word → subwords map, so encoding a corpus is explode →
equi-join on the word (broadcast while the vocab fits; the join key is
the word, so the identical plan degrades to a shuffle join at
web-corpus vocabularies). Out-of-vocabulary words (new corpora) fall
back to character symbols + '</w>' — the correct BPE-zero encoding —
flagged ``in_vocab = false`` so callers can measure OOV drift.

Per the Sennrich formulation, every word carries a terminal '</w>'
symbol so subwords learned at word ends differ from word-internal
ones.

Driver traffic: k merge rows + one scalar per round. Nothing
driver-side scales with corpus or vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = [
    "word_freqs",
    "apply_merge",
    "bpe_train",
    "bpe_train_local",
    "bpe_encode",
    "bpe_vocab",
    "bpe_encode_ids",
]

EOW = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The training input: (word, n) over lowercased whitespace tokens.
    THE one corpus pass of BPE training — everything after runs on this
    vocabulary-sized table."""
    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols + the '</w>' end-of-word marker."""
    chars = F.split(word, "")
    return F.concat(
        F.filter(chars, lambda c: c != F.lit("")), F.array(F.lit(EOW))
    )


def apply_merge(symbols: Column, a: str, b: str) -> Column:
    """One BPE merge as a left fold: emit symbols left→right, replacing
    the just-emitted ``a`` with ``a‖b`` whenever ``b`` follows it —
    leftmost non-overlapping, the exact Sennrich semantics ([a,a,a]
    with merge (a,a) → [aa, a], never [a, aa])."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges; returns (merges, words) where
    merges = [(a, b, weighted_count), ...] in learned order and words =
    the trained (word, n, symbols) table — the word → subwords encoding
    map that :func:`bpe_encode` joins against.

    Stops early when no pair reaches ``min_pair_count``. Deterministic:
    the argmax tiebreak is (count desc, a asc, b asc), and pair counts
    are integer sums — no float order sensitivity anywhere."""
    words = (
        word_freqs(docs, text_col)
        .select("word", "n", _initial_symbols(F.col("word")).alias("symbols"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = words.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(F.col("symbols"), F.lit(1), F.size("symbols") - 1),
                    F.slice(F.col("symbols"), F.lit(2), F.size("symbols") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["p"]["a"], best[0]["p"]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        words = words.withColumn(
            "symbols", apply_merge(F.col("symbols"), a, b)
        ).localCheckpoint(eager=True)
    return merges, words


def bpe_encode(
    docs: DataFrame,
    words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode a corpus against a trained words table: (id, pos, word,
    subwords, n_subwords, in_vocab), one row per corpus token, ``pos``
    the 0-based token position. Explode (row-local) + one equi-join on
    the word; OOV words get the character-level BPE-zero encoding and
    ``in_vocab = false``."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "word"),
    )
    vocab = words.select("word", F.col("symbols").alias("subwords"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    enc = toks.join(vocab, "word", "left")
    subwords = F.coalesce(F.col("subwords"), _initial_symbols(F.col("word")))
    return enc.select(
        id_col,
        "pos",
        "word",
        subwords.alias("subwords"),
        F.size(subwords).cast("long").alias("n_subwords"),
        F.col("subwords").isNotNull().alias("in_vocab"),
    )


def bpe_vocab(words: DataFrame, specials: tuple[str, ...] = ()) -> DataFrame:
    """The id table: (subword, id, freq) with dense ids from 0 assigned
    by (corpus frequency desc, subword asc) — deterministic on any
    partitioning. Optional ``specials`` (e.g. '<pad>', '<eos>') take
    the lowest ids, in the order given, with freq NULL. A LEARNED
    subword equal to a special string (web text contains literal
    '<pad>'/'<eos>' tokens) is excluded from the base ranking — the
    special owns the string; without this the duplicate key would blow
    up bpe_encode_ids' create_map at runtime (DUPLICATED_MAP_KEY under
    Spark's default EXCEPTION policy).

    The subword type count is bounded by |alphabet| + 1 + num_merges
    (every merge mints exactly one new symbol), so this table is tiny
    by construction — the single-partition ranking window is safe at
    any corpus size and the table always broadcasts."""
    from pyspark.sql import Window as W

    freqs = (
        words.select(F.explode("symbols").alias("subword"), F.col("n"))
        .groupBy("subword")
        .agg(F.sum("n").cast("long").alias("freq"))
    )
    rank = F.row_number().over(
        W.orderBy(F.col("freq").desc(), F.col("subword").asc())
    )
    if specials:
        freqs = freqs.where(~F.col("subword").isin(*specials))
    base = freqs.select(
        "subword", (rank + F.lit(len(specials) - 1)).cast("long").alias("id"), "freq"
    )
    if not specials:
        return base
    spark = words.sparkSession
    sp = spark.createDataFrame(
        [(s, i, None) for i, s in enumerate(specials)],
        "subword string, id long, freq long",
    )
    return sp.unionByName(base)


def bpe_encode_ids(
    docs: DataFrame,
    words: DataFrame,
    vocab: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """Token-level id encoding: :func:`bpe_encode` plus an ``ids``
    column (array<long>) mapping each subword through the vocab — the
    integer artifact a training pipeline actually writes. The vocab is
    model-sized (see :func:`bpe_vocab`), so it rides as a map LITERAL
    and the id lookup is row-local — no extra join, no shuffle, and
    the same expression works on a readStream. Subwords outside the
    vocab (OOV characters at inference time) map to ``unk_id``."""
    vocab = bpe_vocab(words) if vocab is None else vocab
    pairs: list = []
    for r in vocab.collect():
        pairs.extend([F.lit(r["subword"]), F.lit(int(r["id"]))])
    id_map = F.create_map(*pairs) if pairs else F.create_map()
    enc = bpe_encode(docs, words, text_col=text_col, id_col=id_col)
    ids = F.transform(
        F.col("subwords"),
        lambda s: F.coalesce(F.element_at(id_map, s), F.lit(unk_id)).cast("long"),
    )
    return enc.withColumn("ids", ids)


def bpe_train_local(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_words: int | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Driver-side fast path for BPE training — same contract, same
    answer as :func:`bpe_train` (pinned by differential test), without
    the one-Spark-job-per-merge-round wall.

    Why it exists: :func:`bpe_train` runs ONE distributed job per merge
    round. Driver *traffic* per round is a single argmax row, but round
    *count* is the latency wall — a production tokenizer is 32k-100k
    merges, i.e. 32k-100k sequential vocabulary-table jobs (~1 s of
    scheduler latency each → days). The standard practice (what
    sentencepiece / HF tokenizers do): ONE corpus pass to the
    word-frequency table — vocabulary-sized, ~100M rows on a raw web
    crawl, a few million after frequency truncation — then train on
    the collected table with incremental pair statistics. Minutes, not
    days; the corpus is still read exactly once, distributed.

    Exact semantics of the distributed loop are preserved:

    - pair counts sum every ADJACENT occurrence weighted by word count
      (overlaps included: [a,a,a] counts (a,a) twice) — matching the
      zip-slice explode;
    - argmax tiebreak (count desc, a asc, b asc);
    - merges applied leftmost-non-overlapping (the fold semantics);
    - stop when the best pair's count < ``min_pair_count``.

    Per-round work is a lazy-deletion heap pop plus a re-count of only
    the words that CONTAIN the merged pair (via a pair → word-index
    inverted index), the Sennrich incremental-statistics scheme —
    O(affected words), not O(vocabulary), per round.

    ``max_words``: optional frequency truncation (keep the most
    frequent N words, ties broken by word asc) for web-scale
    vocabularies that shouldn't be collected whole. Truncation makes
    the result approximate vs the full-table loop — leave None for the
    exact differential contract.

    Returns (merges, words) with ``words`` re-published as a Spark
    DataFrame (word, n, symbols) so :func:`bpe_encode` /
    :func:`bpe_vocab` compose identically with either trainer.

    Measured crossover (SCALE.md): distributed ~1 s/round flat;
    driver-side ~ms/round after the one collect — at 24 demo merges
    both are seconds, at 32k merges only this path is viable.
    """
    import heapq
    from collections import Counter, defaultdict

    wf = word_freqs(docs, text_col)
    if max_words is not None:
        wf = wf.orderBy(F.col("n").desc(), F.col("word").asc()).limit(max_words)
    rows = wf.collect()  # vocabulary-sized by construction

    words = [list(r["word"]) + [EOW] for r in rows]
    counts = [int(r["n"]) for r in rows]
    names = [r["word"] for r in rows]

    def word_pairs(syms: list[str]) -> Counter:
        c: Counter = Counter()
        for x, y in zip(syms, syms[1:]):
            c[(x, y)] += 1
        return c

    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for p, k in word_pairs(syms).items():
            pair_counts[p] += k * counts[i]
            where[p].add(i)

    # lazy-deletion heap: entries are (-count, a, b); an entry is live
    # only if it matches the current pair_counts value at pop time
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        c = pair_counts.get(p, 0)
        if c > 0:
            heapq.heappush(heap, (-c, p[0], p[1]))

    def apply_merge_local(syms: list[str], a: str, b: str) -> list[str]:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, a, b = heap[0]
            if pair_counts.get((a, b), 0) == -negc:
                best = (a, b, -negc)
                break
            heapq.heappop(heap)  # stale entry
        if best is None or best[2] < min_pair_count:
            break
        a, b, cnt = best
        merges.append((a, b, cnt))
        touched: set[tuple[str, str]] = set()
        for i in sorted(where.get((a, b), ())):
            before = word_pairs(words[i])
            words[i] = apply_merge_local(words[i], a, b)
            after = word_pairs(words[i])
            for p in set(before) | set(after):
                delta = (after.get(p, 0) - before.get(p, 0)) * counts[i]
                if delta:
                    pair_counts[p] += delta
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                    touched.add(p)
                if after.get(p, 0) > 0:
                    where[p].add(i)
                elif p in where:
                    where[p].discard(i)
        where.pop((a, b), None)
        for p in touched:
            push(p)

    spark = docs.sparkSession
    out = spark.createDataFrame(
        [(names[i], counts[i], words[i]) for i in range(len(words))],
        "word string, n long, symbols array<string>",
    )
    return merges, out
