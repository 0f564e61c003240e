"""Distributed unigram-LM tokenizer training + encoding (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates" — the SentencePiece unigram model),
Spark-first. The second of the two standard subword constructions;
:mod:`bpe` is the other.

Same scale architecture as BPE training (bpe.py): ONE corpus pass
aggregates to the word-frequency table (distinct word → count,
vocabulary-sized), and everything else — seeding, EM, pruning —
runs against that table:

- the SEED vocabulary is a relational substring census: every
  substring (length ≤ ``max_piece_len``) of every distinct word,
  occurrence-weighted by word frequency (row-local position explode,
  one groupBy(substring) aggregate, TakeOrdered top-``seed_size``),
  plus ALL single characters (segmentation closure);
- each EM round's E-step runs Viterbi segmentation per DISTINCT WORD
  in an Arrow-batched pandas UDF over the word table (irregular DP —
  the one place Python is warranted, and it touches the vocabulary,
  never the corpus); the M-step re-estimates piece probabilities from
  INTEGER expected counts (word_freq × piece multiplicity — exact
  sums, so training is partition-independent by construction);
- pruning keeps the top ``vocab_size`` pieces by (count desc, piece
  asc), always retaining single characters.

Honest divergences from SentencePiece (documented, deliberate): hard
(Viterbi) EM instead of forward-backward marginals, and count-based
pruning instead of likelihood-loss pruning — the standard
reimplementation simplifications; the Viterbi objective is monotone
non-decreasing across rounds (pinned by test) and every word stays
exactly segmentable (single-char closure).

Encoding mirrors bpe_encode: Viterbi runs once per DISTINCT word
(vocab-sized pandas UDF), the corpus side is explode + one equi-join;
:func:`unigram_encode_rows` is the row-local/stream-safe variant (model
rides in the UDF closure — score-at-ingest, no join, no state).

Driver traffic: the model itself (vocab-sized, KBs-to-MBs — the
langid/DSIR/classifier convention) once per round. Nothing driver-side
scales with the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .bpe import word_freqs

__all__ = [
    "substring_seed",
    "viterbi_segment",
    "unigram_train",
    "unigram_encode",
    "unigram_encode_rows",
    "unigram_vocab",
    "unigram_encode_ids",
]

# logp assigned to an out-of-alphabet character at inference time: far
# below any trained piece so it is only used when nothing else can
# cover the position
_UNK_PENALTY = -100.0


def substring_seed(
    words: DataFrame, max_piece_len: int = 8, seed_size: int = 4000
) -> list[tuple[str, int]]:
    """Top-``seed_size`` substrings of the word table by occurrence-
    weighted count (+ every single character, always) — the unigram
    seed vocabulary. Deterministic: integer counts, (count desc, piece
    asc) tiebreak, TakeOrdered (never a global sort)."""
    chars = F.filter(F.split("word", ""), lambda c: c != F.lit(""))
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(chars)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.size(chars) - i + 1),
                ),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    counted = (
        words.select("n", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
        # two actions read this frame (top-N + singles); without the
        # checkpoint the whole substring census re-runs for the second
        .localCheckpoint(eager=True)
    )
    top = counted.orderBy(
        F.col("cnt").desc(), F.col("piece").asc()
    ).limit(seed_size).collect()
    singles = {
        r["piece"]: int(r["cnt"])
        for r in counted.filter(F.length("piece") == 1).collect()
    }
    out = {r["piece"]: int(r["cnt"]) for r in top}
    out.update({p: c for p, c in singles.items() if p not in out})
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> tuple[list[str], bool]:
    """Best segmentation of ``word`` under piece log-probs: maximize
    Σ logp(piece); exact-float ties prefer the LONGER piece at each
    boundary (deterministic — same floats on every engine because the
    model is identical and per-word DP is serial Python). Characters
    absent from the model cover themselves at ``_UNK_PENALTY``;
    returns (pieces, in_vocab) with in_vocab=False when any piece fell
    back. Shared verbatim by the distributed E-step/encoder UDFs and
    the local mirror — their exact equality is structural."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        # longest candidate first so equal scores keep the longer piece
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = _UNK_PENALTY
                else:
                    continue
            score = best[j] + lp
            if score > best[i]:
                best[i] = score
                back[i] = (j, piece)
    pieces: list[str] = []
    i = n
    while i > 0:
        j, piece = back[i]  # type: ignore[misc]
        pieces.append(piece)
        i = j
    pieces.reverse()
    in_vocab = all(p in logp for p in pieces)
    return pieces, in_vocab


def _segment_words_udf(logp: dict[str, float], max_piece_len: int):
    """Arrow-batched (word) -> struct(pieces, in_vocab) UDF with the
    model in the closure — vocabulary-sized, the langid/DSIR broadcast
    convention."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _seg(words):
        rows = [viterbi_segment(w, logp, max_piece_len) for w in words]
        return pd.DataFrame(
            {"pieces": [r[0] for r in rows], "in_vocab": [r[1] for r in rows]}
        )

    # annotations attached as objects (the langid.py convention —
    # string hints can't resolve a function-local pandas import)
    _seg.__annotations__ = {"words": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_seg, "struct<pieces: array<string>, in_vocab: boolean>")


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int = 4000,
    em_rounds: int = 3,
) -> list[tuple[str, float]]:
    """Learn a unigram tokenizer model: returns [(piece, logp), ...]
    sorted (logp desc, piece asc). ``vocab_size`` bounds the final
    piece count EXACTLY — |model| = min-bounded at the alphabet size
    (single characters always survive for closure) and otherwise
    == min(vocab_size, |alphabet| + |candidate multis|).
    Deterministic and partition-independent: integer
    expected counts, fixed tiebreaks, per-word serial Viterbi."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if em_rounds < 1:
        raise ValueError(f"em_rounds must be >= 1, got {em_rounds}")
    words = word_freqs(docs, text_col).localCheckpoint(eager=True)
    seed = substring_seed(words, max_piece_len, seed_size)
    if not seed:
        raise ValueError(
            "unigram_train: empty corpus (no tokens) — nothing to seed "
            "the piece vocabulary from."
        )
    alphabet = {p for p, _ in seed if len(p) == 1}
    total = sum(c for _, c in seed)
    logp = {p: math.log(c / total) for p, c in seed}

    for _ in range(em_rounds):
        seg = _segment_words_udf(logp, max_piece_len)
        counts = (
            words.select(
                "n", F.explode(seg(F.col("word"))["pieces"]).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("n").alias("cnt"))
            .collect()
        )
        cnts = {r["piece"]: int(r["cnt"]) for r in counts}
        # M-step over the pieces the E-step actually used; unused seed
        # pieces drop out (expected count zero) — EXCEPT single chars,
        # which get a count-1 floor so segmentation closure survives
        # (SentencePiece's required-character set; a char fully covered
        # by longer pieces must still be encodable on unseen words)
        for ch in alphabet:
            cnts.setdefault(ch, 1)
        tot = sum(cnts.values())
        logp = {p: math.log(c / tot) for p, c in cnts.items()}

    # prune to vocab_size by (count desc, piece asc): single chars are
    # mandatory (segmentation closure), so their slots are reserved
    # FIRST and the remaining vocab_size - |alphabet| slots go to the
    # best-ranked multi-char pieces — the final piece count is exactly
    # bounded by vocab_size (SentencePiece keeps the size exact; an
    # earlier version appended out-of-top singles AFTER the top-N cut,
    # overshooting the bound — ADVICE r8). Only when the alphabet alone
    # exceeds vocab_size does closure win over the bound (the model is
    # then all singles, |alphabet| pieces — SentencePiece errors here;
    # we keep encodability and document the floor).
    final_counts = cnts
    singles = {p: c for p, c in final_counts.items() if len(p) == 1}
    multi_ranked = sorted(
        ((p, c) for p, c in final_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    kept = dict(singles)
    kept.update(dict(multi_ranked[: max(vocab_size - len(singles), 0)]))
    tot = sum(kept.values())
    model = {p: math.log(c / tot) for p, c in kept.items()}
    return sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_encode(
    docs: DataFrame,
    model: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode a corpus: (id, pos, word, pieces, n_pieces, in_vocab),
    one row per corpus token. Viterbi runs ONCE per DISTINCT word (a
    vocabulary-sized pandas-UDF pass, the bpe_encode shape); the corpus
    side is a row-local explode + one equi-join on the word."""
    logp = dict(model)
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "word"),
    )
    seg = _segment_words_udf(logp, max_piece_len)
    vocab = (
        toks.select("word")
        .distinct()
        .select("word", seg(F.col("word")).alias("s"))
        .select("word", F.col("s.pieces").alias("pieces"),
                F.col("s.in_vocab").alias("in_vocab"))
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    return toks.join(vocab, "word").select(
        id_col,
        "pos",
        "word",
        "pieces",
        F.size("pieces").cast("long").alias("n_pieces"),
        "in_vocab",
    )


def unigram_encode_rows(
    df: DataFrame,
    model: list[tuple[str, float]],
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Row-local / stream-safe encoding: appends ``pieces``
    (array<string>, the concatenated per-word Viterbi segmentations)
    and ``n_pieces`` — zero joins, zero state, the model in the UDF
    closure, so the same call encodes batch frames and readStreams
    (score-at-ingest). Exactly equal to flattening
    :func:`unigram_encode`'s per-token pieces in pos order (pinned)."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    logp = dict(model)
    # ASCII \s+, mirroring functions.text.tokens()' Java regex exactly
    # (Python re's \s is unicode-wide by default — re.ASCII pins it).
    # NO Python .strip(): str.strip() removes UNICODE whitespace (NBSP,
    # ideographic space) that Spark's trim (space-only) + ASCII split
    # keep attached to tokens — splitting unstripped text and dropping
    # empty fragments is the exact mirror.
    ws = re.compile(r"\s+", re.ASCII)

    def _enc(texts):
        def run(t):
            if t is None:
                return None
            out: list[str] = []
            for w in ws.split(t.lower()):
                if not w:
                    continue
                out.extend(viterbi_segment(w, logp, max_piece_len)[0])
            return out

        return texts.map(run)

    _enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    enc = pandas_udf(_enc, "array<string>")

    return df.withColumn("pieces", enc(F.col(text_col))).withColumn(
        "n_pieces", F.size("pieces").cast("long")
    )


def unigram_vocab(
    model: list[tuple[str, float]], specials: tuple[str, ...] = ()
) -> list[tuple[str, int, float | None]]:
    """The id table: [(piece, id, logp)] with dense ids from 0 assigned
    by model order (logp desc, piece asc — already how
    :func:`unigram_train` returns it), ``specials`` (e.g. '<pad>',
    '<eos>') taking the lowest ids with logp None. A learned piece
    equal to a special string is excluded from the base ranking — the
    special owns the string (the bpe_vocab duplicate-key rule). The
    table is vocab-sized by construction: plain driver data, no Spark
    job."""
    sp = set(specials)
    out: list[tuple[str, int, float | None]] = [
        (s, i, None) for i, s in enumerate(specials)
    ]
    nid = len(specials)
    for piece, lp in model:
        if piece in sp:
            continue
        out.append((piece, nid, lp))
        nid += 1
    return out


def unigram_encode_ids(
    df: DataFrame,
    model: list[tuple[str, float]],
    vocab: list[tuple[str, int, float | None]] | None = None,
    text_col: str = "text",
    max_piece_len: int = 8,
    unk_id: int = -1,
) -> DataFrame:
    """:func:`unigram_encode_rows` plus an ``ids`` column (array<long>)
    mapping each piece through the vocab — the integer artifact a
    training pipeline writes. The vocab rides as a map LITERAL
    (model-sized), so the lookup is row-local, joins nothing, and the
    same call encodes readStreams. Pieces outside the vocab
    (out-of-alphabet characters at inference time) map to ``unk_id``."""
    vocab = unigram_vocab(model) if vocab is None else vocab
    pairs: list = []
    for piece, pid, _ in vocab:
        pairs.extend([F.lit(piece), F.lit(int(pid))])
    id_map = F.create_map(*pairs) if pairs else F.create_map()
    enc = unigram_encode_rows(df, model, text_col, max_piece_len)
    ids = F.transform(
        F.col("pieces"),
        lambda p: F.coalesce(F.element_at(id_map, p), F.lit(unk_id)).cast("long"),
    )
    return enc.withColumn("ids", ids)
