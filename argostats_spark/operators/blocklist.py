"""Multi-phrase blocklist matching (the C4 "bad words" filter shape):
flag/count occurrences of ANY of a large phrase list in each document,
matching on token boundaries (a phrase is a token sequence; "ass"
must not hit "class" — the word-boundary rule the C4 cleanup uses).

Two paths, equal by test (the dsir_scores / dsir_score_rows duality):

- :func:`blocklist_hits` — Catalyst-native: explode each document's
  token n-grams AT THE PHRASE LENGTHS PRESENT IN THE LIST ONLY, then
  one broadcast join against the phrase table and one per-doc count
  aggregate. Everything JVM-side; the phrase table is list-sized
  (KBs–MBs, broadcast); the exploded stream is Σ_ℓ (tokens−ℓ+1) rows
  over the distinct phrase lengths ℓ — a few corpus passes' worth of
  rows for typical 1-3-token phrase lists. The batch/warehouse path.

- :func:`blocklist_flags_rows` — row-local: a driver-built
  Aho-Corasick automaton over token sequences rides into an
  Arrow-batched pandas UDF (pickled once per executor); each document
  is scanned ONCE regardless of phrase count or lengths — O(tokens)
  per doc, zero shuffle, zero state, stream-safe (score-at-ingest).
  The path for readStreams and very-many-length phrase lists.

Matching semantics (both paths, pinned by differential test):
case-insensitive, whitespace tokenization (functions.text.tokens),
counts EVERY occurrence including overlapping ones of different
phrases; a phrase that is a prefix of another counts independently
(Aho-Corasick output links == the n-gram join's independent lengths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["blocklist_hits", "blocklist_flags_rows"]


_ASCII_WS = __import__("re").compile(r"[ \t\n\x0b\f\r]+")


def _norm_phrases(phrases: list[str]) -> list[tuple[str, ...]]:
    # ASCII-whitespace split, matching the engine tokenizer (Java \s+)
    out = []
    for p in phrases:
        tk = tuple(t for t in _ASCII_WS.split(p.lower()) if t)
        if tk:
            out.append(tk)
    if not out:
        raise ValueError("blocklist: no non-empty phrases")
    return sorted(set(out))


def blocklist_hits(
    docs: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count: bool = False,
) -> DataFrame:
    """Per-document blocklist census via the broadcast n-gram join:
    (id_col, n_hits, n_distinct_phrases, blocked[, n_tokens with
    ``token_count``]). Documents with zero hits are present with zeros
    (left join against the corpus), so the output is a total function
    of the corpus — a gate can anti-join or filter on ``blocked``
    directly. ``token_count`` rides the token total out of the SAME
    tokenize pass the grams use — callers needing a hit ratio don't
    re-tokenize the corpus (review finding r7b)."""
    plist = _norm_phrases(phrases)
    lengths = sorted({len(p) for p in plist})
    spark = docs.sparkSession
    ptable = spark.createDataFrame(
        [(" ".join(p), len(p)) for p in plist], "phrase string, plen int"
    )

    tk = docs.select(id_col, tokens(F.lower(F.col(text_col))).alias("__tk"))
    streams = []
    for ln in lengths:
        if ln == 1:
            g = tk.select(id_col, F.explode("__tk").alias("gram"))
        else:
            zipped = F.arrays_zip(
                *[
                    F.slice(F.col("__tk"), i + 1, F.size("__tk")).alias(f"t{i}")
                    for i in range(ln)
                ]
            )
            g = (
                tk.select(id_col, F.explode(zipped).alias("z"))
                .filter(F.col(f"z.t{ln-1}").isNotNull())
                .select(
                    id_col,
                    F.concat_ws(
                        " ", *[F.col(f"z.t{i}") for i in range(ln)]
                    ).alias("gram"),
                )
            )
        streams.append(g.withColumn("plen", F.lit(ln)))
    grams = streams[0]
    for st in streams[1:]:
        grams = grams.unionByName(st)

    hits = (
        grams.join(
            F.broadcast(ptable),
            (F.col("gram") == F.col("phrase")) & (grams["plen"] == ptable["plen"]),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("phrase").alias("n_distinct_phrases"),
        )
    )
    base = tk.select(
        id_col, F.size("__tk").cast("long").alias("n_tokens")
    )
    out = base.join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce("n_distinct_phrases", F.lit(0)).cast("long").alias(
            "n_distinct_phrases"
        ),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("blocked"),
        "n_tokens",
    )
    return out if token_count else out.drop("n_tokens")


def _build_aho(plist: list[tuple[str, ...]]):
    """Token-level Aho-Corasick: nodes as dicts, BFS failure links,
    output counts per node. Returned as plain lists/dicts (cheap to
    pickle into the UDF closure)."""
    goto: list[dict[str, int]] = [{}]
    out: list[int] = [0]  # phrases ENDING at this node
    for p in plist:
        s = 0
        for tok in p:
            nxt = goto[s].get(tok)
            if nxt is None:
                goto.append({})
                out.append(0)
                nxt = len(goto) - 1
                goto[s][tok] = nxt
            s = nxt
        out[s] += 1
    fail = [0] * len(goto)
    from collections import deque

    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for tok, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and tok not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(tok, 0) if goto[f].get(tok, 0) != t else 0
            out[t] += out[fail[t]]  # output links folded into counts
    return goto, fail, out


def blocklist_flags_rows(
    docs: DataFrame,
    phrases: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Row-local blocklist scan: adds ``n_hits`` (long) and ``blocked``
    (boolean) to every row, keeping the frame row-shaped — stateless,
    zero-shuffle, works identically on a readStream. One Aho-Corasick
    pass per document: O(tokens) regardless of phrase count. NULL text
    scans as zero tokens → 0 hits (not NULL: "nothing matched" is a
    real answer here, unlike a score)."""
    plist = _norm_phrases(phrases)
    goto, fail, out = _build_aho(plist)

    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # EXACTLY the join path's tokenizer: functions.text.tokens splits on
    # Java \s+ = ASCII [ \t\n\x0B\f\r] only. Python str.split()
    # breaks on ALL Unicode whitespace (NBSP etc.) and would make the
    # two paths disagree on web text (review finding r7).
    _ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def _scan_fn(texts):
        def one(t):
            if t is None:
                return 0
            s = 0
            hits = 0
            for tok in _ws.split(t.lower().strip(" \t\n\x0b\f\r")):
                if not tok:
                    continue
                while s and tok not in goto[s]:
                    s = fail[s]
                s = goto[s].get(tok, 0)
                hits += out[s]
            return hits

        return texts.apply(one)

    _scan_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    scan = pandas_udf(_scan_fn, "long")
    n_hits = scan(F.col(text_col))
    return docs.withColumn("n_hits", n_hits).withColumn(
        "blocked", F.col("n_hits") > 0
    )
