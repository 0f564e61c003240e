"""Product quantization (PQ) for compressed approximate nearest
neighbor search — Jégou et al. 2011 ("Product quantization for nearest
neighbor search", public), the standard memory-scale path when raw
float32 embeddings outgrow storage: a d-dim vector becomes m uint8-ish
codes (one per d/m-dim subvector), a 4d/m× compression at m sub-bytes,
and query scoring runs on per-query lookup tables without ever
decompressing the corpus.

Green-field scope beyond the reference (training-data pipeline family),
composing with the existing ANN operators: IVF prunes WHICH vectors to
score (similarity.py), PQ shrinks WHAT is stored and scored.

Scale shape (100 TB posture):
- training touches a bounded sample (codebooks are m·ksub·(d/m) floats
  — KBs); encoding is one corpus scan of pure column expressions (the
  per-block nearest-sub-centroid argmin fold — no Python, no shuffle);
- the encoded table is the ONLY thing a query scan reads: d/4 bytes →
  m bytes per vector (d=64, m=8 → 32×);
- ADC scoring: each query precomputes an m×ksub distance table
  (driver NumPy, m·ksub doubles), broadcast as a literal array; a
  corpus row's approximate distance is m element_at lookups summed in
  whole-stage codegen. Queries are a broadcast-sized set by assumption
  (same contract as cosine_topk).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pq_topk inlines one m*ksub-double distance table per query into a
# single select; past a few dozen queries the expression tree
# approaches codegen limits (the bm25_score_rows bound pattern).
PQ_TOPK_MAX_QUERIES = 64


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 2000,
    seed: int = 42,
    iters: int = 12,
) -> list[list[list[float]]]:
    """Train the m sub-codebooks (k-means with ksub centroids over each
    d/m-dim subvector block) on a bounded sample — returns
    ``codebooks[block][code] -> sub-centroid`` (m·ksub·(d/m) floats, a
    driver/broadcast-sized model like the IVF centroid table).

    The sample is content-ordered (hash of the vector), so the model is
    deterministic for a given corpus regardless of partitioning."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .withColumn("__h", F.md5(F.concat_ws(",", F.lit(seed), F.col("v").cast("string"))))
        .orderBy("__h")
        .limit(sample_rows)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype="f8")
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books: list[list[list[float]]] = []
    for b in range(m):
        Xb = X[:, b * dsub : (b + 1) * dsub]
        k = min(ksub, len(np.unique(Xb, axis=0)))
        # k-means++ init on the sample (driver NumPy — sample-sized)
        cents = [Xb[rng.integers(0, n)]]
        d2 = ((Xb - cents[0]) ** 2).sum(axis=1)
        while len(cents) < k:
            s = d2.sum()
            if s <= 0:
                break
            cents.append(Xb[int(rng.choice(n, p=d2 / s))])
            d2 = np.minimum(d2, ((Xb - cents[-1]) ** 2).sum(axis=1))
        C = np.array(cents)
        for _ in range(iters):
            assign = ((Xb[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            for j in range(len(C)):
                mask = assign == j
                if mask.any():
                    C[j] = Xb[mask].mean(axis=0)
        # pad degenerate blocks to ksub (duplicate centroids are inert)
        while len(C) < ksub:
            C = np.vstack([C, C[len(C) % max(len(cents), 1)]])
        books.append([c.tolist() for c in C])
    return books


def _block_code(vec_col: str, block: int, dsub: int, book: list[list[float]]):
    """Nearest sub-centroid index for one block — the shared flat
    argmin (similarity._argmin_flat: one transform over the literal
    ksub×dsub codebook + array_min + array_position) over the block's
    slice. The when-chain argmin used for small centroid lists would
    nest ksub aggregates per block and blow analysis/codegen time at
    m·ksub expression blocks (measured: the fold variant made a 500-row
    encode take minutes; this shape is interactive). First minimum —
    deterministic ties; one helper, one tie/NULL contract for the
    whole ANN family."""
    from .similarity import _argmin_flat

    sub = F.slice(F.col(vec_col), block * dsub + 1, dsub)
    return _argmin_flat(sub, book)


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Append the m-element code array (and optionally drop the raw
    vector downstream) — one scan, pure codegen, no shuffle. The caller
    persists the (id, pq_code) table; that table IS the compressed
    index."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = F.array(*[
        _block_code(vec_col, b, dsub, codebooks[b]) for b in range(m)
    ])
    return corpus.withColumn(code_col, codes)


def pq_decode_expr(code_col: str, codebooks: list[list[list[float]]]):
    """Reconstruction expression (concat of looked-up sub-centroids) —
    used by tests to bound quantization error; production scoring never
    decodes."""
    parts = []
    for b, book in enumerate(codebooks):
        flat = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]) for c in book
        ])
        parts.append(F.element_at(flat, F.element_at(F.col(code_col), b + 1) + 1))
    return F.flatten(F.array(*parts))


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    q_id_col: str = "qid",
    q_vec_col: str = "qv",
    exclude_self: bool = False,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: for each query, the exact
    squared distance from the query's subvectors to every sub-centroid
    is tabulated once (m·ksub doubles, driver NumPy over the
    broadcast-sized query set), then every corpus row scores with m
    element_at lookups + sum — whole-stage codegen over the compressed
    table, the raw vectors never read.

    Returns (qid, vec_id, adc_dist, rnk) with rnk 1..k per query by
    (distance, vec_id) — the deterministic tiebreak the rest of the ANN
    family uses. ``exclude_self`` drops corpus rows whose id equals the
    query id BEFORE ranking (for corpus-drawn query sets, matching the
    IVF/brute-force convention).

    Scale shape (round-11 restructure): ONE corpus scan for the whole
    query batch — every query's distance is a column of the same
    select, exploded to (qid, dist) rows. The previous form unioned
    one scan per query, which multiplied the ENCODE of a lazily-built
    code table by |queries| (measured at the 10x checkpoint: the pq
    limb ran 16.5 s where its siblings were ~1 s — 5 queries x a
    corpus re-encode each; the batched-BM25 lesson applied to ADC).
    |queries| is bounded (collected to the driver, distance tables
    inlined as literals) — a thousand-query sweep belongs in a
    broadcast-join variant, same remedy family as bm25_scores_queries."""
    from pyspark.sql import Window as W

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    books = np.array(codebooks, dtype="f8")          # m × ksub × dsub
    qrows = queries.select(q_id_col, q_vec_col).collect()
    if len(qrows) > PQ_TOPK_MAX_QUERIES:
        raise ValueError(
            f"pq_topk: {len(qrows)} queries exceeds "
            f"PQ_TOPK_MAX_QUERIES={PQ_TOPK_MAX_QUERIES} — each query "
            "inlines an m*ksub-literal distance table into one select; "
            "batch a large eval sweep through several calls or a "
            "broadcast-join variant"
        )
    if not qrows:  # empty query set degrades to an empty result, like
        from pyspark.sql.types import (  # the rest of the ANN family
            DoubleType, IntegerType, StructField, StructType,
        )

        schema = StructType([
            StructField("qid", queries.schema[q_id_col].dataType),
            StructField("vec_id", encoded.schema[id_col].dataType),
            StructField("adc_dist", DoubleType()),
            StructField("rnk", IntegerType()),
        ])
        return encoded.sparkSession.createDataFrame([], schema)

    entries = []
    for qr in qrows:
        qv = np.asarray(qr[q_vec_col], dtype="f8")
        # dt[b, j] = ||q_b - c_bj||²  (flattened row-major to m·ksub)
        dt = ((qv.reshape(m, 1, dsub) - books) ** 2).sum(axis=2).ravel()
        dt_arr = F.array(*[F.lit(float(x)) for x in dt])
        idx = F.sequence(F.lit(0), F.lit(m - 1))
        dist = F.aggregate(
            F.zip_with(
                idx, F.col(code_col),
                lambda b, c: F.element_at(dt_arr, b * ksub + c + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        entry = F.struct(
            F.lit(qr[q_id_col]).alias("qid"),
            F.round(dist, 6).alias("adc_dist"),
        )
        if exclude_self:
            # a NULL array element survives the explode as a NULL row;
            # the filter below drops it — the self row never ranks
            entry = F.when(
                F.col(id_col) != F.lit(qr[q_id_col]), entry
            )
        entries.append(entry)
    out = (
        encoded.select(
            F.col(id_col).alias("vec_id"),
            F.explode(F.array(*entries)).alias("__q"),
        )
        .where(F.col("__q").isNotNull())
        .select("__q.qid", "vec_id", "__q.adc_dist")
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    return out.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


# ---------------------------------------------------------------------------
# SQ8: per-vector symmetric int8 scalar quantization
# ---------------------------------------------------------------------------
#
# The lighter sibling of PQ (FAISS's ScalarQuantizer QT_8bit family,
# Milvus/pgvector "scalar quantization"): no training at all, 4x
# memory over float32, and — because cosine is scale-invariant — the
# per-vector scale cancels out of similarity ranking entirely, so
# search runs on the int8 codes alone. The right first step before PQ
# when 4x is enough; recall loss is the rounding error only.


def sq8_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "sq8_code",
    scale_col: str = "sq8_scale",
) -> DataFrame:
    """Quantize ``vec_col`` (array<float>) to ``code_col``
    (array<tinyint>, values in [-127, 127]) plus a per-vector
    ``scale_col`` (double) such that element ~= code * scale.

    code_i = floor((x_i * 127) / maxabs + 0.5) — symmetric round-half-
    up in a fixed (mul, div, add, floor) order of IEEE double ops, so
    any engine evaluating the same expression produces the identical
    code (the cross-engine determinism rule; DuckDB recomputes codes in
    the ann_suite 'sq8' limb). The all-zero vector gets all-zero codes
    and scale 0 (reconstruction exact); no division by zero.

    One corpus scan, pure column expressions, zero shuffle, zero
    driver traffic — stream-safe (score-at-ingest composes with
    readStream the same way the row-local scorers do)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    codes = F.when(
        maxabs > F.lit(0.0),
        F.transform(
            v,
            lambda x: F.floor(x * F.lit(127.0) / maxabs + F.lit(0.5)).cast(
                "tinyint"
            ),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(code_col, codes).withColumn(
        scale_col, maxabs / F.lit(127.0)
    )


def sq8_decode_expr(code_col: str, scale_col: str):
    """Dequantize: array<double> of code * scale. Needed for distance
    metrics where scale does NOT cancel (dot product, L2); cosine
    ranking should use the codes directly (sq8_topk)."""
    return F.transform(
        F.col(code_col), lambda x: x.cast("double") * F.col(scale_col)
    )


def sq8_topk(
    encoded: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "sq8_code",
    q_id_col: str = "qid",
    q_vec_col: str = "qv",
    round_digits: int | None = None,
) -> DataFrame:
    """Asymmetric cosine top-k over the int8 codes: the float query
    against the quantized corpus. cosine(q, scale*c) = cosine(q, c) —
    the per-vector scale cancels, so the scan reads codes only (1/4 the
    bytes of the float corpus; with both this and the raw-vector column
    in parquet, column pruning means the float column is never read).
    Delegates to brute_force_topk with the code column as the vector —
    one implementation of the broadcast-queries x corpus-scan ranking
    topology, not a copy."""
    from .similarity import brute_force_topk

    return brute_force_topk(
        encoded, queries, k=k, id_col=id_col, vec_col=code_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col, round_digits=round_digits,
    )
