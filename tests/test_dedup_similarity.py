"""Tests for the dedup family and similarity search operators on the
driver's documents/embeddings tables plus hand-built near-dup fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.dedup import (
    dedup_keep_first,
    embedding_near_dups,
    exact_duplicates,
    minhash_lsh_pairs,
    simhash,
    simhash_near_pairs,
)
from argostats_spark.operators.similarity import (
    brute_force_topk,
    hyperplane_bucket,
    ivf_assign,
    ivf_topk,
    train_centroids,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # unpersist on module teardown: a cached read of a base table is
    # session-wide — CacheManager substitutes InMemoryTableScan for
    # the same parquet read in every LATER module's plan, breaking
    # from-parquet plan pins (found round 14: the dsir/tfidf
    # one-tokenize pins failed full-suite only)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def _with_dups(spark, docs):
    """documents plus exact copies of two docs under new ids."""
    base = docs.select("doc_id", "text")
    copies = base.filter(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return base.unionByName(copies)


def test_exact_duplicates_found(spark, docs):
    d = _with_dups(spark, docs)
    out = exact_duplicates(d).filter(F.col("n_copies") > 1).toPandas()
    assert len(out) == 2
    assert set(out.keep_id) == {0, 1}
    assert (out.n_copies == 2).all()


def test_exact_duplicates_bounded_on_degenerate_corpus(spark):
    """VERDICT r4 item 3: one content × 10⁵ copies (the crawl-boilerplate
    shape) must not materialize an unbounded per-group array — the
    bounded result is named sample_ids (round-5 advice: a capped column
    must not be readable under the all_ids name), caps at max_ids (the
    lowest ids, deterministic), n_copies stays the TRUE count, and the
    plan still has exactly one exchange (the window reuses the groupBy's
    hash partitioning)."""
    n = 100_000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("the same boilerplate").alias("text")
    ).union(
        spark.range(3).select(
            (F.col("id") + n).alias("doc_id"), F.lit("unique-" ).alias("text")
        )
    )
    capped = exact_duplicates(d, max_ids=16)
    assert "sample_ids" in capped.columns and "all_ids" not in capped.columns
    out = capped.orderBy(F.desc("n_copies")).toPandas()
    big = out.iloc[0]
    assert big.n_copies == n                       # exact count survives the cap
    assert list(big.sample_ids) == list(range(16))  # the 16 LOWEST ids, sorted
    assert big.keep_id == 0
    assert all(len(r) <= 16 for r in out.sample_ids)
    # one shuffle total: the row_number window and the groupBy share the
    # content_hash hash partitioning
    plan = exact_duplicates(d, max_ids=16)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the explicit full-membership opt-in keeps the honest name (the 3
    # "unique-" rows share one content, so one complete group)
    full = exact_duplicates(d.filter(F.col("doc_id") >= n), max_ids=None)
    assert "all_ids" in full.columns
    rows = full.toPandas()
    assert len(rows) == 1 and list(rows.all_ids.iloc[0]) == [n, n + 1, n + 2]


def test_dedup_keep_first_removes_copies(spark, docs):
    d = _with_dups(spark, docs)
    kept = dedup_keep_first(d)
    assert kept.count() == docs.count()
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_lsh_finds_planted_near_dup(spark, docs):
    """Plant a 90%-overlapping copy: LSH must surface it."""
    base = docs.select("doc_id", "text")
    one = base.filter(F.col("doc_id") == 0).toPandas().iloc[0]
    words = one.text.split()
    near = " ".join(words[: int(len(words) * 0.95)])  # drop the tail 5%
    planted = spark.createDataFrame(
        pd.DataFrame({"doc_id": [200000], "text": [near]})
    )
    d = base.unionByName(planted)
    pairs = minhash_lsh_pairs(d, threshold=0.5).toPandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 200000)).any()


def test_minhash_no_false_positives_below_threshold(spark, docs):
    pairs = minhash_lsh_pairs(docs.select("doc_id", "text"), threshold=0.9).toPandas()
    assert (pairs.jaccard >= 0.9).all()


def test_simhash_deterministic_and_near_pairs(spark, docs):
    d = docs.select("doc_id", "text")
    s1 = simhash(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    s2 = simhash(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert (s1.simhash == s2.simhash).all()

    # identical text → hamming 0 → found by the block trick
    dup = _with_dups(spark, docs)
    pairs = simhash_near_pairs(dup, max_hamming=3).toPandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 100000) & (pairs.hamming == 0)).any()


def test_embedding_near_dups_planted(spark, emb):
    """A vector plus a tiny perturbation of itself must pair up."""
    one = emb.filter(F.col("vec_id") == 0).toPandas().iloc[0]
    v = np.asarray(one.embedding, dtype="f4")
    near = (v + 0.001).tolist()
    planted = spark.createDataFrame(
        pd.DataFrame({"vec_id": [900000], "embedding": [near], "label": [0]})
    )
    d = emb.unionByName(planted)
    pairs = embedding_near_dups(d, threshold=0.99).toPandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 900000)).any()


def test_brute_force_topk_shape_and_order(spark, emb):
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = brute_force_topk(emb, q, k=5).toPandas()
    assert len(out) == 15
    for qid, grp in out.groupby("qid"):
        sims = grp.sort_values("rn" if "rn" in grp else "cosine", ascending=False)
        assert (np.diff(grp.sort_values("cosine", ascending=False).cosine) <= 1e-12).all()


def test_ivf_topk_recall_against_brute_force(spark, emb):
    """IVF with generous nprobe must recover most exact neighbors —
    the approximate/exact contract of the scale path."""
    cents = train_centroids(emb, n_centroids=8, sample_rows=500)
    assigned = ivf_assign(emb, cents).cache()
    # every vector gets a cell in [0, 8)
    cells = assigned.select("ivf_cell").distinct().toPandas().ivf_cell
    assert cells.between(0, 7).all()

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = brute_force_topk(emb, q, k=5).toPandas()
    approx = ivf_topk(assigned, q, cents, k=5, nprobe=4).toPandas()
    recalls = []
    for qid in range(5):
        e = set(exact[exact.qid == qid].vec_id)
        a = set(approx[approx.qid == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, f"IVF recall too low: {recalls}"


def test_hyperplane_bucket_stable(spark, emb):
    b1 = emb.select("vec_id", hyperplane_bucket("embedding", 64, 8, 42).alias("b")).toPandas()
    b2 = emb.select("vec_id", hyperplane_bucket("embedding", 64, 8, 42).alias("b")).toPandas()
    m = b1.merge(b2, on="vec_id")
    assert (m.b_x == m.b_y).all()
    assert m.b_x.between(0, 255).all()


def test_ivf_topk_scalable_equals_collected(spark, emb):
    """The distributed probe-list variant returns exactly the collected
    variant's neighbor sets (identical centroid argmin, no driver
    round-trip) — closes the SCALE.md IVF open item."""
    from argostats_spark.operators.similarity import ivf_topk_scalable

    cents = train_centroids(emb, n_centroids=8, sample_rows=2000)
    assigned = ivf_assign(emb, cents)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    a = ivf_topk(assigned, queries, cents, k=5, nprobe=3)
    b = ivf_topk_scalable(assigned, queries, cents, k=5, nprobe=3)
    sa = {(r["qid"], r["vec_id"]) for r in a.collect()}
    sb = {(r["qid"], r["vec_id"]) for r in b.collect()}
    assert sa == sb and len(sa) == 8 * 5


def test_minhash_lsh_salted_verify_equals_unsalted(spark, docs):
    """salt_verify routes the Jaccard-verification join through
    salted_join (operators/skew.py) — the user-visible skew remedy for a
    hot template document. Plant one template duplicated 25× (one id_a
    carries O(dupes·shingles) verification work): the salted and plain
    paths must return row-identical pairs."""
    base = docs.select("doc_id", "text").filter(F.col("doc_id") < 60)
    one = base.filter(F.col("doc_id") == 0).toPandas().iloc[0]
    words = one.text.split()
    clones = pd.DataFrame(
        {
            # near-identical template clones: same prefix, tiny suffix
            # variation keeps them distinct rows but in the same bands
            "doc_id": [300000 + i for i in range(25)],
            "text": [" ".join(words) + f" tail{i % 3}" for i in range(25)],
        }
    )
    d = base.unionByName(spark.createDataFrame(clones))

    plain = (
        minhash_lsh_pairs(d, threshold=0.5)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    salted = (
        minhash_lsh_pairs(d, threshold=0.5, salt_verify=8)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    # the hot template really did generate a pair pileup worth salting
    assert (plain.id_a == 0).sum() + (plain.id_b == 0).sum() >= 20
    pd.testing.assert_frame_equal(plain, salted)


def test_ivf_cell_partitioned_store_prunes(spark, emb, tmp_path_factory):
    """The IVF scale path at rest: writing the assigned corpus
    partitioned by ivf_cell turns nprobe-cell queries into partition-
    pruned scans — the parquet reader must list only the probed cells'
    directories, not the corpus (the 100 TB point of the inverted
    file)."""
    from argostats_spark.operators.similarity import ivf_assign, train_centroids

    out = str(tmp_path_factory.mktemp("ivf_store"))
    cents = train_centroids(emb, n_centroids=8, sample_rows=1000)
    ivf_assign(emb, cents).write.mode("overwrite").partitionBy("ivf_cell").parquet(out)

    store = spark.read.parquet(out)
    probed = store.filter(F.col("ivf_cell").isin(1, 3))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # partition pruning shows up as a PartitionFilters entry on the scan
    assert "PartitionFilters: [" in plan and "ivf_cell" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # and the pruned read returns exactly the probed cells' rows
    got = probed.select("ivf_cell").distinct().toPandas()
    assert set(got.ivf_cell) <= {1, 3}
    n_all = store.count()
    n_probed = probed.count()
    assert 0 < n_probed < n_all


def test_collapsed_lsh_groups_equal_plain(spark, docs):
    """minhash_lsh_pairs_collapsed emits a component-equivalent edge
    set: duplicate_groups over it must be IDENTICAL (comp_id, size,
    keep) to the plain pipeline's on a corpus where every document has
    2 extra exact copies and near-dups are planted among the copies."""
    from argostats_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_lsh_pairs_collapsed,
    )
    from argostats_spark.operators.graph import duplicate_groups

    base = docs.select("doc_id", "text").filter(F.col("doc_id") < 120)
    corpus = base
    for k in (1, 2):  # exact copies of EVERY doc under shifted ids
        corpus = corpus.unionByName(
            base.select((F.col("doc_id") + 100000 * k).alias("doc_id"), "text")
        )
    corpus = corpus.cache()

    kw = dict(threshold=0.5)
    plain = duplicate_groups(
        corpus, minhash_lsh_pairs(corpus, **kw).select("id_a", "id_b")
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    coll = duplicate_groups(
        corpus, minhash_lsh_pairs_collapsed(corpus, **kw).select("id_a", "id_b")
    ).toPandas().sort_values("doc_id").reset_index(drop=True)

    assert plain.equals(coll), (
        plain.compare(coll).head() if len(plain) == len(coll) else (len(plain), len(coll))
    )
    # every doc must be in a component of >= 3 (its two exact copies)
    assert (coll.comp_size >= 3).all()
    # member edges are linear, not quadratic: the collapsed edge count
    # must be strictly smaller than the plain all-pairs edge count
    n_plain = minhash_lsh_pairs(corpus, **kw).count()
    n_coll = minhash_lsh_pairs_collapsed(corpus, **kw).count()
    assert n_coll < n_plain, (n_coll, n_plain)
    corpus.unpersist()


def test_collapsed_lsh_ignores_subshingle_and_null_texts(spark):
    """Component-equivalence at the edges: byte-identical texts that
    emit ZERO shingles (fewer than shingle_n tokens, empty, or NULL)
    stay singletons in the plain pipeline, so the collapse must not
    glue them together either (md5(NULL)=NULL would otherwise merge
    every NULL-text doc into one group)."""
    from argostats_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_lsh_pairs_collapsed,
    )
    from argostats_spark.operators.graph import duplicate_groups

    rows = [
        (0, "hello world"), (1, "hello world"),        # 2 toks < shingle_n=3
        (2, ""), (3, ""),
        (4, None), (5, None),
        (6, "a genuinely long duplicated document body here"),
        (7, "a genuinely long duplicated document body here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    plain = duplicate_groups(
        d, minhash_lsh_pairs(d, threshold=0.5).select("id_a", "id_b")
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    coll = duplicate_groups(
        d, minhash_lsh_pairs_collapsed(d, threshold=0.5).select("id_a", "id_b")
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert plain.equals(coll), (plain.to_string(), coll.to_string())
    # the real duplicate pair IS merged; every zero-shingle doc is alone
    assert coll.loc[coll.doc_id == 7, "comp_id"].item() == 6
    for i in range(6):
        assert coll.loc[coll.doc_id == i, "comp_size"].item() == 1, i


def test_inline_lsh_verify_has_no_forced_broadcast(spark, sf_dir):
    """VERDICT r13 item 1: the registry LSH verify must NOT pin the
    candidate-doc shingle-set tables (pa/pb — doc-payload-sized, grows
    linearly with a near-dup-heavy corpus) under a forced broadcast
    hint; AQE decides, so at 100x the plan degrades to shuffle instead
    of hitting the 8 GB broadcast ceiling. The id-set broadcast is
    consumed inside the eager sets checkpoint, so the returned pair
    frame's analyzed plan must carry ZERO ResolvedHint nodes — this
    pins any future forced hint on the verify joins as a loud
    failure."""
    from argostats_spark.queries_documents import _minhash_lsh_pairs_inline

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = _minhash_lsh_pairs_inline(d)
    analyzed = pairs._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 0, analyzed


def test_registry_groups_lsh_collapsed_equals_plain(spark, sf_dir):
    """The REGISTRY dedup_groups_lsh query now fronts the inline
    md5-band pair plan with the exact-collapse pre-pass; its output
    must be row-identical to duplicate_groups over the plain
    dedup_minhash_lsh pairs — on the real testdata AND on a corpus
    salted with exact copies (where the collapse actually bites)."""
    from argostats_spark.queries_documents import (
        q_dedup_groups_lsh, q_dedup_minhash_lsh, _minhash_lsh_pairs_inline,
    )
    from argostats_spark.operators.graph import duplicate_groups

    plain = duplicate_groups(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        q_dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b"),
        id_col="doc_id",
    )
    coll = q_dedup_groups_lsh(spark, sf_dir)
    assert plain.exceptAll(coll).count() == 0
    assert coll.exceptAll(plain).count() == 0

    # salted corpus: 2 exact copies of every doc — collapse must merge
    # them into the same components the plain pipeline builds
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 80)
    corpus = base
    for k in (1, 2):
        corpus = corpus.unionByName(
            base.select((F.col("doc_id") + 100000 * k).alias("doc_id"), "text")
        )
    corpus = corpus.cache()
    plain2 = duplicate_groups(
        corpus, _minhash_lsh_pairs_inline(corpus).select("id_a", "id_b"),
        id_col="doc_id",
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    # re-run the registry collapse logic over the salted corpus by
    # pointing the query at a temp view-free path: inline equivalent
    from argostats_spark.functions.text import tokens

    eligible = F.col("text").isNotNull() & (
        F.size(tokens(F.lower(F.col("text")))) >= 3
    )
    keyed = corpus.filter(eligible).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("__tk")
    )
    reps = keyed.groupBy("__tk").agg(F.min("doc_id").alias("rep_id"))
    members = keyed.join(reps, "__tk")
    member_edges = members.filter(F.col("doc_id") != F.col("rep_id")).select(
        F.col("rep_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    rep_docs = corpus.join(
        reps.select(F.col("rep_id").alias("doc_id")), "doc_id", "semi"
    )
    edges = _minhash_lsh_pairs_inline(rep_docs).select("id_a", "id_b").unionByName(
        member_edges
    )
    coll2 = duplicate_groups(corpus, edges, id_col="doc_id").toPandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert plain2.equals(coll2)
    assert (coll2.comp_size >= 3).all()
    corpus.unpersist()


def test_groups_lsh_collapse_gate(spark, tmp_path):
    """The registry dedup_groups_lsh gates the exact-collapse pre-pass
    on a dup-rate probe (round 8, 10% threshold): a dup-free corpus must NOT pay the
    md5-keyed collapse exchange (no __tk/rep_id in the plan); a
    dup-heavy corpus must run the collapsed plan AND produce the same
    components the plain pipeline computes on the identical data."""
    from argostats_spark.queries import QUERIES
    from argostats_spark.queries_documents import (
        _exact_dup_fraction,
        _minhash_lsh_pairs_inline,
        _t,
    )
    from argostats_spark.operators.graph import duplicate_groups

    # dup-free: the synthetic sf0.001 corpus (measured ~0% exact dups)
    # -> the probe stays under the 2% gate, so the plain pipeline runs
    sf_docs = _t(spark, "/root/testdata/sf0.001", "documents")
    assert _exact_dup_fraction(sf_docs) < 0.10

    # dup-heavy: 40 base docs, each duplicated 5x -> dup_frac = 0.8
    base = [
        (i, " ".join(f"tok{(i * 7 + j) % 23}" for j in range(12)))
        for i in range(40)
    ]
    rows = [(i + 1000 * k, t) for i, t in base for k in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    d = tmp_path / "sf"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    assert _exact_dup_fraction(df) > 0.5  # gate -> collapsed
    out2 = QUERIES["dedup_groups_lsh"](spark, str(d))
    got = {(r["doc_id"], r["comp_id"]) for r in out2.collect()}
    corpus = _t(spark, str(d), "documents")
    plain = duplicate_groups(
        corpus,
        _minhash_lsh_pairs_inline(corpus).select("id_a", "id_b"),
        id_col="doc_id",
    )
    want = {(r["doc_id"], r["comp_id"]) for r in plain.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Incremental dedup against a persisted signature index (round 8)
# ---------------------------------------------------------------------------

def test_incremental_equals_batch_restricted(spark, docs):
    """minhash_lsh_pairs_incremental(new, index(old), corpus=old) must
    equal the BATCH pairs over old ∪ new restricted to pairs touching a
    new id — the snapshot-refresh contract."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    base = docs.select("doc_id", "text")
    # increment: copies of three old docs (near-dups across the split)
    # plus a new-vs-new duplicate pair
    src = base.filter(F.col("doc_id") < 3)
    new = (
        src.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            src.filter(F.col("doc_id") == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    batch = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(
            base.unionByName(new), threshold=0.5
        ).collect()
        if r["id_a"] >= 100000 or r["id_b"] >= 100000
    }
    assert batch, "fixture must produce cross-increment pairs"
    inc = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs_incremental(
            new, minhash_index(base), corpus=base, threshold=0.5
        ).collect()
    }
    assert inc == batch
    # new-vs-new pair found exactly once, correctly oriented
    assert any(a == 100000 and b == 200000 for a, b, _ in inc)


def test_incremental_signature_only_estimate(spark, docs):
    """corpus=None: est_jaccard from signature agreement — exact copies
    estimate 1.0; estimates live in (0, 1]; candidate set matches the
    text-verified run's candidates at threshold 0."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs_incremental,
    )

    base = docs.select("doc_id", "text")
    new = base.filter(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    idx = minhash_index(base)
    est = minhash_lsh_pairs_incremental(new, idx, threshold=0.99).collect()
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in est}
    # exact copies: every signature component agrees
    assert got[(0, 100000)] == 1.0
    assert got[(1, 100001)] == 1.0
    assert all(0.0 < v <= 1.0 for v in got.values())


def test_index_roundtrips_through_parquet(spark, docs, tmp_path_factory):
    """The index is a plain parquet artifact: write → read → incremental
    run gives the same pairs as an in-memory index."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs_incremental,
    )

    base = docs.select("doc_id", "text")
    new = base.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    p = str(tmp_path_factory.mktemp("mhidx") / "index.parquet")
    minhash_index(base).write.mode("overwrite").parquet(p)
    mem = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_incremental(
            new, minhash_index(base), corpus=base, threshold=0.5
        ).collect()
    )
    disk = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_incremental(
            new, spark.read.parquet(p), corpus=base, threshold=0.5
        ).collect()
    )
    assert mem == disk and (0, 100000) in mem


def test_signature_rows_equal_index(spark, docs):
    """Row-local signature form == the agg form, both hash families,
    including the short-doc drop semantics."""
    from argostats_spark.operators.dedup import minhash_index, minhash_signature_rows

    base = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(900001, "two tokens"), (900002, None)], "doc_id long, text string"
        )
    )
    for hasher, k in (("xxhash64", 8), ("md5", 2)):
        agg = {r["doc_id"]: r.asDict() for r in
               minhash_index(base, num_hashes=k, hasher=hasher).collect()}
        rowl = {r["doc_id"]: r.asDict() for r in
                minhash_signature_rows(base, num_hashes=k, hasher=hasher).collect()}
        assert rowl == agg, hasher
        assert 900001 not in rowl and 900002 not in rowl


def test_signature_rows_streaming_equals_batch(spark, docs, tmp_path_factory):
    from argostats_spark.operators.dedup import minhash_signature_rows

    src = str(tmp_path_factory.mktemp("sigstream") / "in")
    docs.select("doc_id", "text").limit(50).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    batch = {r["doc_id"]: r.asDict() for r in
             minhash_signature_rows(spark.read.parquet(src)).collect()}
    stream = minhash_signature_rows(spark.readStream.schema(schema).parquet(src))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("sig_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r.asDict() for r in
               spark.sql("SELECT * FROM sig_stream").collect()}
    finally:
        q.stop()
    assert got == batch


def test_near_dup_collisions_rows_batch_and_stream(spark, docs, tmp_path_factory):
    """The ingest-time gate: exact copies of indexed docs collide with
    est_jaccard 1.0 in every band; strangers don't collide; streaming
    rows == batch rows through a memory sink (stateless stream-static
    join)."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        near_dup_collisions_rows,
    )

    base = docs.select("doc_id", "text")
    idx = minhash_index(base).localCheckpoint(eager=True)
    new = base.filter(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        spark.createDataFrame(
            [(100002, "totally unrelated stranger words nothing shared here at all")],
            "doc_id long, text string",
        )
    )
    out = near_dup_collisions_rows(new, idx, threshold=0.9).collect()
    got = {(r["doc_id"], r["index_doc_id"], r["band_no"]): r["est_jaccard"]
           for r in out}
    # exact copy: all 4 bands collide at est 1.0
    assert {(100000, 0, b) for b in range(4)} <= set(got)
    assert {(100001, 1, b) for b in range(4)} <= set(got)
    assert all(v == 1.0 for v in got.values())
    assert not any(d == 100002 for d, _, _ in got)

    # streaming == batch
    src = str(tmp_path_factory.mktemp("ndgate") / "in")
    new.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = near_dup_collisions_rows(
        spark.readStream.schema(schema).parquet(src), idx, threshold=0.9
    )
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("ndgate_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got_s = {(r["doc_id"], r["index_doc_id"], r["band_no"]): r["est_jaccard"]
                 for r in spark.sql("SELECT * FROM ndgate_stream").collect()}
    finally:
        q.stop()
    assert got_s == got


def test_index_contract_validation(spark, docs):
    """A persisted index that doesn't match the call's (num_hashes,
    hasher) must fail loudly, never band-join garbage; and a corpus
    frame missing text the index references must raise, never silently
    drop the affected pairs."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs_incremental,
        near_dup_collisions_rows,
    )

    base = docs.select("doc_id", "text")
    new = base.filter(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    idx8 = minhash_index(base).localCheckpoint(eager=True)
    # num_hashes mismatch
    with pytest.raises(ValueError, match="num_hashes=4"):
        minhash_lsh_pairs_incremental(new, idx8, num_hashes=4, bands=2)
    # hasher mismatch (md5 expects string signatures)
    with pytest.raises(ValueError, match="hasher mismatch"):
        near_dup_collisions_rows(new, idx8, hasher="md5", num_hashes=8)
    # partial corpus: doc 0 is referenced by the index but its text is
    # gone from the lake -> candidate pairs would silently vanish
    with pytest.raises(ValueError, match="candidate document"):
        minhash_lsh_pairs_incremental(
            new, idx8, corpus=base.filter(F.col("doc_id") != 0), threshold=0.5
        ).collect()


def test_index_update_equals_rebuild(spark, docs):
    """minhash_index_update(index(old), add=sig(new)) must feed the next
    incremental run identically to an index rebuilt from scratch; drops
    retire ids; column mismatch fails loudly."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_index_update,
        minhash_lsh_pairs_incremental,
        minhash_signature_rows,
    )

    base = docs.select("doc_id", "text")
    gen1 = base.filter(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    gen2 = base.filter(F.col("doc_id").between(2, 3)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    all1 = base.unionByName(gen1)
    updated = minhash_index_update(
        minhash_index(base), add=minhash_signature_rows(gen1)
    ).localCheckpoint(eager=True)
    rebuilt = minhash_index(all1).localCheckpoint(eager=True)
    pairs_u = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs_incremental(
            gen2, updated, corpus=all1, threshold=0.5
        ).collect()
    )
    pairs_r = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs_incremental(
            gen2, rebuilt, corpus=all1, threshold=0.5
        ).collect()
    )
    assert pairs_u == pairs_r and pairs_u
    # retire: dropping doc 0 removes it from the index (and the next
    # incremental run must then also drop it from corpus)
    drops = spark.createDataFrame([(0,)], "doc_id long")
    trimmed = minhash_index_update(updated, drop_ids=drops)
    assert trimmed.filter(F.col("doc_id") == 0).count() == 0
    assert trimmed.count() == updated.count() - 1
    with pytest.raises(ValueError, match="add columns"):
        minhash_index_update(updated, add=gen1)


def test_banded_index_path_equals_default(spark, docs, tmp_path_factory):
    """The bucketed-deployment path: fold-in band keys produce the
    identical pair set, the persisted bucketed band table joins with
    ZERO Exchange on the index side, and incremental results through
    spark.table(...) equal the in-memory path."""
    from argostats_spark.operators.dedup import (
        band_table,
        minhash_index,
        minhash_lsh_pairs_incremental,
        minhash_signature_rows,
        write_band_index,
    )

    base = docs.select("doc_id", "text")
    new = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    idx = minhash_index(base).localCheckpoint(eager=True)
    default_pairs = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs_incremental(
            new, idx, corpus=base, threshold=0.5
        ).collect()
    )
    # in-memory band melt (fold-in keys)
    mem_pairs = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs_incremental(
            new, idx, corpus=base, threshold=0.5, index_bands=band_table(idx)
        ).collect()
    )
    assert mem_pairs == default_pairs and default_pairs

    # persisted bucketed table
    tbl = "band_idx_test_r8"
    path = str(tmp_path_factory.mktemp("bandidx") / "tbl")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_band_index(idx, tbl, path=path, buckets=8)
    try:
        tbl_pairs = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs_incremental(
                new, idx, corpus=base, threshold=0.5,
                index_bands=spark.table(tbl),
            ).collect()
        )
        assert tbl_pairs == default_pairs

        # plan pin: with broadcast off, the bucketed side reads
        # bucket-aligned (no Exchange on the index side — exactly one
        # Exchange total, for the probe melt)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = band_table(minhash_signature_rows(new)).alias("a").join(
                spark.table(tbl).alias("b"), "bk"
            )
            plan = probe._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan, plan
            assert plan.count("Exchange hashpartitioning") == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # contract: a frame without the melt columns is rejected
    with pytest.raises(ValueError, match="index_bands"):
        minhash_lsh_pairs_incremental(new, idx, index_bands=idx.select("doc_id", "n_sh"))


def test_incremental_salted_verify_equals_unsalted(spark, docs):
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs_incremental,
    )

    base = docs.select("doc_id", "text")
    new = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    idx = minhash_index(base).localCheckpoint(eager=True)
    plain = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs_incremental(
            new, idx, corpus=base, threshold=0.5
        ).collect()
    )
    salted = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs_incremental(
            new, idx, corpus=base, threshold=0.5, salt_verify=8
        ).collect()
    )
    assert salted == plain and plain


def test_index_update_rejects_hasher_mismatch(spark, docs):
    """Same column NAMES but string-vs-long signatures (an md5 index
    updated with xxhash64 rows) must fail loudly — unionByName would
    otherwise coerce the longs to digit strings and silently poison
    every future band join (review r8)."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        minhash_index_update,
        minhash_signature_rows,
    )

    base = docs.select("doc_id", "text").limit(20)
    idx_md5 = minhash_index(base, num_hashes=2, hasher="md5")
    add_xx = minhash_signature_rows(
        base.select((F.col("doc_id") + 500).alias("doc_id"), "text"),
        num_hashes=2,
    )
    with pytest.raises(ValueError, match="types differ"):
        minhash_index_update(idx_md5, add=add_xx)


def test_band_table_contract_validation(spark, docs):
    """A band table written with different parameters (or stale after
    an index update) must fail loudly, never silently miss duplicates
    (review r8)."""
    from argostats_spark.operators.dedup import (
        band_table,
        minhash_index,
        minhash_lsh_pairs_incremental,
    )

    base = docs.select("doc_id", "text")
    new = base.filter(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    idx = minhash_index(base).localCheckpoint(eager=True)
    # bands mismatch: 2-band table against a 4-band call -> row count
    # contract trips
    two_band = band_table(idx, num_hashes=8, bands=2)
    with pytest.raises(ValueError, match="stale or was written"):
        minhash_lsh_pairs_incremental(
            new, idx, corpus=base, index_bands=two_band
        )
    # hasher mismatch: string bk against an xxhash64 call
    md5_idx = minhash_index(base, num_hashes=8, hasher="md5")
    md5_bands = band_table(md5_idx, num_hashes=8, bands=4, hasher="md5")
    with pytest.raises(ValueError, match="other hash family"):
        minhash_lsh_pairs_incremental(
            new, idx, corpus=base, index_bands=md5_bands
        )


def test_collision_gate_with_persisted_band_artifact(spark, docs, tmp_path_factory):
    """The streaming-production shape: the gate probes a persisted
    signature-carrying band table (write_band_index include_signature)
    and returns the same rows as the in-memory melt — batch AND
    through a readStream micro-batch."""
    from argostats_spark.operators.dedup import (
        minhash_index,
        near_dup_collisions_rows,
        write_band_index,
    )

    base = docs.select("doc_id", "text")
    idx = minhash_index(base).localCheckpoint(eager=True)
    new = base.filter(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    default_rows = sorted(
        (r["doc_id"], r["index_doc_id"], r["band_no"], r["est_jaccard"])
        for r in near_dup_collisions_rows(new, idx, threshold=0.9).collect()
    )
    tbl = "band_sig_test_r8"
    path = str(tmp_path_factory.mktemp("bandsig") / "tbl")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_band_index(idx, tbl, path=path, buckets=8, include_signature=True)
    try:
        via_tbl = sorted(
            (r["doc_id"], r["index_doc_id"], r["band_no"], r["est_jaccard"])
            for r in near_dup_collisions_rows(
                new, idx, threshold=0.9, index_bands=spark.table(tbl)
            ).collect()
        )
        assert via_tbl == default_rows and default_rows

        # streaming through the persisted artifact
        src = str(tmp_path_factory.mktemp("bandsig") / "in")
        new.write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = near_dup_collisions_rows(
            spark.readStream.schema(schema).parquet(src), idx,
            threshold=0.9, index_bands=spark.table(tbl),
        )
        assert stream.isStreaming
        q = (stream.writeStream.format("memory").queryName("bandsig_stream")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
            got = sorted(
                (r["doc_id"], r["index_doc_id"], r["band_no"], r["est_jaccard"])
                for r in spark.sql("SELECT * FROM bandsig_stream").collect()
            )
        finally:
            q.stop()
        assert got == default_rows
        # a signature-less band table is rejected with the remedy named
        with pytest.raises(ValueError, match="include_signature"):
            near_dup_collisions_rows(
                new, idx, index_bands=spark.table(tbl).drop("sig")
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


# --- MRL prefix-dimension retrieval --------------------------------------


def test_mrl_funnel_beats_prefix_and_converges_to_exact(spark, sf_dir):
    from argostats_spark.operators.similarity import brute_force_topk, mrl_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = {(r["qid"], r["vec_id"]) for r in brute_force_topk(e, q, k=5).collect()}

    def recall(df):
        got = {(r["qid"], r["vec_id"]) for r in df.collect()}
        return len(exact & got) / len(exact)

    # NOTE: testdata embeddings are isotropic random — the WORST case
    # for prefix truncation (an MRL-trained encoder front-loads the
    # information). The structural claims still hold: recall grows
    # with d, the rerank funnel strictly improves on prefix-only, and
    # a funnel whose first stage keeps everything IS exact.
    r_pre, r_fun = {}, {}
    for d in (16, 32, 48):
        r_pre[d] = recall(mrl_topk(e, q, d, k=5))
        r_fun[d] = recall(mrl_topk(e, q, d, k=5, rerank_full=True, expand=4))
        assert r_fun[d] > r_pre[d], (d, r_pre[d], r_fun[d])
    assert r_pre[16] <= r_pre[32] <= r_pre[48]
    assert r_fun[48] >= 0.7

    n = e.count()
    everything = mrl_topk(e, q, 16, k=5, rerank_full=True, expand=n)
    assert {(r["qid"], r["vec_id"]) for r in everything.collect()} == exact


def test_mrl_truncate_validation(spark):
    from argostats_spark.operators.similarity import mrl_truncate

    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<float>")
    assert df.select(mrl_truncate("v", 2).alias("p")).first()["p"] == [1.0, 2.0]
    import pytest as _pt
    with _pt.raises(ValueError, match="d must be"):
        mrl_truncate("v", 0)


# --- edit-distance (Levenshtein) near-dup for short strings ---------------


def test_edit_distance_pairs_matches_brute_force(spark):
    import itertools

    from argostats_spark.operators.dedup import edit_distance_pairs

    titles = [
        (0, "the great gatsby"), (1, "the great gatsby!"),
        (2, "the grat gatsby"), (3, "a tale of two cities"),
        (4, "a tale of two citis"), (5, "moby dick"),
        (6, "moby-dick"), (7, "mobydick"), (8, "x"), (9, "xy"),
        (10, "completely different title"), (11, None),
        (12, "the great gatsby"),  # exact dup at distance 0
    ]
    df = spark.createDataFrame(titles, "doc_id long, text string")
    for md in (0, 1, 2, 3):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, max_dist=md).collect()
        }
        # brute force over all non-null pairs
        def lev(a, b):
            import numpy as np
            m, n = len(a), len(b)
            d = np.arange(n + 1)
            for i in range(1, m + 1):
                prev, d[0] = d[0], i
                for j in range(1, n + 1):
                    cur = min(d[j] + 1, d[j - 1] + 1,
                              prev + (a[i - 1] != b[j - 1]))
                    prev, d[j] = d[j], cur
            return int(d[n])

        want = {
            (i, j, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(
                [(i, t) for i, t in titles if t is not None], 2)
            if lev(a, b) <= md
        }
        assert got == want, f"max_dist={md}"


def test_edit_distance_pairs_plan_is_equijoin_and_validates(spark):
    from argostats_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(i, f"title number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        edit_distance_pairs(df, max_dist=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(df, max_dist=-1)
    with pytest.raises(ValueError, match="band_width"):
        edit_distance_pairs(df, max_dist=2, band_width=2)
