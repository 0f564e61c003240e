"""Connected components / duplicate-group clustering (operators/graph.py)."""

from __future__ import annotations

from argostats_spark.operators.graph import connected_components, duplicate_groups


def _labels(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_two_components_and_chain(spark):
    # component {1,2,3,4} as a chain, component {10,11} as one edge
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = _labels(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_converges_via_pointer_jumping(spark):
    # path 0-1-2-...-40: diameter 40 >> max_iter 25, so plain
    # neighbor-min propagation alone could NOT converge — pointer
    # jumping's O(log d) rounds are what make this pass.
    n = 41
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    got = _labels(connected_components(edges))
    assert got == {i: 0 for i in range(n)}


def test_min_label_is_component_minimum_not_first_seen(spark):
    # min id (5) sits at the END of the chain; label must still win
    edges = spark.createDataFrame([(9, 8), (8, 7), (7, 5)], ["id_a", "id_b"])
    got = _labels(connected_components(edges))
    assert set(got.values()) == {5}


def test_duplicate_groups_full_labeling(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    edges = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in duplicate_groups(docs, edges).collect()}
    assert len(rows) == 8
    # chained near-dups collapse into ONE group (the double-drop hazard)
    assert rows[1]["comp_id"] == rows[3]["comp_id"] == rows[5]["comp_id"] == 1
    assert rows[1]["comp_size"] == 3
    assert rows[6]["comp_id"] == 6 and rows[6]["comp_size"] == 2
    # singletons are their own component
    for i in (0, 2, 4):
        assert rows[i]["comp_id"] == i and rows[i]["comp_size"] == 1
    # exactly one keep per component, at the minimum id
    keeps = sorted(d for d, r in rows.items() if r["keep"] == 1)
    assert keeps == [0, 1, 2, 4, 6]


def test_components_match_union_find_property(spark):
    """Property: on random graphs, distributed min-label + pointer
    jumping equals a plain union-find (10 seeded graphs, up to 40
    nodes / 60 edges, including self-loops and duplicate edges)."""
    import random

    def union_find(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # canonical min-id labels
        comp = {}
        for x in range(n_nodes):
            r = find(x)
            comp.setdefault(r, min(i for i in range(n_nodes) if find(i) == r))
        return {x: comp[find(x)] for x in range(n_nodes)}

    # 5 seeds (round 15, driver-pytest budget): each graph runs the
    # full CC loop (several Spark jobs); sizes still span 3-40 nodes
    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _labels(
            connected_components(spark.createDataFrame(edges, ["id_a", "id_b"]))
        )
        want_all = union_find(n, edges)
        touched = {u for e in edges for u in e}
        want = {x: want_all[x] for x in touched}
        assert got == want, f"seed={seed}"


# ---------------------------------------------------------------------------
# PageRank (round 8)
# ---------------------------------------------------------------------------

def _pr_mirror(edge_list, n_iter=10, d=0.85, directed=True, scale=14):
    """Plain-Python mirror of the operator's exact arithmetic: per-edge
    double contributions quantized to `scale` decimals, summed exactly,
    scalar double update."""
    from decimal import ROUND_HALF_UP, Decimal

    edges = set()
    for u, v in edge_list:
        edges.add((u, v))
        if not directed:
            edges.add((v, u))
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = {x: 0 for x in nodes}
    for u, _ in edges:
        deg[u] += 1
    q = Decimal(1).scaleb(-scale)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(n_iter):
        dang = sum(
            (Decimal(repr(rank[x])).quantize(q, ROUND_HALF_UP)
             for x in nodes if deg[x] == 0),
            Decimal(0),
        )
        sums = {x: Decimal(0) for x in nodes}
        for u, v in edges:
            c = Decimal(repr(rank[u] / deg[u])).quantize(q, ROUND_HALF_UP)
            sums[v] += c
        rank = {
            x: (1.0 - d) / n + d * (float(sums[x]) + float(dang) / n)
            for x in nodes
        }
    return rank


def test_pagerank_directed_cycle_uniform(spark):
    """A directed cycle is perfectly balanced: rank stays exactly
    uniform at every iteration count."""
    from argostats_spark.operators.graph import pagerank

    n = 7
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "id_a long, id_b long"
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert len(out) == n
    assert all(abs(v - 1.0 / n) < 1e-12 for v in out.values())


def test_pagerank_star_hub_and_mirror(spark):
    """Undirected star: the hub out-ranks every leaf, leaves are
    bit-identical to each other, and everything matches the Python
    mirror of the exact arithmetic."""
    from argostats_spark.operators.graph import pagerank

    leaves = list(range(1, 9))
    el = [(0, v) for v in leaves]
    edges = spark.createDataFrame(el, "id_a long, id_b long")
    out = {r["node"]: r["rank"] for r in
           pagerank(edges, directed=False, iterations=10).collect()}
    assert all(out[0] > out[v] for v in leaves)
    assert len({out[v] for v in leaves}) == 1
    mirror = _pr_mirror(el, n_iter=10, directed=False)
    for k, v in mirror.items():
        assert abs(out[k] - v) < 1e-12, (k, out[k], v)


def test_pagerank_dangling_mass_conserved(spark):
    """Dangling nodes redistribute uniformly; total rank stays 1."""
    from argostats_spark.operators.graph import pagerank

    el = [(0, 1), (0, 2), (1, 2)]  # node 2 dangles
    edges = spark.createDataFrame(el, "id_a long, id_b long")
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=12).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    mirror = _pr_mirror(el, n_iter=12)
    for k, v in mirror.items():
        assert abs(out[k] - v) < 1e-12
    assert out[2] > out[1] > out[0]


def test_pagerank_partition_independent(spark):
    """The decimal-sum mechanism: byte-identical ranks under any
    partition layout, on a messy random graph."""
    import random

    from argostats_spark.operators.graph import pagerank

    rng = random.Random(8)
    el = list({(rng.randrange(40), rng.randrange(40)) for _ in range(160)})
    el = [(u, v) for u, v in el if u != v]
    a = spark.createDataFrame(el, "id_a long, id_b long").coalesce(1)
    b = spark.createDataFrame(el, "id_a long, id_b long").repartition(13)
    ra = {r["node"]: r["rank"] for r in pagerank(a, iterations=6).collect()}
    rb = {r["node"]: r["rank"] for r in pagerank(b, iterations=6).collect()}
    assert ra == rb  # exact double equality, not allclose
    mirror = _pr_mirror(el, n_iter=6)
    for k, v in mirror.items():
        assert abs(ra[k] - v) < 1e-12


def test_pagerank_validation(spark):
    from argostats_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    import pytest as _pt

    with _pt.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)
    with _pt.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)


def test_pagerank_empty_edges(spark):
    """A clean corpus (zero near-dup pairs) must yield an empty rank
    frame, not a ZeroDivisionError (review r8)."""
    from argostats_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = pagerank(empty, iterations=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_duplicate_groups_best_score_policy(spark):
    """score_col keeps the highest-scoring member per component (ties
    to min id, NULL scores last); min-id default unchanged."""
    from argostats_spark.operators.graph import duplicate_groups

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, None), (7, 1.0), (9, None)],
        "doc_id long, q double",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 9)], "id_a long, id_b long"
    )
    best = {
        r["doc_id"]: (r["comp_id"], r["keep"])
        for r in duplicate_groups(docs, edges, score_col="q").collect()
    }
    # comp {1,2,3}: best score 9.0 tie between 2 and 3 -> min id 2
    assert best[2] == (1, 1) and best[1][1] == 0 and best[3][1] == 0
    # comp {4,9}: both NULL scores -> min id 4 wins via the tiebreak
    assert best[4] == (4, 1) and best[9][1] == 0
    # singleton always kept
    assert best[7] == (7, 1)
    # default policy unchanged: min id keeps
    minid = {
        r["doc_id"]: r["keep"]
        for r in duplicate_groups(docs, edges).collect()
    }
    assert minid == {1: 1, 2: 0, 3: 0, 4: 1, 7: 1, 9: 0}
    # exactly one keeper per component in BOTH policies (min-id keep
    # flags counted against the component map the score policy exposed)
    by_comp_best, by_comp_min = {}, {}
    for d, (c, k) in best.items():
        by_comp_best[c] = by_comp_best.get(c, 0) + k
        by_comp_min[c] = by_comp_min.get(c, 0) + minid[d]
    assert all(v == 1 for v in by_comp_best.values())
    assert all(v == 1 for v in by_comp_min.values())


def test_jump_start_label_identity_and_no_corpus_window(spark):
    """Round-11 restructure pins: (a) the jump_start hybrid is
    fixpoint-identical to always-jump and never-needed-jump on the
    same graph; (b) the default-policy duplicate_groups plan contains
    NO Window operator — sizes/keep come from label-table joins, so
    the corpus never pays a partitionBy(comp_id) exchange+sort."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)] + [(30, 31), (31, 32)],
        ["id_a", "id_b"],
    )
    want = _labels(connected_components(edges, jump_start=0))
    assert _labels(connected_components(edges, jump_start=2)) == want
    assert _labels(connected_components(edges, jump_start=10**9)) == want

    docs = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    explained = duplicate_groups(docs, edges)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Window" not in explained


def test_duplicate_groups_matches_python_mirror_property(spark):
    """Property over random graphs + random corpora (round 11, after
    the join-flags restructure): duplicate_groups' (comp_id,
    comp_size, keep) under BOTH policies equals a plain-Python mirror
    — including docs absent from the graph (singletons), graph nodes
    absent from the corpus (foreign ids: they must not count toward
    comp_size, and a foreign min-id must NOT leave the group
    keeper-less — the minimum SURVIVING doc keeps, round-12 fix of the
    round-11 verdict hazard), and NULL scores (sort last, ties to min
    id)."""
    import random

    def mirror(doc_ids, scores, edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        nodes = {u for e in edges for u in e}
        comp_of = {}
        for x in nodes:
            r = find(x)
            comp_of[x] = min(y for y in nodes if find(y) == r)
        out = {}
        by_comp = {}
        for d in doc_ids:
            c = comp_of.get(d, d)
            by_comp.setdefault(c, []).append(d)
        for d in doc_ids:
            c = comp_of.get(d, d)
            members = by_comp[c]
            size = len(members)
            # keeper = minimum SURVIVING member, not the graph label:
            # a foreign (deleted-doc) min node must not zero the group
            keep_min = int(d == min(members))
            ranked = sorted(
                members,
                key=lambda m: (
                    scores[m] is None,
                    -(scores[m] or 0.0),
                    m,
                ),
            )
            keep_best = int(d == ranked[0])
            out[d] = (c, size, keep_min, keep_best)
        return out

    # 4 seeds (round 15, driver-pytest budget); the foreign-node/
    # NULL-score/singleton cases all appear within these seeds
    for seed in range(4):
        rng = random.Random(100 + seed)
        n = rng.randint(3, 30)
        doc_ids = sorted(rng.sample(range(n + 10), rng.randint(2, n)))
        m = rng.randint(1, 25)
        # edges over a slightly larger id space -> some foreign nodes
        edges = [
            (rng.randrange(n + 10), rng.randrange(n + 10)) for _ in range(m)
        ]
        scores = {
            d: (None if rng.random() < 0.3 else round(rng.random() * 5, 2))
            for d in doc_ids
        }
        docs = spark.createDataFrame(
            [(d, scores[d]) for d in doc_ids], "doc_id long, q double"
        )
        edf = spark.createDataFrame(edges, "id_a long, id_b long")
        want = mirror(doc_ids, scores, edges)
        got_min = {
            r["doc_id"]: (r["comp_id"], r["comp_size"], r["keep"])
            for r in duplicate_groups(docs, edf).collect()
        }
        got_best = {
            r["doc_id"]: (r["comp_id"], r["comp_size"], r["keep"])
            for r in duplicate_groups(docs, edf, score_col="q").collect()
        }
        for d, (c, size, keep_min, keep_best) in want.items():
            # comp_size counts CORPUS DOCS in the component, not nodes
            assert got_min[d] == (c, size, keep_min), f"seed={seed} d={d}"
            assert got_best[d] == (c, size, keep_best), f"seed={seed} d={d}"


def test_duplicate_groups_foreign_min_node_still_keeps(spark):
    """Round-12 regression for the round-11 verdict hazard: a persisted
    pair index (incremental dedup, operators/dedup.py) can carry edges
    naming docs since DELETED from the corpus. If that deleted doc is
    the component's minimum graph node, the old rule keep=(id==comp_id)
    produced a group with ZERO keepers and a keep==1 filter silently
    dropped every surviving copy. The fixed rule keeps the minimum
    SURVIVING doc; comp_id still carries the graph label (stable across
    corpus revisions, by design)."""
    # index edges: 1-5, 5-9; doc 1 was deleted from the corpus
    edges = spark.createDataFrame(
        [(1, 5), (5, 9)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(5,), (9,), (12,)], "doc_id long"
    )
    rows = {
        r["doc_id"]: (r["comp_id"], r["comp_size"], r["keep"])
        for r in duplicate_groups(docs, edges).collect()
    }
    # label stays the graph min (1, foreign); size counts corpus docs
    # only; keeper is the min surviving doc (5), NOT nobody
    assert rows[5] == (1, 2, 1)
    assert rows[9] == (1, 2, 0)
    assert rows[12] == (12, 1, 1)
    # exactly one keeper in the foreign-min group
    assert sum(k for (_, _, k) in rows.values()) == 2
