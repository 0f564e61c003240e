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

    for seed in range(10):
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
