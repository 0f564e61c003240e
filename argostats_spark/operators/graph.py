"""Connected components / duplicate-group clustering.

The step after pair generation in every dedup pipeline: near-dup PAIRS
(minhash-LSH, simhash, n-gram Jaccard — operators/dedup.py) must become
duplicate GROUPS before any keep/drop decision, because near-duplication
chains (A~B, B~C but not A~C) and keeping "one per pair" double-drops.

Green-field scope beyond the reference (same family as dedup.py; the
reference engine has no graph surface). Algorithm: distributed min-label
propagation with pointer jumping — the Hash-to-Min / alternating-star
family (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14; public paper), expressed as DataFrame joins:

  round:  l(v) <- min(l(v), min_{u in N(v)} l(u))   (neighbor min)
          l(v) <- l(l(v))                           (pointer jump)

Pointer jumping halves the label-tree depth each round, so convergence
is O(log d) rounds for diameter d — on dedup graphs (small near-clique
clusters) 2-3 rounds in practice. Every round is a fixed number of
hash-partitioned equi-joins/aggregations on (node) — no driver-side
data, no cartesian anything; the driver loop only evaluates a scalar
convergence aggregate per round, exactly like GraphX/GraphFrames.

Scale notes (1000-executor posture):
- labels are localCheckpoint()ed each round: iterative self-joins
  otherwise grow the logical plan until Catalyst analysis dominates.
  On a real cluster with a configured checkpoint dir, swap for
  reliable `checkpoint()`; localCheckpoint is executor-storage-backed
  and lineage-truncating either way.
- convergence = sum(comp) stable (labels are monotone non-increasing,
  so the sum strictly decreases until fixpoint); summed as
  decimal(38,0) so petabyte-scale id spaces cannot overflow a long.
- the final labels carry comp = min(node id) of the component, so the
  canonical "keep" representative needs no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    round_hook=None,
    jump_start: int = 2,
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns (node, comp) for every node appearing in ``edges``; ``comp``
    is the component's minimum node id. Nodes not in ``edges`` are
    absent — see :func:`duplicate_groups` for full labeling.

    ``round_hook(round_no, seconds)``, if given, is called after each
    completed propagation round — the scale probes use it to record
    rounds-to-converge and per-round wall time (SCALE.md).

    ``jump_start``: the round index from which the pointer-jump join
    runs. Dedup graphs are near-cliques that converge in ≤2 plain
    neighbor-min rounds, so the jump join there is a pure extra
    shuffle per round (measured −7% on the cc_flags stage skipping it,
    scripts/bench_cc_flags_ab.py, round 11); deep graphs still get the
    O(log d) guarantee from round ``jump_start`` on — the hybrid pays
    at most ``jump_start`` extra cheap rounds on a long chain. The
    fixpoint (min id per component) is algorithm-independent, so any
    ``jump_start`` produces identical labels.
    """
    import time as _time

    from pyspark.sql import Observation

    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Materialize the symmetrized edge list ONCE: the loop below references
    # `sym` every round, and Spark rebuilds lineage per action — an edge
    # list derived from an expensive pair-generation query (LSH banding,
    # exact jaccard) would otherwise be recomputed end-to-end each
    # iteration (measured: components-over-jaccard at sf0.1 ran the whole
    # quadratic edge query per round, minutes instead of seconds).
    sym = half.union(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    # convergence metric rides the checkpoint job via observe()
    # (round 14, guide §1.2/"don't compute things twice"): the old
    # shape ran a SEPARATE sum-aggregate action over the materialized
    # labels every round — one full extra pass over |V| rows per round
    # at scale. observe() attaches the same sum(decimal) to the eager
    # checkpoint's own job; Observation.get returns immediately once
    # that job finished (verified against eager localCheckpoint).
    _SUM = F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    obs0 = Observation()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .observe(obs0, _SUM)
        .localCheckpoint()
    )
    prev_sum = obs0.get["s"]

    for _round in range(max_iter):
        _t0 = _time.perf_counter()
        # neighbor min: smallest label among v's neighbors
        nbr = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels["node"] == nbr["u"], "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))).alias("comp"),
        )
        if _round >= jump_start:
            # pointer jump: comp <- comp(comp), halves label-tree depth
            ptr = stepped.select(
                F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
            )
            stepped = (
                stepped.join(ptr, stepped["comp"] == ptr["p_node"], "left")
                .select("node", F.coalesce("p_comp", "comp").alias("comp"))
            )
        obs = Observation()
        jumped = stepped.observe(obs, _SUM).localCheckpoint()
        cur_sum = obs.get["s"]
        labels = jumped
        if round_hook is not None:
            round_hook(_round, _time.perf_counter() - _t0)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def duplicate_groups(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    score_col: str | None = None,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Full corpus labeling from a near-dup pair set.

    Every document gets (comp_id, comp_size, keep): singletons are their
    own component, keep=1 marks the canonical doc per group — the rows a
    dedup pipeline retains. Two selection policies:

    - ``score_col=None`` (default): keep the MINIMUM-ID member *present
      in the corpus* — stable under corpus growth (adding new copies
      never flips which old doc survives), the property incremental
      dedup relies on. The keeper is derived from the MATCHED rows'
      ``min(id)``, NOT the component's graph label: with a persisted
      pair index (operators/dedup.py incremental mode) edges can name
      docs since deleted, and a component whose minimum graph node is
      foreign would otherwise have ZERO keepers — a ``keep == 1``
      filter would silently drop every surviving copy of that content
      (round-11 verdict hazard, fixed round 12);
    - ``score_col='...'``: keep the HIGHEST-SCORING member (ties break
      to min id) — quality-preserving canonical selection (RefinedWeb
      keeps the longest URL-duplicate, pipelines keep the best-quality
      near-dup). NULL scores sort last, so a scored doc always beats an
      unscored one. Costs one extra rank window over the SAME
      comp-partitioned exchange the size count already pays.

    The corpus never shuffles (round-11 restructure, measured −18% on
    the cc_flags stage at identical output — scripts/
    bench_cc_flags_ab.py): sizes and the scored winner are computed on
    the MATCHED rows only (docs ⋈ labels, |nodes-in-pairs| rows — the
    label table is tiny relative to the corpus) and joined back as
    per-component aggregates the optimizer broadcasts; singletons
    default to size 1 / keep themselves row-locally. The previous form
    ran ``count().over(partitionBy(comp_id))`` (+ a rank window when
    scored) over the FULL corpus — a corpus-wide exchange+sort for
    values derivable from the small side, and the second-largest dedup
    stage at 100 TB posture. Pass precomputed ``labels``
    (connected_components output) to label the same graph under BOTH
    policies without re-running the iterative propagation — the CC
    loop is the dominant cost of this operator.

    ``docs`` is scanned twice (the matched aggregate and the labeling
    join) — two cheap columnar scans instead of one corpus-wide
    shuffle+sort. If ``docs`` is an expensive lazy lineage rather than
    a table scan, localCheckpoint it first (the CC-loop labels are
    already checkpointed per round).
    """
    from pyspark.sql import Window as W

    cc = labels if labels is not None else connected_components(
        edges, src=src, dst=dst
    )
    carry = [F.col(score_col)] if score_col else []
    # matched = only the docs that appear in the pair graph: sizes
    # count DOCS per component (exactly what the corpus window
    # counted — a label node absent from the corpus contributes no
    # size, a doc absent from the graph is a singleton)
    matched = (
        docs.select(F.col(id_col), *carry)
        .join(cc, docs[id_col] == cc["node"])
        .select(F.col(id_col), *carry, F.col("comp"))
    )
    # __min_id: the minimum SURVIVING doc id per component — the
    # default-policy keeper. Computed from matched rows (not the graph
    # label) so a component whose min graph node is foreign still
    # keeps its minimum surviving doc, symmetric with the scored
    # policy below which already derives its winner from matched.
    sizes = matched.groupBy("comp").agg(
        F.count(F.lit(1)).alias("__sz"),
        F.min(F.col(id_col)).alias("__min_id"),
    )
    if score_col is not None:
        # winner per component, over the matched rows only (the rank
        # window the old form ran corpus-wide, now |nodes| rows):
        # highest score, NULLs last, ties to min id
        w = W.partitionBy("comp").orderBy(
            F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
        )
        winners = (
            matched.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("comp"), F.col(id_col).alias("__win_id"))
        )
        sizes = sizes.join(winners, "comp")
    labeled = (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("comp_id"),
        )
        .join(sizes, F.col("comp_id") == sizes["comp"], "left")
    )
    if score_col is None:
        # coalesce: singletons (no matched row -> __min_id NULL) keep
        # themselves row-locally, same shape as the scored branch
        keep = (
            F.col(id_col) == F.coalesce("__min_id", F.col(id_col))
        ).cast("int")
    else:
        keep = (
            F.col(id_col) == F.coalesce("__win_id", F.col(id_col))
        ).cast("int")
    return labeled.select(
        F.col(id_col),
        "comp_id",
        F.coalesce("__sz", F.lit(1)).cast("long").alias("comp_size"),
        keep.alias("keep"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 10,
    damping: float = 0.85,
    directed: bool = True,
    agg_scale: int = 14,
) -> DataFrame:
    """PageRank over an edge list — the link-centrality quality prior
    crawl curation uses (Common Crawl publishes harmonic/PageRank host
    rankings; CCNet/RefinedWeb-class pipelines consume them as source
    priors). Over a NEAR-DUP graph the same iteration scores
    template-hubness: boilerplate that near-matches many documents
    accumulates rank, which makes high-rank nodes the "template hubs"
    worth inspecting before a keep-one-per-component dedup.

    Returns (node, rank) for every node in ``edges``; ranks sum to 1
    up to dangling/teleport arithmetic. ``directed=False`` symmetrizes
    first. Parallel duplicate edges collapse (``distinct``) — rank
    flows along the relation, not its multiplicity.

    Fixed-``iterations`` power iteration (the distributed-practice
    form; convergence monitoring would add a per-round driver scalar
    like connected_components' — callers wanting it run twice and
    diff). Per round:

      r'(v) = (1-d)/N + d·( Σ_{u→v} r(u)/deg(u) + dangling/N )

    DETERMINISM (the k-means/classifier mechanism): each edge's
    contribution r(u)/deg(u) is computed element-wise in DOUBLE
    (deterministic per edge), then CAST to DECIMAL(38,``agg_scale``)
    and summed — decimal addition is exact and order-free, so the
    result is bit-identical under any partitioning, and a SQL twin
    replaying the same per-edge doubles gets the same sums. All
    remaining per-node arithmetic is scalar double ops in a fixed
    order.

    Scale shape: one groupBy(dst) exchange + one broadcast-able rank
    join per round over the (checkpointed) edge list; the dangling
    term is a 1-row aggregate cross-joined back (never a driver
    round-trip); ranks localCheckpoint each round (iterative-plan
    truncation, as connected_components)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    dec = f"decimal(38,{agg_scale})"
    e = edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    outd = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    base = (
        nodes.join(outd, nodes["node"] == outd["u"], "left")
        .select("node", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = base.count()
    if n == 0:
        # empty graph (e.g. a clean corpus with zero near-dup pairs):
        # an empty labeled frame, never a ZeroDivisionError
        return base.select("node", F.lit(0.0).alias("rank"))
    rank = base.select("node", "deg", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    for _ in range(iterations):
        dang = rank.filter(F.col("deg") == 0).agg(
            F.coalesce(
                F.sum(F.col("rank").cast(dec)), F.lit(0).cast(dec)
            ).alias("__dang")
        )
        contrib = (
            rank.filter(F.col("deg") > 0)
            .join(e, rank["node"] == e["u"])
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("deg").cast("double")).cast(dec).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("__s"))
        rank = (
            base.join(sums, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__s"), F.lit(0).cast(dec)).cast("double")
                        + F.col("__dang").cast("double") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select("node", "rank")
