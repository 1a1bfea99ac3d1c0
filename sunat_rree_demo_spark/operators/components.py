"""Connected components over an undirected edge list — duplicate
*clustering*, the step after pairwise near-dup detection (the reference
stops at pairs; a production dedup pipeline groups pairs into clusters
and keeps one representative per cluster, cf. q61/q65).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round replaces a node's label with the minimum label
in its closed neighborhood; convergence when no label changes. Rounds
needed = the maximum component diameter. Near-dup graphs are
star-or-clique-shaped (a handful of versions of one document), so the
diameter is small and 2-4 rounds settle the labels; for genuinely
high-diameter graphs (web link graphs) the alternating large-star /
small-star scheme of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14), converges in O(log² n) rounds with the
same per-round join shape and would slot in here unchanged.

Scale design: each round is one shuffle — join labels to the symmetric
edge list on the destination, min-aggregate per source, join back. The
edge list and labels are localCheckpointed so the lineage stays one
round deep (an unchecked loop would replay every prior round each
iteration and blow the plan up exponentially). State per round is
O(nodes + edges); the convergence check rides the label join as a
count, one cheap job per round over checkpointed inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "id1",
                         dst: str = "id2", max_rounds: int = 50) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id in the node's connected component.

    The loop is documented-eager (one count job per round): callers
    register queries built on it with ``memoize=False``.
    """
    # checkpoint the RAW edge projection first: the symmetric union
    # references the edge plan from two branches, so building sym
    # straight off `edges` would compute the (expensive — e.g. the
    # Python-shingled near-dup pair pipeline) upstream plan twice in
    # one job. One eager checkpoint = upstream runs exactly once.
    #
    # r12 note (attempted and REVERTED): a closed-neighborhood variant
    # — self rows flagged into the adjacency so ONE join+aggregate per
    # round replaces join+aggregate+join — produced identical labels
    # and measured ~15% faster on q61's input, but its fatter
    # adjacency (4 unions + flag) pushes Spark's size-only INNER-join
    # estimate (left×right product) past the broadcast threshold even
    # for tiny graphs, flipping the callers' downstream label/size
    # joins to static SortMergeJoin (the plan contract
    # tests/test_plan_contracts.py pins BHJ there). The two-join round
    # below keeps the second join LEFT OUTER, whose size estimate does
    # not product-explode.
    raw = edges.select(F.col(src).alias("a"),
                       F.col(dst).alias("b")).localCheckpoint()
    sym = (
        raw.union(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # seed with the closed-neighborhood min — exactly the result of a
    # first identity-label round, one round (join + count job) cheaper.
    # This eager checkpoint is the first action through sym, so the lazy
    # sym checkpoint materializes inside the same job.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("b"), F.min("a")).alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("b"),
                                   F.col("comp").alias("nbr_comp")), "b")
            .groupBy("a").agg(F.min("nbr_comp").alias("nbr_min"))
        )
        proposed = (
            labels.join(nbr_min.select(F.col("a").alias("node"), "nbr_min"),
                        "node", "left")
            .select("node",
                    F.col("comp").alias("old_comp"),
                    F.least("comp", F.coalesce("nbr_min", "comp"))
                    .alias("comp"))
            # lazy: the changed-count below is the first action, so it
            # materializes the checkpoint and checks convergence in the
            # SAME job (the eager form paid two jobs per round)
            .localCheckpoint(eager=False)
        )
        changed = proposed.filter(F.col("comp") != F.col("old_comp")).count()
        labels = proposed.select("node", "comp")
        if changed == 0:
            return labels
    # no-silent-caps: unconverged labels are WRONG labels — fail loudly
    # rather than hand back split components (raise max_rounds, or use
    # connected_components_two_phase for diameter > max_rounds graphs)
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        f"(component diameter exceeds max_rounds)")


def _is_star_forest(E: DataFrame) -> bool:
    """True iff the canonical edge list is a disjoint union of stars
    rooted at their component minima — the EXACT fixed point of the
    alternating large-star/small-star iteration (Kiveris et al.
    SoCC'14, Thm 1): LS and SS both map a min-rooted star forest to
    itself, and any non-star shape is changed by one of them.

    Shape test, one aggregate job over the 2|E| adjacency rows: every
    member (``b``) appears exactly once, and no node is both a root
    (``a``) and a member (``b``) — chains and doubly-attached members
    are the only canonical (a<b, distinct) violations. Canonical a<b
    already makes each root the min of its star. Testing the shape
    directly replaces the old fingerprint-equality rule, which could
    only detect convergence one full (large-star + small-star) round
    AFTER the fixed point was reached, plus an exceptAll confirmation —
    this check stops the loop the moment the shape appears and doubles
    as the structural precondition of the member/root extraction
    below."""
    adj = E.select(F.col("a").alias("node"),
                   F.lit(1).alias("ia"), F.lit(0).alias("ib"))         .union(E.select(F.col("b").alias("node"),
                        F.lit(0).alias("ia"), F.lit(1).alias("ib")))
    row = (adj.groupBy("node")
           .agg(F.max("ia").alias("ha"), F.max("ib").alias("hb"),
                F.sum("ib").alias("nb"))
           .agg(F.count_if((F.col("ha") + F.col("hb") == 2)
                           | (F.col("nb") > 1)).alias("bad"))
           .first())
    return row["bad"] == 0


def _canonical(df: DataFrame) -> DataFrame:
    """Undirected edge canon: (a < b), no self-loops, distinct."""
    return (df.select(F.least("a", "b").alias("a"),
                      F.greatest("a", "b").alias("b"))
            .filter(F.col("a") != F.col("b")).distinct())


def _adj(E: DataFrame) -> DataFrame:
    """Symmetric adjacency (u, v) of a canonical edge list."""
    return E.select(F.col("a").alias("u"), F.col("b").alias("v")) \
        .union(E.select(F.col("b").alias("u"), F.col("a").alias("v")))


def _large_star(E: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of each node to the min of
    its closed neighborhood."""
    adj = _adj(E)
    m = (adj.groupBy("u")
         .agg(F.least(F.min("v"), F.min("u")).alias("m")))
    return _canonical(
        adj.join(m, "u").filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b")))


def _small_star(E: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and the node itself) to the min
    of the node's smaller neighborhood."""
    smaller = _adj(E).filter(F.col("v") < F.col("u"))
    m = smaller.groupBy("u").agg(F.min("v").alias("m"))
    member_edges = smaller.join(m, "u").select(
        F.col("v").alias("a"), F.col("m").alias("b"))
    self_edges = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return _canonical(member_edges.union(self_edges))


def connected_components_two_phase(edges: DataFrame, src: str = "id1",
                                   dst: str = "id2",
                                   max_rounds: int = 100) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the high-diameter path: O(log² n) rounds regardless of
    component shape, where min-label propagation above needs
    O(diameter). Same output contract as ``connected_components``:
    (node, comp = min node of the component), nodes drawn from the edge
    list. Each phase is two shuffles (neighborhood min + emit); the
    edge set is localCheckpointed per round so lineage stays flat."""
    # one eager checkpoint of the raw edge projection: all_nodes and the
    # canonical E both read from it, so the upstream edge plan (e.g. the
    # near-dup pair pipeline) runs exactly once — the r3 form paid it
    # twice (once per eager checkpoint)
    raw = edges.select(F.col(src).alias("a"),
                       F.col(dst).alias("b")).localCheckpoint()
    # all_nodes is only read once, by the final singleton restore — a
    # rescan of the tiny checkpointed raw frame, no checkpoint needed
    all_nodes = (raw.select(F.col("a").alias("node"))
                 .union(raw.select(F.col("b").alias("node")))
                 .distinct())
    E = _canonical(raw).localCheckpoint(eager=False)
    for _ in range(max_rounds):
        # transform FIRST, then test: LS/SS map a star forest to
        # itself, so transforming an already-converged input is a
        # cheap identity and testing before the first transform would
        # cost one extra job on every real (non-star) input. The
        # star-forest test is the convergence rule AND the first
        # action through the round's lazy checkpoints, so transform,
        # checkpoint materialization, and shape check ride one job
        # per round. The large-star intermediate still checkpoints
        # (persist + lineage cut: _small_star reads it from three plan
        # branches, so an unpersisted LS would replicate its subtree
        # into every round's lineage); lazy materialization means at
        # worst a concurrently-scheduled stage recomputes an LS
        # partition before the persist lands — bounded by the three
        # in-job references, deterministic either way.
        E = _small_star(_large_star(E).localCheckpoint(eager=False)) \
            .localCheckpoint(eager=False)
        if _is_star_forest(E):
            break
    else:
        raise RuntimeError(
            f"connected_components_two_phase did not converge in "
            f"{max_rounds} rounds")
    # converged: every component is a star (root = min node); members
    # appear as b with a = root, roots only as a. Nodes whose every
    # edge was a self-loop vanished at canonicalization — restore them
    # as singleton components (same output contract as
    # connected_components, which keeps them).
    members = E.select(F.col("b").alias("node"), F.col("a").alias("comp"))
    linked = members.select("node").union(E.select(F.col("a").alias("node")))
    singletons = (all_nodes.join(linked.distinct(), "node", "left_anti")
                  .withColumn("comp", F.col("node")))
    roots = (E.select(F.col("a").alias("node"))
             .join(members.select("node"), "node", "left_anti")
             .distinct().withColumn("comp", F.col("node")))
    return members.union(roots).union(singletons)


def label_propagation(edges: DataFrame, rounds: int = 3,
                      weight_col: str | None = None) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, the LPA
    community-detection baseline) over an undirected (id1, id2[, w])
    edge list: every node starts as its own label; each round every
    node adopts the label with the highest total (weighted) neighbor
    vote, ties to the SMALLEST label — fully deterministic, unlike the
    textbook random-order variant, so the result is engine-checkable.
    Returns (node, label) after ``rounds`` synchronous updates.

    Distinct from the connected-components family above: CC merges
    anything reachable; LPA's frequency vote finds densely-connected
    communities INSIDE a component and stops label creep at weak cuts.

    Scale shape: each round is one shuffle — edges join the previous
    labels on the neighbor id (labels-sized side, AQE broadcasts when
    it fits), then a (node, label) vote aggregate with map-side
    combine and a per-node argmax window. The plan is lazily composed
    across rounds (no driver round-trips, no checkpoints needed at
    fixed small round counts — callers wanting convergence-driven
    stopping should reuse the two-phase CC's lineage discipline)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    w = (F.col(weight_col) if weight_col
         else F.lit(1)).cast("bigint").alias("_w")
    e = (edges.select(F.col("id1").alias("a"), F.col("id2").alias("b"), w)
         .union(edges.select(F.col("id2").alias("a"),
                             F.col("id1").alias("b"), w)))
    labels = (e.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    from pyspark.sql import Window

    for _ in range(rounds):
        votes = (e.join(labels.withColumnRenamed("node", "b"), "b")
                 .groupBy("a", "label")
                 .agg(F.sum("_w").alias("_s")))
        wa = Window.partitionBy("a").orderBy(F.col("_s").desc(), "label")
        labels = (votes.withColumn("_rn", F.row_number().over(wa))
                  .filter(F.col("_rn") == 1)
                  .select(F.col("a").alias("node"), "label"))
    return labels


def incremental_components(labels: DataFrame, new_edges: DataFrame,
                           node_col: str = "node",
                           comp_col: str = "comp",
                           src: str = "id1", dst: str = "id2") -> DataFrame:
    """INCREMENTAL connected components: update an existing
    (node, component) labeling with a batch of NEW edges without
    recomputing the whole graph — the cluster-maintenance half of the
    incremental dedup index (new near-dup pairs arrive per ingest
    batch; only the components they touch can change).

    Correctness device: an existing component is exactly reconstructed
    by its (node — component-label) star edges, so CC over
    ``new_edges ∪ star(affected components) ∪ identity(new nodes)``
    equals CC over the FULL original edge set plus the new edges,
    restricted to the affected part (test-pinned against a full
    recompute). Untouched components pass through verbatim.

    Scale shape: the touched-component discovery is two broadcast
    semi-joins (new-edge endpoints are batch-sized); the recompute runs
    ``connected_components`` on the affected SUBGRAPH only — star
    edges keep it O(affected nodes + new edges) regardless of how the
    rest of the graph has grown. Min-label stability means unaffected
    labels never churn, and a merge of two components adopts the
    smaller global min (consistent with a from-scratch run).
    Documented-eager like its base operator (per-round count jobs):
    register dependent queries with ``memoize=False``."""
    ends = (new_edges.select(F.col(src).alias(node_col))
            .union(new_edges.select(F.col(dst).alias(node_col)))
            .distinct().localCheckpoint())
    touched_comps = (labels.join(F.broadcast(ends), node_col, "left_semi")
                     .select(comp_col).distinct())
    affected = (labels.join(F.broadcast(touched_comps), comp_col,
                            "left_semi").localCheckpoint())
    # new nodes (absent from labels) enter through identity self-edges
    # so isolated-but-new endpoints still receive a label
    new_nodes = ends.join(labels, node_col, "left_anti")
    sub_edges = (
        new_edges.select(F.col(src).alias("id1"), F.col(dst).alias("id2"))
        .unionByName(affected.select(F.col(node_col).alias("id1"),
                                     F.col(comp_col).alias("id2")))
        .unionByName(new_nodes.select(F.col(node_col).alias("id1"),
                                      F.col(node_col).alias("id2")))
    )
    relabeled = connected_components(sub_edges)
    untouched = labels.join(F.broadcast(touched_comps), comp_col,
                            "left_anti")
    return untouched.unionByName(
        relabeled.select(F.col("node").alias(node_col),
                         F.col("comp").alias(comp_col)))
