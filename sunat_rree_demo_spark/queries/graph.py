"""Graph analytics over the trade network (extends the q61/q68/q82
component/census family): PageRank on the supplier-nation →
customer-nation trade-value graph, UNROLLED to a fixed iteration count
so the whole computation is one declarative plan with a full SQL oracle
— the complement of the convergence-driven connected-components
operators (which need a driver loop).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.queries.base import register, t

#: fixed power-iteration count (unrolled in both engines).
PR_ITERS = 6
#: damping factor.
PR_D = 0.85
#: rank unit: ranks live as integer 1e-12 units so per-iteration sums
#: are exact and addend-order free (the q74 discipline, applied to an
#: iterative algorithm).
_UNIT = 1_000_000_000_000.0

#: shared edge CTEs: trade cents between supplier nation and customer
#: nation, out-normalized to transition weights.
_EDGE_CTE = """
    base AS (
      SELECT sn.n_name AS src, cn.n_name AS dst,
             CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
    ),
    eg AS (
      SELECT src, dst, CAST(sum(cents) AS BIGINT) AS cents
      FROM base GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst,
             CAST(cents AS DOUBLE)
               / CAST(sum(cents) OVER (PARTITION BY src) AS DOUBLE) AS w
      FROM eg
    ),
    nodes AS (SELECT n_name AS nation FROM nation),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)
"""


def _pagerank_oracle() -> str:
    """r0..r{K} CTEs — the power iteration unrolled in SQL, integer
    rank units, generated from the same constants as the Spark plan."""
    steps = [f"""
    r0 AS (
      SELECT nation, CAST(round({_UNIT} / n) AS BIGINT) AS u
      FROM nodes, nn
    )"""]
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""
    r{k} AS (
      SELECT nd.nation,
             CAST(round({(1.0 - PR_D) * _UNIT} / n) AS BIGINT)
               + CAST(round({PR_D} * coalesce(s.c, 0)) AS BIGINT) AS u
      FROM nodes nd
      LEFT JOIN (
        SELECT e.dst AS nation,
               sum(CAST(round(r.u * e.w) AS BIGINT)) AS c
        FROM edges e JOIN r{k - 1} r ON e.src = r.nation
        GROUP BY e.dst
      ) s ON nd.nation = s.nation, nn
    )""")
    return f"""
    WITH {_EDGE_CTE},
    {",".join(steps)}
    SELECT nation, u AS rank_u,
           round(u / {_UNIT}, 8) AS rank
    FROM r{PR_ITERS}
    ORDER BY rank_u DESC, nation
    """


# --------------------------------------------------------------------- q104
@register(
    "q104_trade_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank"),
)
def q104_trade_pagerank(spark, sf_dir):
    """PageRank over the nation-to-nation trade-value graph (damping
    0.85, 6 unrolled power iterations): which nations the trade network
    concentrates on. Dangling mass (a nation with no out-edges) leaks
    rather than redistributing — the same simplification on both sides,
    documented, since the oracle must be plain SQL.

    Determinism: ranks are integer 1e-12 units; every per-edge
    contribution rounds to an integer BEFORE the per-node sum, so the
    iteration is exact integer arithmetic fed by identical doubles
    (edge weights divide exact cent integers) — 6 iterations cannot
    accumulate engine drift.

    Scale shape: the fact scan collapses to the (src, dst) edge
    aggregate — |nations|² bounded forever — and each iteration is one
    broadcast-size join + aggregate over that tiny frame; the expensive
    part (edge build: two fact joins) happens ONCE. At a 100 TB fact
    volume the edge build shuffles on l_orderkey then (src, dst) with
    map-side combine; iterations stay constant-cost. Unrolling keeps
    the whole thing ONE lazy plan — no driver loop, no checkpoint, no
    convergence job (contrast q61/q68, where the round count is
    data-dependent)."""
    li, s, o, c = (t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "supplier"),
                   t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer"))
    n = t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("_sk"),
                  F.col("n_name").alias("src"))
    cn = n.select(F.col("n_nationkey").alias("_ck"),
                  F.col("n_name").alias("dst"))
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100, 0).cast("bigint")
    eg = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("_sk"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("_ck"))
        .groupBy("src", "dst").agg(F.sum(cents).alias("cents"))
    )
    edges = eg.select(
        "src", "dst",
        (F.col("cents").cast("double")
         / F.sum("cents").over(Window.partitionBy("src")).cast("double"))
        .alias("w"))
    nodes = n.select(F.col("n_name").alias("nation"))
    nn = nodes.agg(F.count("*").cast("bigint").alias("n"))
    r = (nodes.join(F.broadcast(nn))
         .select("nation", F.round(F.lit(_UNIT) / F.col("n"), 0)
                 .cast("bigint").alias("u")))
    tele = F.round(F.lit((1.0 - PR_D) * _UNIT) / F.col("n"), 0).cast("bigint")
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(r.select(F.col("nation").alias("src"), "u"), "src")
            .select(F.col("dst").alias("nation"),
                    F.round(F.col("u") * F.col("w"), 0)
                    .cast("bigint").alias("c"))
            .groupBy("nation").agg(F.sum("c").alias("c"))
        )
        r = (nodes.join(contrib, "nation", "left")
             .join(F.broadcast(nn))
             .select("nation",
                     (tele + F.round(PR_D * F.coalesce(F.col("c"), F.lit(0)),
                                     0).cast("bigint")).alias("u")))
    return (
        r.select("nation", F.col("u").alias("rank_u"),
                 F.round(F.col("u") / _UNIT, 8).alias("rank"))
        .orderBy(F.desc("rank_u"), "nation")
    )


# --------------------------------------------------------------------- q177
_LPA_ROUNDS = 3
_LPA_SUPPORT = 3


def _lpa_round_cte(i: int) -> str:
    return f"""
    l{i} AS (
      SELECT a AS node, label FROM (
        SELECT e.a, l.label, sum(e.support) AS s,
               row_number() OVER (PARTITION BY e.a
                                  ORDER BY sum(e.support) DESC, l.label)
                 AS rn
        FROM e JOIN l{i - 1} l ON l.node = e.b
        GROUP BY e.a, l.label) WHERE rn = 1)"""


@register(
    "q177_copurchase_communities",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
      SELECT a.l_partkey AS p1, c.l_partkey AS p2,
             CAST(count(*) AS BIGINT) AS support
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_LPA_SUPPORT}),
    e AS (
      SELECT p1 AS a, p2 AS b, support FROM p
      UNION ALL
      SELECT p2, p1, support FROM p),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM e),
    {",".join(_lpa_round_cte(i) for i in range(1, _LPA_ROUNDS + 1))}
    SELECT label AS community, count(*) AS n_members
    FROM l{_LPA_ROUNDS}
    GROUP BY label HAVING count(*) >= 2
    ORDER BY n_members DESC, community
    """,
    tags=("graph", "community-detection"),
)
def q177_copurchase_communities(spark, sf_dir):
    """Product communities in the co-purchase graph: q115's edge set
    (part pairs co-ordered in ≥ 3 baskets, support-weighted) under 3
    synchronous label-propagation rounds
    (operators.components.label_propagation — frequency vote, ties to
    the smallest label), reported as the ≥2-member community census.
    The merchandising view: clusters of products that sell together,
    tighter than connected components (a weak bridge pair does not
    merge two dense clusters the way CC would).

    Scale shape: basket self-join fan-out is C(basket, 2) per order;
    each LPA round is one labels-join + one map-side-combinable vote
    aggregate + a per-node argmax window — lazily composed, no driver
    round-trips. The oracle unrolls the identical rounds as CTEs."""
    from sunat_rree_demo_spark.operators.components import label_propagation

    li = t(spark, sf_dir, "lineitem")
    bk = li.select("l_orderkey", "l_partkey").distinct()
    a = bk.select("l_orderkey", F.col("l_partkey").alias("p1"))
    c = bk.select("l_orderkey", F.col("l_partkey").alias("p2"))
    edges = (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= _LPA_SUPPORT)
        .select(F.col("p1").alias("id1"), F.col("p2").alias("id2"),
                "support")
    )
    labels = label_propagation(edges, rounds=_LPA_ROUNDS,
                               weight_col="support")
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= 2)
        .orderBy(F.desc("n_members"), "community")
    )


# --------------------------------------------------------------------- q197
_PR_ROUNDS = 5
_PPR_SEED_REGION = "AMERICA"
_PR_EDGE_SQL = f"""
    e AS (
      SELECT s_nationkey AS src, c_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM e GROUP BY 1),
    seed AS (
      SELECT n_nationkey AS node,
             CASE WHEN r_name = '{_PPR_SEED_REGION}' THEN 1 ELSE 0 END
               AS is_seed
      FROM nation JOIN region ON n_regionkey = r_regionkey
    ),
    r0 AS (SELECT node, CAST(1000000 * is_seed AS BIGINT) AS r FROM seed)"""


def _ppr_oracle_sql(rounds: int = _PR_ROUNDS) -> str:
    """Unrolled integer personalized-PageRank rounds as CTEs (the q167
    unrolled-Lloyd device): every engine computes identical int64
    quotients."""
    ctes = [_PR_EDGE_SQL]
    for k in range(1, rounds + 1):
        ctes.append(f"""
    c{k} AS (
      SELECT e.dst AS node,
             CAST(sum((p.r * e.w) // ow.tw) AS BIGINT) AS c
      FROM e JOIN ow USING (src) JOIN r{k - 1} p ON p.node = e.src
      GROUP BY 1
    ),
    r{k} AS (
      SELECT s.node,
             CAST(150000 * s.is_seed + (85 * COALESCE(c.c, 0)) // 100
                  AS BIGINT) AS r
      FROM seed s LEFT JOIN c{k} c USING (node)
    )""")
    return f"""
    WITH {",".join(ctes)}
    SELECT n.n_name AS nation, s.is_seed = 1 AS in_seed,
           r.r AS rank_micro
    FROM r{rounds} r
    JOIN seed s ON r.node = s.node
    JOIN nation n ON r.node = n.n_nationkey
    ORDER BY rank_micro DESC, nation
    """


@register(
    "q197_personalized_pagerank",
    oracle=_ppr_oracle_sql(),
    tags=("graph", "pagerank", "personalized", "iterative"),
)
def q197_personalized_pagerank(spark, sf_dir):
    """PERSONALIZED PageRank / random-walk-with-restart over the
    nation trade-volume graph (supplier nation -> customer nation,
    edge weight = line count): the teleport vector is the AMERICA-
    region seed set, so ranks answer "which nations does trade mass
    flow to FROM the Americas" — the recommendation/expansion query
    (Page et al. 1999 §6; RWR in graph recsys), distinct from q104's
    global PageRank both in formulation (restart to a seed set, not
    uniform) and in weighting (line counts vs trade value). 5 damped
    rounds in EXACT int64 micro-units: contribution floor(r·w/out_w),
    update 0.15·seed + 0.85·Σ as integer quotients — bit-reproducible
    on every engine and partitioning.

    Scale shape: ONE fact scan builds the edge aggregate (map-side
    combine to src×dst grain — node²-bounded, tiny); every round is a
    join + aggregate at edge/node grain, lazily composed (no per-round
    actions, builder stays pure, plan depth = rounds). At 100 TB the
    fact scan dominates; iteration cost is independent of fact volume.
    At web-graph node counts the same loop runs with the node frame
    persisted per round (the q61/q68 policy) — here frames are
    25 rows."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    rg = t(spark, sf_dir, "region")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("src"),
                 F.col("c_nationkey").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    ow = e.groupBy("src").agg(F.sum("w").cast("bigint").alias("tw"))
    ew = e.join(ow, "src")
    seed = (n.join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey)
            .select(F.col("n_nationkey").alias("node"),
                    F.when(F.col("r_name") == _PPR_SEED_REGION, 1)
                    .otherwise(0).alias("is_seed")))
    r = seed.select(
        "node", (F.lit(1000000) * F.col("is_seed")).cast("bigint")
        .alias("r"))
    for _ in range(_PR_ROUNDS):
        contrib = (
            ew.join(r.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    F.expr("(r * w) div tw").alias("ct"))
            .groupBy("node").agg(F.sum("ct").alias("c"))
        )
        r = (seed.join(contrib, "node", "left")
             .select("node",
                     (F.lit(150000) * F.col("is_seed")
                      + F.expr("(85 * coalesce(c, CAST(0 AS BIGINT))) "
                               "div 100")).cast("bigint").alias("r")))
    return (
        r.join(F.broadcast(seed), "node")
        .join(F.broadcast(n), r.node == n.n_nationkey)
        .select(F.col("n_name").alias("nation"),
                (F.col("is_seed") == 1).alias("in_seed"),
                F.col("r").alias("rank_micro"))
        .orderBy(F.desc("rank_micro"), "nation")
    )
