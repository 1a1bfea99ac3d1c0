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
