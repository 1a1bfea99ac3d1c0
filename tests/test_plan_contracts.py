"""Plan-shape regression contracts for the bench's most expensive
queries (q40/q61/q68/q97/q141) plus the r5 top-k fixes (q91/q110) —
PLANS.md is generated documentation; these greps make the asserted
shapes FAIL CI if a plan regresses. Complements test_scale_contracts
(pushdown/pruning/broadcast on the relational core)."""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def fresh(name):
    """Un-memoized builder — plan contracts must inspect a newly built
    plan (see test_scale_contracts.fresh)."""
    from sunat_rree_demo_spark.queries import REGISTRY

    return REGISTRY[name].fn.__wrapped__


def assert_windows_partitioned(plan: str) -> None:
    """Every window spec carries a partition column: a global window's
    FIRST windowspecdefinition argument is its sort column (``hv ASC
    NULLS FIRST``), a partitioned one's is a bare column."""
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs, "no window in plan"
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            f"single-partition global window: "
            f"windowspecdefinition({first_arg}, …)")


def test_q40_pairs_reuse_shingle_cache_all_broadcast(spark):
    """q40: shingle arrays come from the session-materialized shingle
    table (r10: a warehouse parquet memo — the Python shingler must
    not appear in the serving plan at all), pair keys are 64-bit
    hashes (xxhash64), and no join falls back to sort-merge."""
    plan = plan_of(fresh("q40_ngram_jaccard_pairs")(spark, SF_SMOKE))
    assert "MapInPandas" not in plan  # shingler ran at memo-build time
    assert "shmemo_" in plan          # … serving reads the parquet memo
    assert "xxhash64" in plan
    assert "SortMergeJoin" not in plan


def test_q144_q146_project_pair_intersection_memo(spark):
    """q144/q146 (r11): both are per-row projections of the session
    pair-intersection memo — the serving plan is a parquet scan of the
    ``immemo_`` table plus filter/agg; neither the Python shingler nor
    the grouped pair emit (posexplode over shingle arrays) may appear."""
    for name in ("q144_containment_pairs",
                 "q146_cross_source_dup_matrix",
                 "q248_setsim_score_matrix"):
        plan = plan_of(fresh(name)(spark, SF_SMOKE))
        assert "MapInPandas" not in plan, name
        assert "immemo_" in plan, name
        assert "posexplode" not in plan, name


def test_q61_q68_cluster_output_reads_checkpoints(spark):
    """q61/q68: the returned plan reads the CHECKPOINTED loop state
    (Scan ExistingRDD) — lineage stays one round deep — and the final
    label/size joins broadcast, never sort-merge."""
    for name in ("q61_dup_clusters", "q68_dup_clusters_two_phase"):
        plan = plan_of(fresh(name)(spark, SF_SMOKE))
        assert "Scan ExistingRDD" in plan, name
        assert "SortMergeJoin" not in plan, name
    # q61's post-loop tail is small: one sizes aggregate + output sort
    # (bounded exchange count guards against reintroducing a shuffle
    # per loop round into the RETURNED plan)
    q61_plan = plan_of(fresh("q61_dup_clusters")(spark, SF_SMOKE))
    assert q61_plan.count("\n      Exchange") <= 8


def test_q97_ppjoin_filters_inside_candidate_join(spark):
    """q97: the PPJoin length filter (t·|x| ≤ |y| ≤ |x|/t, via the
    carried _sz sizes) must sit in the candidate JOIN condition —
    before the distinct — not as a post-hoc filter; candidates join on
    hashed keys; no sort-merge fallback."""
    plan = plan_of(fresh("q97_prefix_filter_pairs")(spark, SF_SMOKE))
    join_conds = [l for l in plan.splitlines()
                  if "Join condition" in l and "_sz" in l]
    assert join_conds, "length/positional filters not in the join"
    assert "0.8" in join_conds[0]
    assert "xxhash64" in plan
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" not in plan  # shared shingle memo, no re-shingle
    assert "shmemo_" in plan


def test_q110_global_topk_is_take_ordered(spark):
    """q110 (r5 fix): the global k-smallest-hash set plans as
    TakeOrderedAndProject (per-partition top-k, k-row merge), never a
    single-partition global-window sort."""
    plan = plan_of(fresh("q110_kmv_set_ops")(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition" not in plan


def test_q91_windows_all_partitioned(spark):
    """q91 (r5 fix): both k-min windows are partitioned — (flag, salt)
    then (flag) over ≤ k·salts candidate rows; no global window."""
    plan = plan_of(fresh("q91_kmv_distinct")(spark, SF_SMOKE))
    assert_windows_partitioned(plan)


def test_q141_attribution_windows_partitioned(spark):
    """q141: every attribution window is user-partitioned (the
    credit-split walk never funnels all events into one partition)."""
    plan = plan_of(fresh("q141_multi_touch_attribution")(spark, SF_SMOKE))
    assert_windows_partitioned(plan)
    assert "SortMergeJoin" not in plan


def test_q156_no_doc_grain_global_window(spark):
    """q156 (r6 fix): the decile comes from domain_rank +
    ntile_from_rank, not a doc-grain global ntile. Exactly one
    unpartitioned window survives — the distinct-value running count,
    whose frame is bounded by the 4dp surprisal DOMAIN — and it
    consumes the value-grain aggregate, never per-document rows."""
    plan = plan_of(fresh("q156_surprisal_yield_curve")(spark, SF_SMOKE))
    assert "ntile" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    unpartitioned = [s for s in specs
                     if " ASC" in s or " DESC" in s]
    assert len(unpartitioned) == 1, unpartitioned
    assert "avg_surprisal" in unpartitioned[0]
    # the window's input is the groupBy(avg_surprisal).count() frame
    assert re.search(r"Keys \[1\]: \[avg_surprisal#\d+\]", plan)


def test_memo_dir_name_injective_under_sanitizing():
    """r11 (advice fix): 'sf0.1' and 'sf0_1' sanitize to the same stem —
    the raw-key hash suffix must keep their memo directories distinct,
    while identical keys still map to one path."""
    from sunat_rree_demo_spark.sources.catalog import _memo_dir_name

    a = _memo_dir_name("shmemo_docs", ("sf0.1", 5), "local_123")
    b = _memo_dir_name("shmemo_docs", ("sf0_1", 5), "local_123")
    assert a != b
    assert a == _memo_dir_name("shmemo_docs", ("sf0.1", 5), "local_123")
    assert a.endswith("_local_123")  # janitor reap shape preserved
