"""Plan-shape contracts for the late round-5 additions: the range-join
family must never fall back to a nested loop, the k-means consumers
must reuse the session-persisted assignment instead of re-deriving it,
and the text/LID queries keep their broadcast + partial-agg shapes.
Same pattern as test_tpch_plans / test_plan_contracts — a silent plan
regression fails CI, not just the bench."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.test_plan_contracts import fresh, plan_of


@pytest.fixture(scope="module")
def plans(spark):
    names = (
        "q169_concurrent_sessions", "q171_vocab_kl_divergence",
        "q175_session_error_overlap", "q176_trigram_lang_id",
        "q177_copurchase_communities", "q178_sq8_quantization_error",
    )
    return {n: plan_of(fresh(n)(spark, SF_SMOKE)) for n in names}


def test_range_join_queries_never_nested_loop(plans):
    """The whole point of the bucketed range join: a BETWEEN/overlap
    join with no equi key must still plan as a hash/merge equi-join on
    the bucket id."""
    for name in ("q169_concurrent_sessions", "q175_session_error_overlap"):
        plan = plans[name]
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_vocab_grain_only_sanctioned_one_row_cross(plans):
    """q171/q176: the only nested loop allowed is the 1-row broadcast
    global-total join (the q51/q74 device); the token/trigram joins
    themselves are hash joins."""
    import re

    for name in ("q171_vocab_kl_divergence", "q176_trigram_lang_id"):
        plan = plans[name]
        assert "CartesianProduct" not in plan, name
        # at most one BroadcastNestedLoopJoin NODE (formatted explain
        # prints each node twice: tree line + numbered detail header,
        # so count the headers), and none at all for LID
        n_bnl = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
        limit = 1 if name == "q171_vocab_kl_divergence" else 0
        assert n_bnl <= limit, (name, n_bnl)


def test_lpa_rounds_compose_lazily(plans):
    """q177: three vote rounds must appear in ONE composed plan (no
    driver materialization between rounds) — three per-node argmax
    windows, each partitioned (no global window)."""
    import re

    from tests.test_plan_contracts import assert_windows_partitioned

    plan = plans["q177_copurchase_communities"]
    # one composed plan must carry all three rounds' argmax windows:
    # a per-round materialization would leave only the last round's
    # window in the final plan
    n_windows = len(re.findall(r"\(\d+\) Window\b", plan))
    assert n_windows >= 3, n_windows
    assert_windows_partitioned(plan)
    assert "CartesianProduct" not in plan


def test_sq8_dim_grain_broadcast_scales(plans):
    """q178: the per-dim scale table joins back via broadcast (64
    rows), never a shuffle of the exploded side onto the scales."""
    plan = plans["q178_sq8_quantization_error"]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_consumers_reuse_persisted_assignment(spark):
    """q168/q173 must read the session-memoized assignment
    (InMemoryTableScan), not re-run the fit's mapInPandas per query."""
    from sunat_rree_demo_spark.queries import REGISTRY

    # first touch materializes the fit once
    REGISTRY["q167_kmeans_census"].fn(spark, SF_SMOKE).collect()
    for name in ("q168_cluster_balanced_sample",
                 "q173_cluster_label_purity"):
        plan = plan_of(REGISTRY[name].fn.__wrapped__(spark, SF_SMOKE))
        assert "InMemoryTableScan" in plan, name
