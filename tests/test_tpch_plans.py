"""Plan-shape contracts for the TPC-H-shape inventory closer
(q157-q166): the scale claims each docstring makes — pushed filters,
broadcast dimensions, map-side partial aggregation, single fact scan on
the persisted double-reference aggregates, no global windows, no
unsanctioned cartesians — asserted against the physical plan so a
regression fails CI (same pattern as test_plan_contracts)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.test_plan_contracts import fresh, plan_of

TPCH_NEW = (
    "q157_pricing_summary", "q158_forecast_revenue",
    "q159_volume_shipping", "q160_product_type_profit",
    "q161_late_line_priority", "q162_customer_order_distribution",
    "q163_top_supplier", "q164_disjunctive_revenue",
    "q165_dominant_part_suppliers", "q166_brand_value_share",
)


@pytest.fixture(scope="module")
def plans(spark):
    return {n: plan_of(fresh(n)(spark, SF_SMOKE)) for n in TPCH_NEW}


def test_no_global_windows_or_cartesians(plans):
    """None of the ten shapes uses a window at all, and the only
    nested-loop join is q166's sanctioned 1-row scalar broadcast."""
    for name, plan in plans.items():
        assert "windowspecdefinition" not in plan, name
        assert "CartesianProduct" not in plan, name
        if name != "q166_brand_value_share":
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_q157_single_scan_partial_agg_pushed_date(plans):
    """Q1 shape: one fact scan, the ship-date filter pushed into the
    scan, and every aggregate map-side partial before the one
    exchange."""
    plan = plans["q157_pricing_summary"]
    assert plan.count("lineitem.parquet") == 1
    assert "partial_sum" in plan
    # the date filter reaches the scan node (hot-table cache scan at
    # SF_SMOKE; PushedFilters on a cold parquet scan)
    assert "l_shipdate" in plan.split("(5) Filter")[0]


def test_q158_scan_level_predicates_one_row(plans):
    """Q6 shape: zero joins, quantity predicate at the scan, one
    single-partition exchange for the global aggregate."""
    plan = plans["q158_forecast_revenue"]
    assert "Join" not in plan
    assert plan.count("lineitem.parquet") == 1
    assert "24.0" in plan  # l_quantity < 24 present pre-aggregate
    assert plan.count("Exchange") <= 2  # tree + detail of the one agg


def test_q159_two_nation_roles_broadcast(plans):
    """Q7 shape: nation joined twice, both roles broadcast; the
    cross-role pair disjunction survives into the plan."""
    plan = plans["q159_volume_shipping"]
    # both role projections exist (the shared cached nation relation
    # prints once, so count aliases, not parquet paths)
    assert "supp_nation" in plan and "cust_nation" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "NATION_1" in plan and "NATION_2" in plan


def test_q160_like_prunes_part_before_broadcast(plans):
    """Q9 shape: the p_name LIKE filter sits under part's broadcast
    exchange — the dimension is pruned before it ships."""
    plan = plans["q160_product_type_profit"]
    assert "widget" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1


def test_q161_date_residual_inside_join(plans):
    """Q12 shape: the 45-day lateness predicate is a join residual
    (evaluated during the probe), not a post-join filter."""
    plan = plans["q161_late_line_priority"]
    cond_lines = [l for l in plan.splitlines()
                  if "Join condition" in l and "l_shipdate" in l]
    assert cond_lines, "date predicate not in the join condition"


def test_q162_outer_join_preserved_filter_on_build_side(plans):
    """Q13 shape: the LEFT OUTER survives (zero-order customers kept)
    and the priority filter sits on the orders side below the join."""
    plan = plans["q162_customer_order_distribution"]
    assert "LeftOuter" in plan
    assert "4-NOT SPECIFIED" in plan.split("Join LeftOuter")[-1]


def test_q163_q165_q166_single_fact_scan_via_persist(plans):
    """The three double-reference aggregates (scalar max, per-part
    total, global total) re-read the PERSISTED grain-reduced frame —
    exactly one lineitem scan each, not one per reference."""
    for name in ("q163_top_supplier", "q165_dominant_part_suppliers",
                 "q166_brand_value_share"):
        assert plans[name].count("lineitem.parquet") == 1, name


def test_q164_disjunction_with_broadcast_part(plans):
    """Q19 shape: part broadcasts; all three brand blocks survive in
    one disjunctive predicate; no fallback to sort-merge."""
    plan = plans["q164_disjunctive_revenue"]
    assert "BroadcastHashJoin" in plan
    for b in ("Brand#1", "Brand#2", "Brand#3"):
        assert b in plan
    assert "SortMergeJoin" not in plan


def test_q166_scalar_total_is_single_row_broadcast(plans):
    """Q11 shape: the global-total comparison is a 1-row broadcast
    nested-loop (the sanctioned scalar pattern), and the integer
    cross-multiplied threshold survives into the filter."""
    plan = plans["q166_brand_value_share"]
    assert "BroadcastNestedLoopJoin" in plan
    assert "1000" in plan and "25" in plan
