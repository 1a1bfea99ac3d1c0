"""Composed jobs over the operator library: KPI materialization
(plans.kpi), the SQL view layer (plans.views), data-QA invariants
(plans.qa), the insight narrative layer (plans.insights), EDA summary
(plans.eda), and the end-to-end pipeline (plans.pipeline)."""
