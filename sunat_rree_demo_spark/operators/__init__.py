"""Operator inventory (SURVEY.md §2) — each operator a small, individually
testable DataFrame→DataFrame (or Column) combinator, Spark-first."""
