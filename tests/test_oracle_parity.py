"""Every registered query with an oracle must match DuckDB on the same
parquet — the local mirror of the driver's CORRECTNESS gate (row count +
sorted-column schema + order-insensitive values). Runs at sf0.001 for
speed; scripts/check_parity.py covers sf0.01."""

from __future__ import annotations

import pytest

from scripts.check_parity import compare
from tests.conftest import SF_SMOKE


def _registry():
    from sunat_rree_demo_spark.queries import REGISTRY
    return REGISTRY


@pytest.mark.parametrize("name", list(_registry()))
def test_query_matches_oracle(name, spark, duck):
    q = _registry()[name]
    sdf = q.fn(spark, SF_SMOKE)
    if q.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert sdf.columns
        assert sdf.count() >= 0
        return
    problems = compare(name, sdf, duck.sql(q.oracle))
    assert not problems, f"{name}: {problems[:5]}"
