"""Registry-wide physical-plan hygiene: no query may plan a true
CartesianProduct. Every intentional cross join in the tree broadcasts a
tiny side (one-row aggregates, query sets, dimension stats), which Spark
plans as BroadcastNestedLoopJoin — cheap and bounded. A CartesianProduct
node means a join lost its keys or a broadcast hint regressed: the exact
failure mode that turns a working sf0.01 plan into a cluster-killer at
100 TB. Complements tests/test_plan_hygiene.py (zero jobs at plan time):
that test proves plans BUILD lazily, this one proves they build RIGHT.
"""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_row_at_a_time_python(spark, name):
    """Registry-wide: Python may appear ONLY as Arrow-batched
    mapInPandas/grouped-pandas nodes (the sequential recurrences and
    multimodal decode). BatchEvalPython (row-at-a-time pickled UDF —
    the 10-100x slow path) and ArrowEvalPython (scalar pandas UDF —
    none registered by design; every scalar expression is a JVM
    expression) must never plan anywhere."""
    df = REGISTRY[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time Python UDF"
    assert "ArrowEvalPython" not in plan, f"{name} plans a scalar Python UDF"
