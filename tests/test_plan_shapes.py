"""Registry-wide physical-plan hygiene: no query may plan a true
CartesianProduct. Every intentional cross join in the tree broadcasts a
tiny side (one-row aggregates, query sets, dimension stats), which Spark
plans as BroadcastNestedLoopJoin — cheap and bounded. A CartesianProduct
node means a join lost its keys or a broadcast hint regressed: the exact
failure mode that turns a working sf0.01 plan into a cluster-killer at
100 TB. Same for an unpartitioned Window over data-sized input (a
single-task operator) and row-at-a-time Python — all three asserted
registry-wide here. Complements tests/test_plan_hygiene.py (zero jobs at
plan time): that test proves plans BUILD lazily, this one proves they
build RIGHT.
"""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark.queries import REGISTRY

# Registry-wide sweep (1191 tests, ~half the old default suite's
# count): slow tier (r10 — see pytest.ini).
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


GUARD = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "BroadcastExchange",  # broadcast => proven under the size threshold
)
SCAN = ("Scan parquet",)


def _walk_plan(node, on_window, on_scan, guarded=False):
    """DFS over a physical plan. Descends AdaptiveSparkPlan wrappers
    and InMemoryTableScan cached plans; tracks whether the current
    path has passed a row-bounding node (aggregate / limit /
    broadcast)."""
    nm = node.nodeName()
    if nm == "AdaptiveSparkPlan":
        try:
            _walk_plan(node.executedPlan(), on_window, on_scan, guarded)
        except Exception:
            _walk_plan(node.initialPlan(), on_window, on_scan, guarded)
        return
    if nm.startswith(SCAN):
        on_scan(nm, guarded)
        return
    if nm.startswith("InMemoryTableScan"):
        # a cached relation re-plays its cached plan: keep walking it,
        # because the cache boundary itself bounds nothing
        try:
            _walk_plan(node.relation().cachedPlan(), on_window, on_scan, guarded)
        except Exception:
            on_scan(nm, guarded)
        return
    if nm == "Window":
        on_window(node)
    if nm.startswith(GUARD):
        guarded = True
    ch = node.children()
    for i in range(ch.length()):
        _walk_plan(ch.apply(i), on_window, on_scan, guarded)
    # subqueries are scalar/broadcast-bounded — not data-sized inputs
    # of the node they hang off, so they don't need the window check


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_unguarded_global_window(spark, name):
    """SCALE.md §4-5 discipline, machine-checked (r05 verdict item 4):
    an unpartitioned Window is Spark's one single-task operator —
    every input row moves to ONE partition. It may therefore only ever
    consume a row-bounded input: every path from the Window node down
    to a parquet scan must pass an aggregation, a limit, or a
    broadcast (each bounds rows by construction). Data-sized global
    order statistics must instead use the two-phase bucketed prefix
    operators (operators/ranks.py). No exceptions are registered."""
    df = REGISTRY[name].fn(spark, SF)
    jplan = df._jdf.queryExecution().executedPlan()
    violations: list[str] = []

    def on_window(node) -> None:
        if not node.partitionSpec().isEmpty():
            return
        ch = node.children()
        for i in range(ch.length()):
            _walk_plan(
                ch.apply(i),
                lambda _n: None,
                lambda nm, g: None if g else violations.append(nm),
            )

    _walk_plan(jplan, on_window, lambda nm, g: None)
    assert not violations, (
        f"{name}: unpartitioned Window reads data-sized input "
        f"({violations}) — use operators/ranks.py bucketed prefixes"
    )


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
