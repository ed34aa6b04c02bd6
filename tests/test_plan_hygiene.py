"""Plan-construction hygiene: building any registry query's DataFrame
must be purely declarative — zero Spark jobs (no ``.first()`` dim
probes, no ``.collect()`` bounds lookups, no RDD conversions that
materialize). At 100 TB a hidden driver-side action per operator call
is an extra cluster round-trip before the real query even starts.
"""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# The documented exceptions: queries composing connected-components to
# convergence — an inherently iterative algorithm whose per-round
# checkpoint barrier + convergence test ARE Spark jobs (and must be:
# without the materialization barrier the unrolled plan grows ~4^rounds,
# see dedup.connected_components_fixed's caveat). q122 layers the
# canonical-selection argmax on q66's clusters, so it inherits the loop.
ITERATIVE = {"q66_dup_clusters", "q122_cluster_canonical", "q265_grid_dbscan", "q295_giant_component"}


@pytest.mark.slow  # 122 s: builds all 397 plans under a job-counting listener (r10 tier split)
def test_plan_construction_triggers_no_jobs(spark):
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    built = 0
    for name, spec in REGISTRY.items():
        if name in ITERATIVE:
            continue
        df = spec.fn(spark, SF)  # plan only — never an action
        assert df is not None, name
        built += 1
    after = set(tracker.getJobIdsForGroup(None))
    new = after - before
    assert not new, f"plan construction launched Spark jobs {sorted(new)} (built {built} plans)"
