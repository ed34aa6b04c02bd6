"""Per-stage CPU/byte profile of a single headline query (optimization
rounds): run the query once warm via the noop sink, then dump every
executed stage's executorCpuTime / executorRunTime / shuffle bytes /
spill, ordered by CPU, with the stage name (the operator line the
stage boundary landed on). Stage metrics via the UI REST API, latest
attempt per stage (same hygiene as tools/shuffle_probe.py).

Usage: python tools/stage_profile.py <query_name> [sf_dir] [runs]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stock_data_pipeline_spark import queries as _q  # noqa: E402
from stock_data_pipeline_spark.session import ensure_engine_confs, get_session  # noqa: E402
from tools.shuffle_probe import _completed, _latest_attempts  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = ensure_engine_confs(
        get_session(
            "stage-profile",
            extra_confs={
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "4000",
            },
        )
    )
    fn = _q.REGISTRY[name].fn
    # warm: JIT + codegen on the small fixture
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    before = _latest_attempts(_completed(spark))
    import time

    t0 = time.perf_counter()
    for _ in range(runs):
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _latest_attempts(_completed(spark))
    new = {sid: st for sid, st in after.items() if sid not in before}
    rows = sorted(
        new.values(), key=lambda s: s.get("executorCpuTime", 0), reverse=True
    )
    tot_cpu = sum(s.get("executorCpuTime", 0) for s in rows) / 1e9
    tot_run = sum(s.get("executorRunTime", 0) for s in rows) / 1e3
    print(f"\n{name}  runs={runs}  wall={wall:.2f}s  "
          f"sum(executorCpuTime)={tot_cpu:.2f}s  sum(executorRunTime)={tot_run:.2f}s  "
          f"stages={len(rows)}")
    print(f"{'stage':>6} {'cpu_s':>8} {'run_s':>8} {'tasks':>6} {'in_MB':>8} "
          f"{'shW_MB':>8} {'shR_MB':>8} {'spill_MB':>8}  name")
    for s in rows[:25]:
        print(
            f"{s['stageId']:>6} "
            f"{s.get('executorCpuTime', 0) / 1e9:>8.2f} "
            f"{s.get('executorRunTime', 0) / 1e3:>8.2f} "
            f"{s.get('numCompleteTasks', 0):>6} "
            f"{s.get('inputBytes', 0) / 1e6:>8.1f} "
            f"{s.get('shuffleWriteBytes', 0) / 1e6:>8.1f} "
            f"{s.get('shuffleReadBytes', 0) / 1e6:>8.1f} "
            f"{(s.get('memoryBytesSpilled', 0) + s.get('diskBytesSpilled', 0)) / 1e6:>8.1f}  "
            f"{(s.get('name') or '')[:70]}"
        )


if __name__ == "__main__":
    main()
