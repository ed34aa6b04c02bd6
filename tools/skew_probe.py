"""Skew-resilience probe (r07 VERDICT item 4): the scaling curve
varies volume with UNIFORM keys; this tool measures the join-heavy
headliners on the zipf(1.2) fixture (tools/make_scale_fixture.py
--skew) against the same-size uniform fixture and records, per query:

- wall + JVM CPU at uniform vs skewed keys;
- the straggler profile of the worst stage (max task time vs median,
  via the Spark UI REST API — the only place per-task durations live);
- whether AQE's skew-join splitter fired (``skew=true`` in the final
  SMJ of the executed plan), at default thresholds, with the
  thresholds scaled to the fixture (a 256 MB skewedPartitionThreshold
  can never trip on a ~100 MB fixture; production data trips it at the
  SAME ratio these scaled values reproduce), with broadcast disabled
  (the production shuffle-join shape), and with
  ``forceOptimizeSkewedJoin`` — the last matters because plans that
  aggregate ON the join key (q90: groupBy(l_orderkey) after the
  l_orderkey SMJ) reuse the join's hash distribution, and
  OptimizeSkewedJoin reverts rather than break that reuse, so the
  splitter NEVER fires on them regardless of thresholds.

The queries and their skew exposure:
- q01/q90: lineitem⋈orders on l_orderkey — the zipf target; SMJ, so
  AQE skew-split is the designed mitigation (session factory enables
  spark.sql.adaptive.skewJoin).
- q81: range join — lineitem collapses to per-DAY rows BEFORE the
  join, so order-key skew never reaches an exchange.
- q25/q66: shingle equi-joins — the hot-sentence injection (df≈N/3)
  is absorbed by the df-ordered prefix filter (hot shingles are the
  COMMONEST, prefixes keep the RAREST ~20%); candidate counts are
  recorded to prove it stays near-linear.

Usage: python tools/skew_probe.py [out.json]
(expects .scale/sf0.3 and .scale/sf0.3-skew; ~10 min)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "q01_sector_calculated_price",
    "q90_shipping_priority",
    "q81_range_join",
    "q25_jaccard_pairs",
    "q66_dup_clusters",
]

UNIFORM = ".scale/sf0.3"
SKEWED = ".scale/sf0.3-skew"

# production-ratio AQE thresholds for a ~100 MB fixture: the DEFAULTS
# (256 MB threshold / 64 MB advisory) are sized for real clusters and
# cannot trip here; the RATIO (threshold ≈ 4-5x median partition) is
# what decides splitting, so scale both down together.
TUNED = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}", timeout=10) as r:
        return json.loads(r.read())


def _stage_ids(spark) -> set[int]:
    try:
        return {s["stageId"] for s in _rest(spark, "/stages?status=complete")}
    except Exception:
        return set()


def _straggler(spark, before: set[int]) -> dict:
    """Worst completed stage since ``before``: max vs median task run
    time (ms). max/p50 >> 1 on a data-sized stage = one reducer owns a
    hot key."""
    worst = {"stage": None, "max_ms": 0.0, "p50_ms": 0.0, "ratio": 0.0, "n_tasks": 0}
    try:
        stages = _rest(spark, "/stages?status=complete")
    except Exception:
        return worst
    for st in stages:
        sid = st["stageId"]
        if sid in before or st.get("numCompleteTasks", 0) < 2:
            continue
        try:
            q = _rest(
                spark,
                f"/stages/{sid}/{st['attemptId']}/taskSummary?quantiles=0.5,1.0",
            )
            p50, mx = q["executorRunTime"]
        except Exception:
            continue
        if mx > worst["max_ms"]:
            worst = {
                "stage": sid,
                "max_ms": round(mx, 1),
                "p50_ms": round(p50, 1),
                "ratio": round(mx / p50, 1) if p50 > 0 else float("inf"),
                "n_tasks": st.get("numCompleteTasks", 0),
            }
    return worst


def _last_sql_id(spark) -> int:
    # /sql returns executions in ASCENDING id order — length=1 would
    # return the OLDEST (id 0) forever, making every run after the
    # app's first skew split read as split. Fetch all, take the max.
    try:
        execs = _rest(spark, "/sql?length=100000&offset=0&details=false")
        return max((e["id"] for e in execs), default=-1)
    except Exception:
        return -1


def _skew_splits(spark, after_id: int) -> bool:
    """True iff any SQL execution newer than ``after_id`` ran a
    skew-split join. Read from the REST planDescription of the WRITE's
    own QueryExecution — ``df._jdf.queryExecution()`` is a different,
    never-executed QueryExecution (the noop save plans its own), so its
    AdaptiveSparkPlan stays isFinalPlan=false and reports the
    pre-execution template, never the runtime skew decision."""
    try:
        # ascending id order again: a small length window would pin to
        # the app's OLDEST executions and miss the run just finished.
        execs = _rest(
            spark, "/sql?length=100000&offset=0&details=true&planDescription=true"
        )
    except Exception:
        return False
    for e in execs:
        if e.get("id", -1) <= after_id:
            continue
        plan = e.get("planDescription", "")
        if "skew=true" in plan or "skewed=" in plan:
            return True
    return False


def _run(spark, fn, sf_dir: str, pid) -> dict:
    from bench import _jvm_cpu_s

    before = _stage_ids(spark)
    sql_before = _last_sql_id(spark)
    t0 = time.perf_counter()
    c0 = _jvm_cpu_s(pid)
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    out = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "cpu_s": round(_jvm_cpu_s(pid) - c0, 2),
        "straggler": _straggler(spark, before),
        "skew_splits": _skew_splits(spark, sql_before),
    }
    return out


def main(out_path: str) -> None:
    from stock_data_pipeline_spark.session import ensure_engine_confs, get_session

    spark = ensure_engine_confs(
        get_session("skew-probe", extra_confs={"spark.ui.enabled": "true"})
    )
    # the engine ships forceOptimizeSkewedJoin=true by default (the
    # mitigation this probe's own r08 findings motivated — SCALE.md
    # §14); the probe measures the UNMITIGATED baseline first, so run
    # every pass except `_forced` with force explicitly off and restore
    # the engine default on exit.
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    try:
        _probe_body(spark, out_path)
    finally:
        # restore the engine default even when the probe dies mid-run
        # (r08 ADVICE): harmless today (the process exits) but required
        # if the session is ever reused
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")


def _probe_body(spark, out_path: str) -> None:
    from bench import _jvm_pid
    from stock_data_pipeline_spark.queries import REGISTRY

    pid = _jvm_pid(spark)
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        row: dict[str, dict] = {}
        for label, sf_dir in (("uniform", UNIFORM), ("skewed", SKEWED)):
            if not Path(sf_dir).exists():
                continue
            _run(spark, fn, sf_dir, pid)  # warmup (scan cache, JIT)
            row[label] = _run(spark, fn, sf_dir, pid)
            print(f"{name} [{label}]: {row[label]}", flush=True)
        # skewed again with fixture-ratio AQE thresholds
        saved = {k: spark.conf.get(k, None) for k in TUNED}
        try:
            for k, v in TUNED.items():
                spark.conf.set(k, v)
            row["skewed_tuned"] = _run(spark, fn, SKEWED, pid)
            print(f"{name} [skewed_tuned]: {row['skewed_tuned']}", flush=True)
            # production-faithful shape: at 100 TB neither join side
            # broadcasts (a projected orders table is small at sf0.3 but
            # data-sized in production), so ALSO disable broadcast to
            # force the shuffle-join plan whose reducer a hot key owns —
            # THIS is the pass where AQE's splitter must save the stage.
            bcast = {
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            }
            saved_b = {k: spark.conf.get(k, None) for k in bcast}
            try:
                for k, v in bcast.items():
                    spark.conf.set(k, v)
                row["skewed_smj"] = _run(spark, fn, SKEWED, pid)
                print(f"{name} [skewed_smj]: {row['skewed_smj']}", flush=True)
                # aggregate-on-join-key plans (q90 groups by l_orderkey
                # right after the l_orderkey SMJ) reuse the join's hash
                # distribution — OptimizeSkewedJoin REVERTS rather than
                # break that reuse, so the splitter silently never fires
                # no matter the thresholds. forceOptimizeSkewedJoin=true
                # is Spark's answer: split anyway, pay one extra
                # exchange before the final agg.
                spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
                try:
                    row["skewed_forced"] = _run(spark, fn, SKEWED, pid)
                    print(f"{name} [skewed_forced]: {row['skewed_forced']}", flush=True)
                finally:
                    spark.conf.set(
                        "spark.sql.adaptive.forceOptimizeSkewedJoin", "false"
                    )
            finally:
                for k, v in saved_b.items():
                    if v is not None:
                        spark.conf.set(k, v)
        finally:
            for k, v in saved.items():
                if v is not None:
                    spark.conf.set(k, v)
        results[name] = row
    # prefix-filter absorption proof: candidate-pair counts, uniform vs
    # hot-shingle corpus (near-linear growth = the guard held)
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.llm import dedup

    cand_counts = {}
    for label, sf_dir in (("uniform", UNIFORM), ("skewed", SKEWED)):
        doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = (
            dedup.ngram_jaccard_pairs_prefix(doc, "doc_id", "text", n=3, threshold=0.8)
            .count()
        )
        cand_counts[label] = n
        print(f"jaccard pairs [{label}]: {n}", flush=True)
    results["_jaccard_pair_counts"] = cand_counts
    Path(out_path).write_text(json.dumps(results, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SKEW_r08.json")
