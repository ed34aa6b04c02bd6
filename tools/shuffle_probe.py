"""Shuffle-volume scaling probe (r08): the SCALE.md §13 curve measures
CPU growth exponents; this measures the BYTES each query moves — the
quantity that actually saturates a 1000-executor cluster's network and
disks at 100 TB. Per query per scale (sf0.01 / 0.1 / 0.3 / 1) it sums,
over the stages that execution actually ran:

- ``shuffleWriteBytes`` / ``shuffleReadBytes``: total exchange volume.
  The growth exponent beta = log(bytes_hi/bytes_lo)/log(sf_hi/sf_lo)
  is the scale claim: beta ~ 1 means shuffle grows with input (fine —
  bandwidth provisioning is linear); beta >> 1 means the plan
  AMPLIFIES data into its exchanges (a pair-join leaking toward N², a
  fan-out ahead of a shuffle) and will saturate the fabric long before
  the CPUs — a class of bug a CPU curve can miss when the per-row work
  is cheap.
- ``inputBytes``: scan volume after column pruning. beta_input should
  track the fixture's own growth; a jump means pruning/pushdown broke.
- ``memoryBytesSpilled`` / ``diskBytesSpilled``: any non-zero spill at
  fixture scale flags a partition-sizing problem 1000× early.

Bytes are plan-deterministic (unlike wall/CPU they don't need
best-of-N under host load), so one measured run per (query, scale).
Stage metrics come from the Spark UI REST API — stages with reused
(skipped) shuffle outputs correctly don't re-count, so the sums
reflect work actually performed.

Usage: python tools/shuffle_probe.py [out.json] [--skew]
(expects .scale/sf0.3 and .scale/sf1 from tools/make_scale_fixture.py)

``--skew`` (r09, r08 VERDICT item 5): measure the same byte curve on
the bounded-zipf(1.2) fixtures (.scale/sf{0.3,1,2}-skew) instead —
the uniform curve bounds amplification, the skew probe (SKEW_r08)
bounds stragglers/CPU, but neither sees a hot key re-inflating an
exchange past a map-side partial agg at scale; this pass closes that
blind spot. Only the .scale fixtures exist in skewed form, so the
curve starts at sf0.3.
"""

from __future__ import annotations

import json
import math
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the §13 cost tail plus the join-heavy / ANN shapes whose exchanges
# are the scale risk the probe exists to bound
QUERIES = [
    "q66_dup_clusters",
    "q194_pq_adc_topk",
    "q198_ivf_pq_topk",
    "q396_ivfpq_bucketed",
    "q54_minhash_lsh_verified",
    "q397_minhash_lsh_star",
    "q26_minhash_lsh",
    "q25_jaccard_pairs",
    "q322_qini_uplift",
    "q379_cox_ph",
    "q245_ks_test",
    "q01_sector_calculated_price",
    "q02_pricing_summary",
    "q90_shipping_priority",
    "q81_range_join",
    "q53_ann_ivf_topk",
    "q395_ann_ivf_bucketed",
]

SCALES = [
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
    (".scale/sf0.3", 0.3),
    (".scale/sf1", 1.0),
    # sf2 exists to pin the POST-transition regime: q90's lineitem⋈orders
    # flips broadcast→SMJ between sf0.3 and sf1 (the one superlinear beta
    # in the first cut was that plan transition, not amplification), so
    # the sf1->sf2 exponent is the one that must be ~1
    (".scale/sf2", 2.0),
]

SKEWED_SCALES = [
    (".scale/sf0.3-skew", 0.3),
    (".scale/sf1-skew", 1.0),
    (".scale/sf2-skew", 2.0),
]

FIELDS = [
    "shuffleWriteBytes",
    "shuffleReadBytes",
    "inputBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
]


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}", timeout=10) as r:
        return json.loads(r.read())


def _completed(spark) -> list[dict]:
    try:
        return _rest(spark, "/stages?status=complete")
    except Exception:
        return []


def _latest_attempts(stages: list[dict]) -> dict[int, dict]:
    """stageId -> its LATEST attempt: /stages returns one entry per
    attempt, so a retried stage would double-count its bytes if summed
    raw (r08 ADVICE)."""
    out: dict[int, dict] = {}
    for st in stages:
        sid = st["stageId"]
        if sid not in out or st.get("attemptId", 0) > out[sid].get("attemptId", 0):
            out[sid] = st
    return out


def _measure(spark, fn, sf_dir: str) -> dict:
    before = set(_latest_attempts(_completed(spark)))
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    sums = dict.fromkeys(FIELDS, 0)
    for sid, st in _latest_attempts(_completed(spark)).items():
        if sid in before:
            continue
        for f in FIELDS:
            sums[f] += st.get(f, 0)
    return sums


def _alphas(per_scale: dict[str, dict], field: str) -> dict[str, float]:
    keys = sorted(per_scale, key=float)
    out = {}
    for lo, hi in zip(keys, keys[1:]):
        b_lo, b_hi = per_scale[lo][field], per_scale[hi][field]
        # below ~1 MB the constant-size side of a broadcast/dim join
        # dominates and the ratio is framework noise, not a law
        if b_lo > 1 << 20 and b_hi > 0:
            out[f"{lo}->{hi}"] = round(
                math.log(b_hi / b_lo) / math.log(float(hi) / float(lo)), 2
            )
    return out


def main(out_path: str, skew: bool = False, only: list[str] | None = None) -> None:
    """``only``: re-measure just the named queries and patch their
    entries into an EXISTING artifact (bytes are plan-deterministic,
    so a per-query refresh after a plan fix is as valid as a full
    run — and ~15× cheaper)."""
    from stock_data_pipeline_spark.queries import REGISTRY
    from stock_data_pipeline_spark.session import ensure_engine_confs, get_session

    scales = SKEWED_SCALES if skew else SCALES
    queries = [q for q in QUERIES if not only or q in only]

    spark = ensure_engine_confs(
        get_session(
            "shuffle-probe",
            extra_confs={
                "spark.ui.enabled": "true",
                # default retention (1000) can evict early stages of a
                # large query mid-measurement and undercount its bytes
                "spark.ui.retainedStages": "100000",
            },
        )
    )
    results: dict[str, dict] = {}
    if only and Path(out_path).exists():
        results = json.loads(Path(out_path).read_text())
    for name in queries:
        fn = REGISTRY[name].fn
        per_scale: dict[str, dict] = {}
        for sf_dir, sf in scales:
            if not Path(sf_dir).exists():
                continue
            m = _measure(spark, fn, sf_dir)
            per_scale[str(sf)] = m
            print(
                f"{name} sf={sf}: shufW {m['shuffleWriteBytes']>>10} KiB "
                f"in {m['inputBytes']>>10} KiB spill "
                f"{(m['memoryBytesSpilled'] + m['diskBytesSpilled'])>>10} KiB",
                flush=True,
            )
        results[name] = {
            "scales": per_scale,
            "beta_shuffle_write": _alphas(per_scale, "shuffleWriteBytes"),
            "beta_input": _alphas(per_scale, "inputBytes"),
            "spilled": any(
                s["memoryBytesSpilled"] or s["diskBytesSpilled"]
                for s in per_scale.values()
            ),
        }
        print(
            f"{name} beta_shuffle: {results[name]['beta_shuffle_write']} "
            f"beta_input: {results[name]['beta_input']}",
            flush=True,
        )
    Path(out_path).write_text(json.dumps(results, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    skew = "--skew" in args
    argv = [a for a in args if a != "--skew"]
    default = "SHUFFLE_SKEW_r09.json" if skew else "SHUFFLE_r09.json"
    main(argv[0] if argv else default, skew=skew, only=only)
