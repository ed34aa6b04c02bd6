"""Empirical scaling curve for the expensive headline tail (r06
VERDICT item 5): run the costliest queries at sf0.01 / sf0.1 /
sf0.3 / sf1 (the latter two built by tools/make_scale_fixture.py)
and report the growth exponent between consecutive scales,

    alpha = log(cpu_hi / cpu_lo) / log(size_hi / size_lo)

computed on executor task CPU time (contention-immune; wall is
recorded alongside). alpha ~ 1 = linear in input, the design claim
for every one of these plans; anything persistently super-linear
beyond shuffle-log factors is a scale bug to fix or document.

Usage: python tools/scale_curve.py [out.json]
(expects .scale/sf0.3 and .scale/sf1 to exist; ~2 runs per query per
scale, first run discarded as warmup at each scale).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "q66_dup_clusters",
    "q194_pq_adc_topk",
    "q54_minhash_lsh_verified",
    "q26_minhash_lsh",
    "q25_jaccard_pairs",
    "q322_qini_uplift",
    "q379_cox_ph",
    "q245_ks_test",
    "q01_sector_calculated_price",
    "q02_pricing_summary",
]

SCALES = [
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
    (".scale/sf0.3", 0.3),
    (".scale/sf1", 1.0),
    # r09 (r08 VERDICT item 6): the broadcast→SMJ plan transitions the
    # byte curve (§16) exposed all happen in the sf1→sf2 gap, so the
    # CPU exponent across that pair — the post-transition regime a real
    # cluster always runs in — was unmeasured while the shuffle probe
    # already went to sf2.
    (".scale/sf2", 2.0),
]


def main(out_path: str) -> None:
    from bench import _jvm_cpu_s, _jvm_pid
    from stock_data_pipeline_spark.queries import REGISTRY
    from stock_data_pipeline_spark.session import ensure_engine_confs, get_session

    spark = ensure_engine_confs(get_session("scale-curve"))
    pid = _jvm_pid(spark)
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        per_scale = {}
        for sf_dir, sf in SCALES:
            if not Path(sf_dir).exists():
                continue
            best_wall, best_cpu = None, None
            for rep in range(3):  # rep 0 = warmup at this scale
                t0 = time.perf_counter()
                c0 = _jvm_cpu_s(pid)
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                cpu = _jvm_cpu_s(pid) - c0
                wall = time.perf_counter() - t0
                if rep == 0:
                    continue
                best_wall = wall if best_wall is None else min(best_wall, wall)
                best_cpu = cpu if best_cpu is None else min(best_cpu, cpu)
            per_scale[str(sf)] = {"wall_s": round(best_wall, 3), "cpu_s": round(best_cpu, 3)}
            print(f"{name} sf={sf}: wall {best_wall:.2f}s cpu {best_cpu:.2f}s", flush=True)
        # consecutive-scale exponents on CPU
        keys = sorted(per_scale, key=float)
        alphas = {}
        for lo, hi in zip(keys, keys[1:]):
            c_lo, c_hi = per_scale[lo]["cpu_s"], per_scale[hi]["cpu_s"]
            if c_lo and c_hi and c_lo > 0.02:  # below ~20ms CPU the ratio is noise
                alphas[f"{lo}->{hi}"] = round(
                    math.log(c_hi / c_lo) / math.log(float(hi) / float(lo)), 2
                )
        results[name] = {"scales": per_scale, "alpha_cpu": alphas}
        print(f"{name} alpha: {alphas}", flush=True)
    Path(out_path).write_text(json.dumps(results, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SCALE_CURVE_r09.json")
