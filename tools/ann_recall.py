"""ANN recall-at-scale measurement (r07 VERDICT item 5).

The ANN queries (q29 LSH, q53 IVF, q395 bucketed IVF, q194 PQ-ADC) are
value-oracled for DETERMINISM — the hash oracle certifies the plan
computes exactly what it claims, but says nothing about whether the
approximation still FINDS the true neighbors as the corpus grows.
Recall that collapses with corpus growth is a silent quality
regression no hash can catch: LSH bucket occupancy rises with N at
fixed planes, IVF lists get crowded at fixed nlist, PQ cells blur at
fixed m×k. This tool measures recall@k against the exact top-k at
every available scale and writes the table SCALE.md cites;
tests/test_scale_features.py pins floors on the committed artifact.

Recall definition: per query, |approx top-k ∩ exact top-k| / k,
averaged over queries (the exact set uses the SAME metric each
approximation targets: cosine for LSH/IVF, quantized squared-L2 for
PQ-ADC — measuring against a metric the operator never optimizes
would conflate approximation error with metric mismatch).

Usage: python tools/ann_recall.py [out.json]
(sf0.3/sf1 need .scale fixtures from tools/make_scale_fixture.py)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = [
    ("/root/testdata/sf0.01", "0.01"),
    ("/root/testdata/sf0.1", "0.1"),
    (".scale/sf0.3", "0.3"),
    (".scale/sf1", "1.0"),
]


def _pairs(df, k_col: str | None = None) -> dict:
    """{query_id: set(match ids)} from a (query_id, <id>, ...) result."""
    out: dict = {}
    id_col = None
    for r in df.collect():
        d = r.asDict()
        if id_col is None:
            id_col = "match_id" if "match_id" in d else "vec_id"
        out.setdefault(d["query_id"], set()).add(d[id_col])
    return out


def _recall(approx: dict, exact: dict, k: int) -> float:
    if not exact:
        return float("nan")
    vals = [len(approx.get(q, set()) & hits) / min(k, len(hits)) for q, hits in exact.items()]
    return round(sum(vals) / len(vals), 4)


def main(out_path: str) -> None:
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.llm import similarity
    from stock_data_pipeline_spark.llm.clustering import pq_adc_topk
    from stock_data_pipeline_spark.session import ensure_engine_confs, get_session

    spark = ensure_engine_confs(get_session("ann-recall"))
    results: dict[str, dict] = {}
    for sf_dir, sf in SCALES:
        if not Path(sf_dir).exists():
            continue
        # the fixture parquet is a few MB → 2 scan splits; the exact
        # baselines are CPU-dense per row, so spread the corpus over
        # the cores first (scan-split granularity, SCALE.md §13)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(64)
        n_corpus = emb.count()
        row: dict = {"corpus_rows": n_corpus}

        # shared exact baseline for the vec_id<5 query family (q29/q53)
        q5 = emb.filter(F.col("vec_id") < 5)
        exact5 = _pairs(similarity.cosine_topk(emb, q5, k=10))
        row["lsh_q29"] = _recall(
            _pairs(similarity.ann_lsh_topk(emb, q5, k=10, num_planes=3, num_tables=10)),
            exact5,
            10,
        )
        row["ivf_q53"] = _recall(
            _pairs(similarity.ivf_flat_topk(emb, q5, k=10, nlist=16, nprobe=6)),
            exact5,
            10,
        )

        # bucketed IVF (q395): corpus-scale query batch, k=8, nprobe=4
        q7 = emb.filter(F.col("vec_id") % 7 == 0)
        exact7 = _pairs(similarity.cosine_topk(emb, q7, k=8))
        row["ivf_bucketed_q395"] = _recall(
            _pairs(
                similarity.ivf_flat_topk_bucketed(emb, q7, k=8, nlist=16, nprobe=4)
            ),
            exact7,
            8,
        )

        # PQ-ADC (q194): exact metric twin is quantized squared-L2 over
        # all 64 dims with the same query/corpus split. r09: the
        # registered config is the 128-bit budget (m=16, k=256) — the
        # 16-bit point lives in the budget curve below.
        exact_l2 = _pairs(
            similarity.quantized_prefix_topk(
                emb, n_dims=64, k=10, query_mod=97, quant_bits=10
            )
        )
        row["pq_adc_q194"] = _recall(
            _pairs(
                pq_adc_topk(
                    emb, "vec_id", "embedding", query_mod=97,
                    m=16, sub_dim=4, k=256, rounds=2, quant_bits=10,
                    topk=10, train_mod=16,
                )
            ),
            exact_l2,
            10,
        )
        results[sf] = row
        print(f"sf={sf}: {row}", flush=True)

    # PQ code-budget curve (sf0.1): uniform-random 64-dim vectors are
    # PQ's worst case — no cluster structure to exploit, and neighbor
    # distance gaps concentrate, so a 16-bit code (m=4, k=16) retains
    # almost no ranking signal. Recall must RISE steeply with bits
    # (m × log2 k); if it doesn't, the ADC plan itself is broken —
    # that's the regression this section lets tests pin without
    # pretending the 16-bit q194 demo config is a quality operator.
    emb = spark.read.parquet(f"{SCALES[1][0]}/embeddings.parquet").repartition(64)
    exact_l2 = _pairs(
        similarity.quantized_prefix_topk(emb, n_dims=64, k=10, query_mod=97, quant_bits=10)
    )
    budget = {}
    for m, sub_dim, k_cw in ((4, 16, 16), (8, 8, 64), (16, 4, 256)):
        r = _recall(
            _pairs(
                pq_adc_topk(
                    emb, "vec_id", "embedding", query_mod=97,
                    m=m, sub_dim=sub_dim, k=k_cw, rounds=2, quant_bits=10,
                    topk=10, train_mod=16,
                )
            ),
            exact_l2,
            10,
        )
        budget[f"m{m}_k{k_cw}_bits{m * (k_cw.bit_length() - 1)}"] = r
        print(f"pq budget m={m} k={k_cw}: recall {r}", flush=True)
    results["pq_budget_curve_sf0.1"] = budget
    Path(out_path).write_text(json.dumps(results, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "RECALL_r09.json")
