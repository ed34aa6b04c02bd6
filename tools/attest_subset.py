"""Targeted oracle attestation over an explicit query subset (r10
VERDICT item 3: driver-attest the rewritten paths and the
never-driver-greened backlog at sf0.1 without paying the full-registry
sf0.1 run, whose recursive-CTE closure oracles are quadratic in
component size).

Same comparison routine, dirty-tree guard, git/fixture stamping and
artifact shape as ``stock_data_pipeline_spark.attest`` — only the query
set differs (recorded in the artifact).

Usage: python tools/attest_subset.py <sf_dir> <out_path> <q1,q2,...>
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from stock_data_pipeline_spark.attest import _sha256_file  # noqa: E402
from stock_data_pipeline_spark.catalog import ALL_TABLES  # noqa: E402
from stock_data_pipeline_spark.oracle import (  # noqa: E402
    compare_query,
    register_duckdb_views,
)
from stock_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from stock_data_pipeline_spark.session import (  # noqa: E402
    ensure_engine_confs,
    get_session,
)


def main() -> None:
    sf_dir, out_path, names = sys.argv[1], Path(sys.argv[2]), sys.argv[3].split(",")
    repo_root = Path(__file__).resolve().parent.parent
    dirty = subprocess.run(
        ["git", "-C", str(repo_root), "status", "--porcelain", "-uall"],
        capture_output=True, text=True,
    ).stdout.strip()
    if dirty:
        print("attest_subset: refusing a dirty tree:\n" + dirty, file=sys.stderr)
        sys.exit(2)
    start_head = subprocess.run(
        ["git", "-C", str(repo_root), "rev-parse", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = ensure_engine_confs(get_session("oracle-attest-subset", cpus=8))
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    by_query = {}
    n_match = n_rows_only = n_fail = 0
    for n in names:
        r = compare_query(spark, con, n, sf_dir)
        by_query[n] = {k: v for k, v in r.items() if k != "query"}
        st = r["status"]
        n_match += st == "MATCH"
        n_rows_only += st == "rows_only"
        n_fail += st not in ("MATCH", "rows_only")
        print(f"{'ok ' if st in ('MATCH', 'rows_only') else 'FAIL'} {n:32s} {st}")
    end_head = subprocess.run(
        ["git", "-C", str(repo_root), "rev-parse", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    if end_head != start_head:
        print("attest_subset: HEAD moved mid-run; refusing to stamp", file=sys.stderr)
        sys.exit(2)
    artifact = {
        "comparison": "rowcount + schema + order-insensitive sha256 value hash, "
        "Spark vs DuckDB on identical parquet (oracle.compare_query) — targeted "
        "subset, see query_set",
        "sf_dir": sf_dir,
        "git_commit": start_head,
        "query_set": names,
        "summary": {"match": n_match, "rows_only": n_rows_only, "fail": n_fail},
        "fixture_sha256": {
            t: _sha256_file(Path(sf_dir) / f"{t}.parquet") for t in ALL_TABLES
        },
        "queries": by_query,
    }
    out_path.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"{n_match} match / {n_rows_only} rows_only / {n_fail} fail -> {out_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
