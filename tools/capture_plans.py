"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <suffix> [query_prefix,...]
  suffix: file suffix, e.g. "before" -> plans/r09/<query>_before.txt
  query list: optional comma-separated qNN prefixes; default = all headliners.

Plans are captured AQE-off (same discipline as bench.py's fingerprint:
the static physical plan shows the WholeStageCodegen spans and exchange
placement that AQE's initial plan hides). Iterative queries (q66) run
jobs during construction; their plan is the final round's AQE plan.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stock_data_pipeline_spark import queries as _q  # noqa: E402
from stock_data_pipeline_spark.session import ensure_engine_confs, get_session  # noqa: E402

OUT = (
    Path(__file__).resolve().parent.parent
    / "plans"
    / os.environ.get("PLANS_ROUND", "r10")
)
SF_DIR = "/root/testdata/sf0.1"
ITERATIVE = {"q66_dup_clusters", "q122_cluster_canonical"}


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = ensure_engine_confs(get_session("capture-plans"))
    OUT.mkdir(parents=True, exist_ok=True)
    # named non-headline queries (registry prefixes) are allowed too —
    # optimization rounds touch operators whose consumers aren't benched
    pool = dict(_q.headline_queries())
    if only is not None:
        for rname, entry in _q.REGISTRY.items():
            if rname.split("_", 1)[0] in only and rname not in pool:
                pool[rname] = entry.fn
    for name, fn in pool.items():
        if only is not None and name.split("_", 1)[0] not in only:
            continue
        import contextlib
        import io

        buf = io.StringIO()
        try:
            if name not in ITERATIVE:
                spark.conf.set("spark.sql.adaptive.enabled", "false")
            df = fn(spark, SF_DIR)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {e!r}"
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        (OUT / f"{name}_{suffix}.txt").write_text(txt)
        print(name, "->", f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
