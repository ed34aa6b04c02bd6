"""Engine CLI — the user-facing entry points a reference user switches
to (the reference's `python main.py` pipeline run becomes `run`;
ad-hoc inspection becomes `list` / `explain` / `show`).

    python -m stock_data_pipeline_spark list [pattern]
    python -m stock_data_pipeline_spark show <query> [--sf-dir D] [--limit N]
    python -m stock_data_pipeline_spark explain <query> [--sf-dir D]
    python -m stock_data_pipeline_spark oracle ...   (see oracle module)

`list` never starts a JVM; `show`/`explain` build one session. The
bench harness stays at the repo root (bench.py) and the correctness
gate at `python -m stock_data_pipeline_spark.oracle`.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.001"


def _registry():
    from stock_data_pipeline_spark.queries import REGISTRY

    return REGISTRY


def cmd_list(args: argparse.Namespace) -> int:
    reg = _registry()
    names = [n for n in reg if args.pattern.lower() in n.lower()] if args.pattern else list(reg)
    for n in names:
        spec = reg[n]
        tags = []
        if spec.headline:
            tags.append("headline")
        tags.append("oracle" if spec.oracle else "rows-only")
        ref_line = (spec.survey_ref.splitlines() or [""])[0][:80]
        print(f"{n:36} [{', '.join(tags)}] {ref_line}")
    print(f"\n{len(names)} queries")
    return 0


def _session():
    from stock_data_pipeline_spark.session import ensure_engine_confs, get_session

    return ensure_engine_confs(get_session("cli", cpus=8))


def _query_df(name: str, sf_dir: str):
    reg = _registry()
    if name not in reg:
        sys.exit(f"unknown query {name!r} — see `list`")
    return reg[name].fn(_session(), sf_dir)


def cmd_show(args: argparse.Namespace) -> int:
    _query_df(args.query, args.sf_dir).show(args.limit, truncate=False)
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    _query_df(args.query, args.sf_dir).explain("formatted")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m stock_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("pattern", nargs="?", default="")
    lp.set_defaults(fn=cmd_list)

    for name, fn, help_ in (
        ("show", cmd_show, "run a query and print rows"),
        ("explain", cmd_explain, "print the formatted physical plan"),
    ):
        qp = sub.add_parser(name, help=help_)
        qp.add_argument("query")
        qp.add_argument("--sf-dir", default=DEFAULT_SF)
        if name == "show":
            qp.add_argument("--limit", type=int, default=20)
        qp.set_defaults(fn=fn)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
