"""Engine CLI.

    python -m mapreduce_distributed_systems_spark list
    python -m mapreduce_distributed_systems_spark run <query> [--sf DIR] [-n N]
    python -m mapreduce_distributed_systems_spark explain <query> [--sf DIR]
    python -m mapreduce_distributed_systems_spark oracle <query>

`run` executes a registered query and prints up to N rows; `explain`
prints the formatted physical plan (the artifact SCALE.md reasons
about); `oracle` prints the DuckDB oracle SQL.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mapreduce_distributed_systems_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd in ("run", "explain", "oracle"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        if cmd != "oracle":
            sp.add_argument("--sf", default=DEFAULT_SF_DIR)
        if cmd == "run":
            sp.add_argument("-n", type=int, default=20, help="max rows to show")
    args = p.parse_args(argv)

    from mapreduce_distributed_systems_spark.plans.registry import all_specs

    specs = all_specs()
    if args.cmd == "list":
        width = max(len(n) for n in specs)
        for name in sorted(specs):
            s = specs[name]
            oracle = "oracle" if s.oracle else "rows-only"
            bench = " bench" if s.bench else ""
            print(f"{name:<{width}}  [{oracle}{bench}]  {s.doc.strip()[:80]}")
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spec = specs[args.query]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("-- rows-only query: no SQL oracle (see its tests)")
            return 0
        print(spec.oracle.strip())
        return 0

    from mapreduce_distributed_systems_spark.session import get_spark

    spark = get_spark("cli")
    df = spec.fn(spark, args.sf)
    if args.cmd == "explain":
        print(df._jdf.queryExecution().explainString("formatted"))
    else:
        df.show(args.n, truncate=60)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
