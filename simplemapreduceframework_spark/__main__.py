"""Command-line entry point — the reference's client UX
(`Client(ip, port, data, functions).execute()` from a user script,
reference counting_words.py:10-26) as a CLI:

    python -m simplemapreduceframework_spark run-job DATA FUNCTIONS [--mode fast] [--data-type table]
    python -m simplemapreduceframework_spark run-query NAME [--sf-dir DIR] [--limit N]
    python -m simplemapreduceframework_spark list-queries
    python -m simplemapreduceframework_spark explain NAME [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="simplemapreduceframework_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    job = sub.add_parser("run-job", help="run a mapper/combiner/reducer job")
    job.add_argument("data", help="input data file (text or headerless CSV)")
    job.add_argument("functions", help=".py file defining mapper[/combiner/reducer]")
    job.add_argument("--data-type", choices=["text", "table"], default="text")
    job.add_argument("--mode", choices=["faithful", "fast"], default="faithful")

    runq = sub.add_parser("run-query", help="run a registered query")
    runq.add_argument("name")
    runq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runq.add_argument("--limit", type=int, default=20)

    sub.add_parser("list-queries", help="list registered queries")

    expl = sub.add_parser("explain", help="show a query's physical plan")
    expl.add_argument("name")
    expl.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = parser.parse_args(argv)

    from . import get_spark, registry

    if args.cmd == "list-queries":
        registry.load_all()
        oracled = set(registry.ORACLES)
        for name in sorted(registry.QUERIES):
            tag = "oracle" if name in oracled else "rows-only"
            print(f"{name}  [{tag}]")
        return 0

    spark = get_spark("smrf-cli")
    if args.cmd == "run-job":
        from .compat import LocalClient

        result = LocalClient(
            spark, args.data, args.functions, data_type=args.data_type, mode=args.mode
        ).execute()
        for k, v in sorted(result, key=lambda kv: str(kv[0])):
            print(f"{k}\t{v}")
        return 0

    registry.load_all()
    if args.name not in registry.QUERIES:
        print(f"unknown query: {args.name!r} (see list-queries)", file=sys.stderr)
        return 2
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
