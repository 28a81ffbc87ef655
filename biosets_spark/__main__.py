"""CLI entry point (parity: reference src/biosets/__main__.py exposes
only ``--version``; this adds the two commands a Spark engine can
usefully run from a shell).

    python -m biosets_spark --version
    python -m biosets_spark list [substring]     # registered queries
    python -m biosets_spark run <query> [sf_dir] # run one query, print rows
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    from . import __version__

    parser = argparse.ArgumentParser(prog="biosets_spark")
    parser.add_argument("--version", action="version", version=str(__version__))
    sub = parser.add_subparsers(dest="cmd")
    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substring", nargs="?", default="")
    p_run = sub.add_parser("run", help="run one registered query")
    p_run.add_argument("query")
    p_run.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    p_run.add_argument("--limit", type=int, default=20)
    args = parser.parse_args()

    if args.cmd is None:
        parser.print_help()
        return

    # importing the queries package registers the full inventory
    # (its manifest loads every wave in registration order)
    from . import queries as _q

    if args.cmd == "list":
        for name, query in sorted(_q.QUERIES.items()):
            if args.substring in name:
                print(f"{name:32} {query.desc[:80]}")
        return

    if args.cmd == "run":
        if args.query not in _q.QUERIES:
            print(f"unknown query: {args.query}", file=sys.stderr)
            sys.exit(2)
        from .session import get_spark

        spark = get_spark("biosets-spark-cli")
        _q.QUERIES[args.query].fn(spark, args.sf_dir).show(args.limit, truncate=False)


if __name__ == "__main__":
    main()
