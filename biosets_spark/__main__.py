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

    # importing the wave modules registers the full inventory
    import importlib

    from . import queries as _q

    for mod in (
        "queries_ext", "queries_more", "queries_wave3", "queries_wave4",
        "queries_wave5", "queries_wave6", "queries_wave7", "queries_wave8",
        "queries_wave9", "queries_wave10", "queries_wave11", "queries_wave12",
        "queries_wave13", "queries_wave14", "queries_wave15", "queries_wave16",
        "queries_wave17", "queries_wave18", "queries_wave19", "queries_wave20",
        "queries_wave21",
    ):
        importlib.import_module(f"biosets_spark.{mod}")

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
