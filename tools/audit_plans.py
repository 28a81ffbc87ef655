"""Plan-quality audit: explain every registered query and flag
physical-plan anti-patterns that would hurt at 100 TB.

Checks per query:
- CartesianProduct / BroadcastNestedLoopJoin where not expected
  (cross/range joins declare themselves via tags)
- parquet scans with no pushed filters *and* full-width ReadSchema
  (a scan reading every column usually means a missing projection)
- row-at-a-time PythonUDF (BatchEvalPython) — only ArrowEvalPython /
  mapInPandas are sanctioned Python paths
- Exchange count (shuffles) per query, reported for eyeballing

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__  # noqa: E402,F401  (registers every query wave)
from biosets_spark import queries as _q  # noqa: E402
from biosets_spark.session import get_spark  # noqa: E402

EXPECTED_NESTED_LOOP = {"cross", "range"}  # tags that legitimately nested-loop


def _bracket_groups(s: str) -> int:
    """Count top-level ``[...]`` groups in a plan-node argument string."""
    depth = groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(depth - 1, 0)
    return groups


def _is_global_window(line: str) -> bool:
    """A Window physical node with an EMPTY partition spec renders as
    ``Window [exprs], [order]`` (2 bracket groups); a partitioned one
    as ``Window [exprs], [parts], [order]`` (3). An empty partition
    spec moves the entire input through ONE task — the textbook window
    scale-killer (VERDICT r1 #2).

    Disambiguation: a PARTITIONED window with no ORDER BY (e.g. a
    share-of-total SUM over the whole partition) also renders 2
    groups — ``Window [exprs], [parts]`` — but its second group is a
    partition list, not an order spec, so it carries no ASC/DESC
    keyword. Only flag 2-group nodes whose trailing group is an
    actual sort order."""
    m = re.search(r"\bWindow (\[.*)$", line)
    if not m:
        return False
    groups = _bracket_groups(m.group(1))
    if groups >= 3:
        return False
    if groups == 2:
        last = m.group(1).rsplit("[", 1)[-1]
        return (" ASC" in last) or (" DESC" in last)
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    # keep plan strings untruncated: an elided ReadSchema ("...", no
    # closing '>') makes the wide-scan regex run across lines and
    # report phantom column counts
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    problems = 0
    for name, query in _q.QUERIES.items():
        try:
            df = query.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            problems += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and not (set(query.tags) & EXPECTED_NESTED_LOOP):
            flags.append("BroadcastNestedLoopJoin(unexpected)")
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time PythonUDF")
        if any(_is_global_window(line) for line in plan.splitlines()):
            flags.append("global-window(empty partition spec)")
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        scans = re.findall(r"ReadSchema: struct<([^>\n]*)>", plan)
        wide = [s for s in scans if s.count(",") >= 9]
        if wide:
            flags.append(f"wide-scan({wide[0].count(',') + 1} cols)")
        status = "FLAG" if flags else "ok"
        if flags:
            problems += 1
        print(f"{status:4} {name:32} exchanges={n_exchange:2} {' '.join(flags)}")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
