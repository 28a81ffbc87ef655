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

from biosets_spark import queries as _q  # noqa: E402
from biosets_spark import queries_ext, queries_more, queries_wave3  # noqa: E402,F401
from biosets_spark.session import get_spark  # noqa: E402

EXPECTED_NESTED_LOOP = {"cross", "range"}  # tags that legitimately nested-loop


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
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
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
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
