"""Plan-quality audit: explain every registered query and flag
physical-plan anti-patterns that would hurt at 100 TB.

The single-plan checks live in ``biosets_spark/plans/audit.py`` (also
exposed to users as ``BioDataset.audit_plan()``); this tool sweeps the
full query inventory with them:

- CartesianProduct / BroadcastNestedLoopJoin where not expected
  (cross/range joins declare themselves via tags)
- parquet scans with no pushed filters *and* full-width ReadSchema
  (a scan reading every column usually means a missing projection)
- row-at-a-time PythonUDF (BatchEvalPython) — only ArrowEvalPython /
  mapInPandas are sanctioned Python paths
- Window with an empty partition spec (single-task global window)
- Exchange count (shuffles) per query, reported for eyeballing

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__  # noqa: E402,F401  (registers every query wave)
from biosets_spark import queries as _q  # noqa: E402
from biosets_spark.plans.audit import (  # noqa: E402
    audit_plan_text,
    count_exchanges,
)
from biosets_spark.session import get_spark  # noqa: E402

EXPECTED_NESTED_LOOP = {"cross", "range"}  # tags that legitimately nested-loop
# tags whose global window runs over a key-bounded aggregate (a final
# ranking over per-group totals — tiny at ANY corpus scale); the
# whole-table-through-one-task rule still applies to everything else
EXPECTED_GLOBAL_WINDOW = {"tiny-global-window"}

_CODE_LABEL = {
    "cartesian-product": "CartesianProduct",
    "nested-loop-join": "BroadcastNestedLoopJoin(unexpected)",
    "python-udf": "row-at-a-time PythonUDF",
    "global-window": "global-window(empty partition spec)",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    # keep plan strings untruncated: maxToStringFields governs
    # expression lists, maxMetadataStringLength governs ReadSchema
    # (default 100 CHARS — wide scans truncate to "struct<..." with no
    # closing '>' and would silently evade the wide-scan regex)
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    spark.conf.set("spark.sql.maxMetadataStringLength", "8192")
    problems = 0
    for name, query in _q.QUERIES.items():
        try:
            df = query.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            problems += 1
            continue
        allow_nl = bool(set(query.tags) & EXPECTED_NESTED_LOOP)
        allow_gw = bool(set(query.tags) & EXPECTED_GLOBAL_WINDOW)
        findings = audit_plan_text(plan, allow_nested_loop=allow_nl,
                                   allow_global_window=allow_gw)
        flags = [
            _CODE_LABEL.get(f["code"], f["code"])
            if f["code"] != "wide-scan"
            else f"wide-scan({f['ncols']} cols)"
            for f in findings
        ]
        n_exchange = count_exchanges(plan)
        status = "FLAG" if flags else "ok"
        if flags:
            problems += 1
        print(f"{status:4} {name:32} exchanges={n_exchange:2} {' '.join(flags)}")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
