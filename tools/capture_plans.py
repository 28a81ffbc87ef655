"""Capture .explain("formatted") output for named queries into a
directory — the plan-evidence artifacts for the optimization rounds
(plans/r12/<query>_<tag>.txt).

Usage:
  python tools/capture_plans.py <out_dir> <tag> <query> [query ...]

Each query's physical plan (AQE initial plan; the shape evidence —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen
spans, Python-eval nodes — is all in it) is written to
<out_dir>/<query>_<tag>.txt. Uses $SPARK_GRAFT_SF_DIR (default
sf0.1) so plans match the bench's data scale.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__  # noqa: E402,F401  (registers the inventory)

from biosets_spark import queries as _q  # noqa: E402
from biosets_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    out_dir, tag, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("biosets-spark-plan-capture")
    rc = 0
    for name in names:
        if name not in _q.QUERIES:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            rc = 1
            continue
        try:
            df = _q.QUERIES[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}", file=sys.stderr)
            rc = 1
            continue
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return rc


if __name__ == "__main__":
    main()
