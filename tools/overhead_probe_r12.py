"""r12 overhead decomposition: where does the flat ~0.5-0.9 s/query
tail of the 363-query bench go?

For every registered query, times three phases separately:
  build   — fn(spark, sf_dir): Python-side plan construction (py4j
            traffic, any decision jobs the operator runs eagerly)
  first   — .collect() of the built frame (cold: codegen compile +
            JIT + execution)
  warm    — a second build+collect (plans/codegen now cached)

Prints one JSON line per query and a summary:
  {"name":..., "build":..., "first":..., "warm":...}

Usage: python tools/overhead_probe_r12.py [query ...]   # default: all
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__  # noqa: E402,F401

from biosets_spark import queries as _q  # noqa: E402
from biosets_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(_q.QUERIES)
    spark = get_spark("biosets-spark-overhead-probe")
    # same warm-up as bench.py
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()
    rows = []
    for name in names:
        q = _q.QUERIES[name]
        try:
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            df2 = q.fn(spark, sf_dir)
            df2.collect()
            t3 = time.time()
        except Exception as e:
            print(json.dumps({"name": name, "error": f"{type(e).__name__}: {e}"}))
            continue
        rec = {"name": name, "build": round(t1 - t0, 3),
               "first": round(t2 - t1, 3), "warm": round(t3 - t2, 3)}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    tot = lambda k: round(sum(r[k] for r in rows), 1)  # noqa: E731
    print(json.dumps({"summary": {"n": len(rows), "build": tot("build"),
                                  "first": tot("first"), "warm": tot("warm")}}))


if __name__ == "__main__":
    main()
