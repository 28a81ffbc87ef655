"""Same-window A/B warm-rep probe: run the named queries R times each
(collect), print per-rep walls. Pass --noop to time via the noop sink
instead of collect (guide §1.4). Used for alternating A/B decisions so
host-window drift cancels.

Usage: python tools/ab_warm_probe.py [-r REPS] [--noop] q_name [q_name ...]
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
    args = sys.argv[1:]
    reps = 3
    noop = False
    if "-r" in args:
        i = args.index("-r")
        reps = int(args[i + 1])
        del args[i:i + 2]
    if "--noop" in args:
        noop = True
        args.remove("--noop")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("biosets-spark-ab-probe")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()
    for name in args:
        q = _q.QUERIES[name]
        walls = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"ab:{name}:rep{r}")
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"name": name, "reps": walls}), flush=True)


if __name__ == "__main__":
    main()
