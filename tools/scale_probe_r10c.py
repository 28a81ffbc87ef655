"""Round-10 versioned-table scale probe: create / MERGE / skipping
read at 5M rows (~33x the r8 200k MERGE probe), recording wall,
shuffle bytes, and the file-skipping ratio — the versioned-table
family's scale contracts (docs/SCALE.md "Mutation" section) as
measured numbers.

Layout: the base table is range-clustered on the merge key into 64
files before create_table, so the per-file min/max index carries
tight disjoint key ranges — the layout a compact_table(sort_by=key)
maintenance pass produces, and the precondition for file skipping to
bite.

Usage: python tools/scale_probe_r10c.py [n_rows] [delta_rows]
"""

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _rest(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def shuffle_totals(spark):
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        stages = _rest(f"{ui}/api/v1/applications/{app}/stages?status=complete")
        w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        return w, r
    except Exception:
        return None, None


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    delta_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    from biosets_spark.session import get_spark
    from biosets_spark.sources.sink import (
        compact_table,
        create_table,
        merge_into_parquet,
        prune_snapshot_files,
        read_snapshot,
        read_snapshot_where,
    )

    spark = get_spark("scale-probe-r10c", extra_conf={
        "spark.driver.memory": "48g",
        "spark.sql.shuffle.partitions": "64",
        "spark.ui.enabled": "true",
    })

    path = f"/tmp/probe_r10c_table_{n_rows}"
    shutil.rmtree(path, ignore_errors=True)

    def mk(n, key_off=0):
        return (
            spark.range(n, numPartitions=64)
            .select(
                (F.col("id") + key_off).alias("key"),
                (F.pmod(F.col("id"), 1000)).cast("int").alias("bucket"),
                (F.col("id") % 997).cast("double").alias("val"),
                F.md5(F.col("id").cast("string")).alias("s"),
            )
        )

    def step(name, fn):
        w0, r0 = shuffle_totals(spark)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        w1, r1 = shuffle_totals(spark)
        sw = (w1 - w0) / 1e6 if w0 is not None else float("nan")
        print(f"{name:34} wall={dt:7.2f}s shufW_MB={sw:9.1f}", flush=True)
        return out

    base = mk(n_rows).repartitionByRange(64, "key")
    step("create_table 5M range-clustered",
         lambda: create_table(spark, path, base))
    files_mb = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path) for f in fs) / 1e6
    print(f"  table on disk: {files_mb:.0f} MB")

    # delta: half updates (every 20th existing key), half inserts
    updates = mk(delta_rows // 2).select(
        (F.col("key") * 20).alias("key"), "bucket", "val", "s")
    inserts = mk(delta_rows // 2, key_off=n_rows)
    delta = updates.unionByName(inserts)
    entry = step(f"MERGE {delta_rows // 1000}k delta", lambda: merge_into_parquet(
        spark, path, delta, on="key",
        matched_update={"val": F.col("__s.val") + F.lit(1.0)},
        not_matched_insert={},
    ))
    print(f"  commit: {entry['operation']} v{entry['version']} "
          f"rows={entry['rows']} (expect {n_rows + delta_rows // 2})")

    lo, hi = n_rows // 2, n_rows // 2 + 50_000
    filters = [("key", ">=", lo), ("key", "<", hi)]

    def skip_ratio(version, label):
        kept, total = prune_snapshot_files(path, version, filters)
        print(f"  skipping index {label}: {len(kept)}/{total} files "
              f"kept for a {hi - lo}-key range")
        return len(kept), total

    # v0 is range-clustered -> skipping bites; the MERGE rewrite (v1)
    # is hash-partitioned on the join key, so every file spans the
    # whole key range and the index keeps all of them — the documented
    # reason compact_table(sort_by=...) exists as a maintenance pass
    skip_ratio(0, "v0 (range-clustered)")
    skip_ratio(1, "v1 (post-MERGE, hash layout)")
    entry = step("compact_table sort_by=key", lambda: compact_table(
        spark, path, target_rows_per_file=100_000, sort_by="key"))
    k2, t2 = skip_ratio(entry["version"], "v2 (re-clustered)")
    assert k2 <= max(3, t2 // 10), "re-clustering failed to restore skipping"

    n1 = step("read_snapshot_where 50k-key range", lambda: read_snapshot_where(
        spark, path, filters).count())
    n2 = step("full-scan filter (no skipping)", lambda: read_snapshot(
        spark, path).filter((F.col("key") >= lo) & (F.col("key") < hi)).count())
    assert n1 == n2, (n1, n2)
    print(f"  range rows: {n1} (both paths agree)")

    v0 = step("time-travel read v0 count",
              lambda: read_snapshot(spark, path, version=0).count())
    assert v0 == n_rows, v0


if __name__ == "__main__":
    main()
