"""Round-10 multimodal payload-pruning probe (VERDICT r9, item 4):
writes 10k binary payloads (16 KiB each, ~160 MB raw) + the typed
metadata struct to Parquet, then measures ACTUAL bytes read (stage
inputBytes via the UI REST API) for

  (a) a metadata-only aggregate  (must read ~metadata bytes only)
  (b) a payload-touching scan    (reads everything)

and prints the ratio — turning the multimodal.py scale note ("always
select metadata-only projections") into a measured number for
PERFORMANCE.md. The plan-shape contract (pruned ReadSchema) is pinned
separately by tests/test_multimodal_pruning.py.

Usage: python tools/scale_probe_r10b.py [n_rows] [payload_kib]

Note: payload_kib > 4 makes the one-time corpus-generation projection
exceed Janino's method-size limit (1 024+ concat chunks); Spark logs
an InternalCompilerException and falls back to the interpreted
projection — harmless, generation-only, not part of any measurement.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def jvm_pid(spark) -> int:
    return int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())


def jvm_rchar(pid: int) -> int:
    """Actual bytes the driver JVM requested from the filesystem
    (syscall-level, page-cache hits included) — the stage REST API's
    inputBytes under-reports the vectorized parquet reader ~400x on
    local files, so it cannot adjudicate pruning."""
    for line in open(f"/proc/{pid}/io"):
        if line.startswith("rchar:"):
            return int(line.split()[1])
    raise RuntimeError("no rchar in /proc/<pid>/io")


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    kib = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from biosets_spark.session import get_spark

    spark = get_spark("scale-probe-r10b", extra_conf={
        "spark.ui.enabled": "true",
    })

    path = f"/tmp/probe_r10b_media_{n_rows}_{kib}.parquet"
    if not os.path.exists(path):
        # INCOMPRESSIBLE payloads (the first probe draft used rpad'd
        # constant bytes, which snappy crushed 20x and made the
        # bytes-read comparison meaningless): kib KiB of concatenated
        # 16-byte unhex(md5(id||chunk)) blocks
        chunks = [
            F.unhex(F.md5(F.concat(F.col("id").cast("string"),
                                   F.lit(f"_{j}"))))
            for j in range(kib * 64)
        ]
        (
            spark.range(n_rows, numPartitions=16)
            .select(
                F.col("id").alias("media_id"),
                F.concat(*chunks).alias("payload"),
                F.struct(
                    F.lit("image").alias("modality"),
                    F.lit("image/bmp").alias("mime"),
                    (F.pmod(F.col("id"), 1024) + 1).cast("int").alias("width"),
                    F.lit(512).cast("int").alias("height"),
                    F.lit(None).cast("long").alias("duration_ms"),
                    F.lit(None).cast("int").alias("sample_rate"),
                ).alias("media_meta"),
            )
            .write.parquet(path)
        )
    files_mb = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")) / 1e6
    print(f"corpus: {n_rows} payloads x {kib} KiB "
          f"({files_mb:.0f} MB parquet on disk)")

    # static split from the parquet footers: how much of the file IS
    # payload column chunks (the bytes pruning must avoid)
    import pyarrow.parquet as pq
    pay_b = other_b = 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == "payload":
                    pay_b += c.total_compressed_size
                else:
                    other_b += c.total_compressed_size
    print(f"column split: payload={pay_b / 1e6:.1f} MB, "
          f"all other columns={other_b / 1e6:.2f} MB "
          f"({pay_b / (pay_b + other_b) * 100:.1f}% payload)")

    pid = jvm_pid(spark)

    def measure(name, fn):
        b0 = jvm_rchar(pid)
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        mb = (jvm_rchar(pid) - b0) / 1e6
        print(f"{name:26} wall={dt:5.2f}s jvm_read={mb:8.2f} MB "
              f"rows={rows}")
        return mb

    df = spark.read.parquet(path)
    # interleave reps so one-time footer/metadata costs amortize out of
    # the comparison; keep the minimum per arm
    meta_mb = payload_mb = float("inf")
    for _ in range(3):
        meta_mb = min(meta_mb, measure("metadata-only agg", lambda: (
            df.filter(F.col("media_meta.width") > 512)
            .groupBy("media_meta.mime")
            .agg(F.count("*").alias("n"))
            .collect()[0]["n"])))
        payload_mb = min(payload_mb, measure("payload-touching scan", lambda: (
            df.select(F.sum(F.length("payload"))).collect()[0][0])))
    if payload_mb:
        print(f"pruning ratio: metadata-only reads "
              f"{meta_mb / payload_mb * 100:.2f}% of the payload path's bytes "
              f"({meta_mb:.2f} / {payload_mb:.2f} MB)")


if __name__ == "__main__":
    main()
