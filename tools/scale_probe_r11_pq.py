"""Round-11 PQ scale probe: encode + ADC scan at 1M x 64 with a
production-shaped codebook (m=8 subspaces x 256 codes = 8 bytes/vec).

Measures the three claims operators/pq.py makes:
1. encode is ONE Arrow pass (wall at 1M rows);
2. the ADC top-k scan is pure JVM over the code column only — wall
   vs the exact brute-force kernel on the raw vectors;
3. the compressed index is a fraction of the raw payload (parquet
   bytes on disk, codes vs embeddings).

Also reports recall@10 of ADC vs exact grid-L2 for a planted
near-dup query (the planted row must surface) on the r10-style
corpus.

Usage: python tools/scale_probe_r11_pq.py [n_rows]
"""

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def synth(spark, n_rows, dim=64, n_clusters=None, noise=0.15):
    """Random corpus (n_clusters=None) or the r11-ann clustered one
    (point = cluster center + noise), where ANN recall is meaningful."""
    if n_clusters:
        cid = F.pmod(F.col("vec_id"), F.lit(n_clusters))
        comps = []
        for j in range(dim):
            center = (F.pmod(F.xxhash64(cid, F.lit(j)), F.lit(1_000_001))
                      - F.lit(500_000)) / F.lit(1e6)
            nz = (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j), F.lit("n")),
                         F.lit(1_000_001)) - F.lit(500_000)) / F.lit(1e6)
            comps.append(center + nz * F.lit(noise))
    else:
        comps = [
            (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(1_000_001))
             - F.lit(500_000)) / F.lit(1e6)
            for j in range(dim)
        ]
    return (
        spark.range(n_rows, numPartitions=64)
        .withColumnRenamed("id", "vec_id")
        .select("vec_id", F.array(*comps).alias("embedding"))
    )


def du(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from biosets_spark.operators import pq as PQ
    from biosets_spark.operators.similarity import knn_bruteforce
    from biosets_spark.session import get_spark

    spark = get_spark("scale-probe-r11-pq")
    spark.sparkContext.setLogLevel("ERROR")

    df = synth(spark, n_rows)
    raw_path = "/tmp/pq_probe_raw.parquet"
    df.write.mode("overwrite").parquet(raw_path)
    df = spark.read.parquet(raw_path)

    t0 = time.monotonic()
    cbs = PQ.pq_codebooks(df, m=8, n_codes=256)
    t_build = time.monotonic() - t0

    t0 = time.monotonic()
    enc = PQ.pq_encode(df, cbs)
    code_path = "/tmp/pq_probe_codes.parquet"
    enc.select("vec_id", "pq_code").write.mode("overwrite").parquet(code_path)
    t_encode = time.monotonic() - t0
    codes = spark.read.parquet(code_path)

    raw_b, code_b = du(raw_path), du(code_path)
    print(f"rows={n_rows} codebook build={t_build:.1f}s "
          f"encode+write={t_encode:.1f}s", flush=True)
    print(f"payload: raw={raw_b/1e6:.0f}MB codes={code_b/1e6:.0f}MB "
          f"({raw_b/code_b:.0f}x smaller)", flush=True)

    q = [float(x) for x in df.filter(F.col("vec_id") == 777).first()["embedding"]]
    q[-1] += 0.003

    # warm both scans once, then time
    for _ in range(2):
        t0 = time.monotonic()
        adc = [r.neighbor_id for r in
               PQ.pq_adc_topk(codes, cbs, q, k=10).collect()]
        t_adc = time.monotonic() - t0
    for _ in range(2):
        t0 = time.monotonic()
        exact = [r.neighbor_id for r in
                 knn_bruteforce(df, q, k=10, kernel=True).collect()]
        t_exact = time.monotonic() - t0
    rec = len(set(adc) & set(exact)) / 10
    print(f"ADC top-10 scan: {t_adc:.2f}s (codes only) vs exact "
          f"kernel {t_exact:.2f}s (raw vectors); recall@10={rec:.2f} "
          f"planted_found={777 in adc} (random corpus: tail recall is "
          "noise agreement)", flush=True)

    # recall where it is MEANINGFUL: the clustered corpus (r11-ann
    # construction), 10 queries from distinct clusters
    cdf = synth(spark, n_rows, n_clusters=1000)
    cdf.write.mode("overwrite").parquet(raw_path)
    cdf = spark.read.parquet(raw_path)
    cbs = PQ.pq_codebooks(cdf, m=8, n_codes=256)
    enc = PQ.pq_encode(cdf, cbs)
    enc.select("vec_id", "pq_code").write.mode("overwrite").parquet(code_path)
    codes = spark.read.parquet(code_path)
    qrows = cdf.filter(F.col("vec_id") < 10).collect()
    hits = {"adc": 0, "rr100": 0, "rr1000": 0}
    t_rr = 0.0
    for r in qrows:
        qv = [float(x) for x in r["embedding"]]
        qv[-1] += 0.003
        exact = [x.neighbor_id for x in knn_bruteforce(cdf, qv, k=10, kernel=True).collect()]
        adc = [x.neighbor_id for x in PQ.pq_adc_topk(codes, cbs, qv, k=10).collect()]
        hits["adc"] += len(set(adc) & set(exact))
        for label, sl in (("rr100", 100), ("rr1000", 1000)):
            t0 = time.monotonic()
            rr = [x.neighbor_id for x in
                  PQ.pq_adc_rerank_topk(codes, cbs, qv, cdf, k=10,
                                        shortlist=sl).collect()]
            if sl == 1000:
                t_rr += time.monotonic() - t0
            hits[label] += len(set(rr) & set(exact))
    n = 10 * len(qrows)
    print(f"clustered corpus recall@10 (m=8 x 256 codes, {len(qrows)} "
          f"queries): raw ADC {hits['adc']/n:.2f}, ADC+R shortlist-100 "
          f"{hits['rr100']/n:.2f}, shortlist-1000 {hits['rr1000']/n:.2f} "
          f"({t_rr/len(qrows):.2f}s/query at 1000)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
