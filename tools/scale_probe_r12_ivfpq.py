"""Round-12 probe: trained PQ codebooks + IVF x PQ at 1M x 64.

Answers the two r11-verdict questions:
1. Does Lloyd training (pq_train_codebooks) lift raw-ADC recall@10
   well above the 0.10 the md5-sampled codebooks measured on the
   clustered corpus, at the production shape m=8 x 256 codes?
   -> recall sweep over training iterations {0, 1, 2, 4}.
2. Does the IVF x PQ composition (ivfpq_build / ivfpq_adc_topk)
   bound the scan to n_probe/n_cells of the code table?
   -> rows-scanned fraction + wall for the cell-pruned ADC scan vs
      the full ADC scan, n_cells=256 (kernel assignment path),
      n_probe in {8, 32}, codes written partitionBy(_cell) so the
      probe filter is partition-pruned at the file level.

Usage: python tools/scale_probe_r12_ivfpq.py [n_rows]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from scale_probe_r11_pq import synth  # noqa: E402  (same clustered corpus)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from biosets_spark.operators import pq as PQ
    from biosets_spark.operators.similarity import knn_bruteforce
    from biosets_spark.session import get_spark

    spark = get_spark("scale-probe-r12-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")

    cdf = synth(spark, n_rows, n_clusters=1000)
    raw_path = "/tmp/ivfpq_probe_raw.parquet"
    cdf.write.mode("overwrite").parquet(raw_path)
    cdf = spark.read.parquet(raw_path)

    qrows = cdf.filter(F.col("vec_id") < 10).collect()
    queries = []
    for r in qrows:
        qv = [float(x) for x in r["embedding"]]
        qv[-1] += 0.003
        queries.append(qv)
    exact = [
        [x.neighbor_id for x in knn_bruteforce(cdf, qv, k=10, kernel=True).collect()]
        for qv in queries
    ]

    # --- 1. training sweep -------------------------------------------------
    code_path = "/tmp/ivfpq_probe_codes.parquet"
    for iters in (0, 1, 2, 4):
        t0 = time.monotonic()
        cbs = PQ.pq_train_codebooks(cdf, m=8, n_codes=256, iters=iters)
        t_train = time.monotonic() - t0
        enc = PQ.pq_encode(cdf, cbs, dist_col="pq_dist")
        agg = enc.select(
            F.explode("pq_dist").alias("d")).agg(F.sum("d")).first()
        distortion = int(agg[0])
        enc.select("vec_id", "pq_code").write.mode("overwrite").parquet(code_path)
        codes = spark.read.parquet(code_path)
        hits = 0
        t_adc = 0.0
        for qv, ex in zip(queries, exact):
            t0 = time.monotonic()
            adc = [x.neighbor_id for x in
                   PQ.pq_adc_topk(codes, cbs, qv, k=10).collect()]
            t_adc += time.monotonic() - t0
            hits += len(set(adc) & set(ex))
        print(f"iters={iters}: train={t_train:.1f}s "
              f"distortion={distortion:.3e} "
              f"raw-ADC recall@10={hits/(10*len(queries)):.2f} "
              f"({t_adc/len(queries):.2f}s/query)", flush=True)

    # --- 2. IVF x PQ, raw-space vs residual-space codes --------------------
    for by_residual in (False, True):
        label = "residual" if by_residual else "raw-space"
        t0 = time.monotonic()
        encoded, cents, cbs = PQ.ivfpq_build(
            cdf, n_cells=256, m=8, n_codes=256, train_iters=2,
            by_residual=by_residual)
        ivf_path = f"/tmp/ivfpq_probe_cells_{label}.parquet"
        encoded.write.mode("overwrite").partitionBy("_cell").parquet(ivf_path)
        t_build = time.monotonic() - t0
        encoded = spark.read.parquet(ivf_path)
        total = encoded.count()
        print(f"ivfpq build+write ({label}, 256 cells, m=8x256, "
              f"2 train iters): {t_build:.1f}s", flush=True)

        for n_probe in (8, 32):
            hits = 0
            t_scan = 0.0
            scanned = 0
            for qv, ex in zip(queries, exact):
                t0 = time.monotonic()
                got = [x.neighbor_id for x in
                       PQ.ivfpq_adc_topk(encoded, cents, cbs, qv, k=10,
                                         n_probe=n_probe,
                                         by_residual=by_residual).collect()]
                t_scan += time.monotonic() - t0
                hits += len(set(got) & set(ex))
                import math

                from biosets_spark.operators.cluster import SCALE
                qg = [int(math.floor(x * SCALE + 0.5)) for x in qv]
                ranked = sorted(
                    (sum((a - b) ** 2 for a, b in zip(qg, cv)), ci)
                    for ci, cv in enumerate(cents))
                probe = [ci for _, ci in ranked[:n_probe]]
                scanned += encoded.filter(F.col("_cell").isin(probe)).count()
            frac = scanned / (total * len(queries))
            print(f"  {label} n_probe={n_probe}/256: "
                  f"recall@10={hits/(10*len(queries)):.2f} "
                  f"scan={t_scan/len(queries):.2f}s/query "
                  f"rows-scanned fraction={frac:.4f} "
                  f"(ideal {n_probe/256:.4f})", flush=True)

    # full-ADC baseline wall for comparison (codes of ALL cells)
    t0 = time.monotonic()
    for qv in queries:
        PQ.pq_adc_topk(encoded, cbs, qv, k=10).collect()
    print(f"full ADC scan baseline: {(time.monotonic()-t0)/len(queries):.2f}"
          "s/query", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
