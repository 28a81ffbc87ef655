"""Round-9 cluster-family scale probe: kmeans_fit and
semantic_dup_pairs against a 500k x 64 synthetic embedding corpus
(250x the sf0.1 embeddings table), recording wall time AND shuffle
bytes — converting docs/SCALE.md's claims ("the k-means collect is
the model, not the data"; "SemDeDup shuffles (id, cell, vec) once")
into measured numbers.

Corpus: components drawn deterministically from xxhash64(id, pos) in
[-0.5, 0.5]; 5% of rows (id % 20 == 1) copy their predecessor's
vector except the last component, perturbed by <= 0.005 — cosine
~0.999997 against a background pair distribution of N(0, 0.125), so
planted recall is unambiguous at threshold 0.99. Generated JVM-side,
materialized to parquet and read back (the scale_probe_r9 lesson: a
spark.range corpus carries RangePartitioning that can hide aggregate
exchanges).

semantic_dup_pairs runs at k=1024 cells (~490 docs/cell), which
routes assignment through the large-k BLAS kernel — the path a real
SemDeDup configuration (~100k cells) uses.

Usage: python tools/scale_probe_r9b.py [n_rows] [reps]
"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def synth_embeddings(spark, n_rows: int, dim: int = 64):
    base = F.when(F.col("vec_id") % 20 == 1, F.col("vec_id") - 1).otherwise(
        F.col("vec_id"))
    comps = []
    for j in range(dim):
        c = (F.pmod(F.xxhash64(base, F.lit(j)), F.lit(1_000_001))
             - F.lit(500_000)) / F.lit(1e6)
        if j == dim - 1:
            # near-dups ADD a <= 0.005 perturbation (from their own
            # id) to the predecessor's last component: cosine vs the
            # original ~0.999997, far above the 0.99 gate
            raw = (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)),
                          F.lit(1_000_001)) - F.lit(500_000)) / F.lit(1e6)
            c = F.when(F.col("vec_id") % 20 == 1,
                       c + raw / F.lit(100.0)).otherwise(c)
        comps.append(c)
    return (
        spark.range(n_rows, numPartitions=64)
        .withColumnRenamed("id", "vec_id")
        .select("vec_id", F.array(*comps).alias("embedding"))
    )


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
    except Exception as exc:
        print(f"  (shuffle bytes unavailable: {exc})")
        return None, None


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from biosets_spark.operators.cluster import kmeans_fit, semantic_dup_pairs
    from biosets_spark.session import get_spark

    spark = get_spark("scale-probe-r9b", extra_conf={
        "spark.driver.memory": "48g",
        "spark.sql.shuffle.partitions": "64",
        "spark.ui.enabled": "true",
    })

    import os
    path = f"/tmp/probe_r9b_emb_{n_rows}.parquet"
    if not os.path.exists(path):
        synth_embeddings(spark, n_rows).write.parquet(path)
    emb = spark.read.parquet(path)
    n = emb.count()
    vec_bytes = n * 64 * 8
    expected_pairs = sum(1 for i in range(n_rows) if i % 20 == 1)
    data_mb = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")) / 1e6
    print(f"corpus: {n} vectors x 64 dims, {vec_bytes / 1e6:.0f} MB raw "
          f"({data_mb:.0f} MB parquet), ~{expected_pairs} planted near-dups")

    def probe(name, fn, count_planted=None):
        best, rows, sw, sr = float("inf"), None, None, None
        for rep in range(reps):
            spark.catalog.clearCache()
            w0, r0 = shuffle_totals(spark)
            t0 = time.time()
            rows = fn()
            dt = time.time() - t0
            w1, r1 = shuffle_totals(spark)
            if rep == 0 and w0 is not None:
                sw, sr = w1 - w0, r1 - r0
            best = min(best, dt)
        swm = f"{sw / 1e6:9.1f}" if sw is not None else "      n/a"
        srm = f"{sr / 1e6:9.1f}" if sr is not None else "      n/a"
        ratio = f"{sw / vec_bytes:10.3f}" if sw is not None else "       n/a"
        planted = (f" planted={count_planted():.1f}%"
                   if count_planted else "")
        print(f"{name:22} wall={best:6.1f}s rows={rows:>9} "
              f"shufW_MB={swm} shufR_MB={srm} shufW/raw={ratio}{planted}")

    # k-means: 2 Lloyd cycles + final E-step; the scale claim is that
    # shuffle is the (cell,pos) model aggregate, not the vector data
    def run_kmeans():
        assigned, cents = kmeans_fit(emb, k=64, iters=2)
        return assigned.groupBy("_cell").count().count()

    probe("kmeans_fit k=64 it=2", run_kmeans)

    # SemDeDup at a realistic cell count: assignment via the BLAS
    # kernel, one (id, cell, vec) shuffle into per-cell pair kernels
    pairs_df = {}

    def run_semdedup():
        p = semantic_dup_pairs(emb, k=1024, threshold_num=99,
                               threshold_den=100)
        pairs_df["p"] = p
        return p.count()

    def planted_recall():
        found = pairs_df["p"].filter(
            (F.col("id_b") - F.col("id_a") == 1)
            & (F.col("id_b") % 20 == 1)).count()
        return 100.0 * found / max(expected_pairs, 1)

    probe("semantic_dup k=1024", run_semdedup, planted_recall)
    spark.stop()


if __name__ == "__main__":
    main()
