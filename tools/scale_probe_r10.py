"""Round-10 ANN-family scale probe: lsh_knn and ivf_knn against a
1M x 64 synthetic embedding corpus (~500x the sf0.1 embeddings
table), recording wall time, shuffle bytes, and recall@10 vs the
exact brute-force top-10 — the last SCALE.md family whose claims had
only bench-scale measurements behind them (similarity.py:503,592).

Corpus: identical construction to the r9b cluster probe (components
from xxhash64(id, pos) in [-0.5, 0.5]; 5% planted near-dup rows) so
the two probes are comparable; the parquet is cached in /tmp and
shared with r9b when the row count matches.

Recall protocol: the query vector is row 777's embedding perturbed in
the last component by +0.003 (cosine vs row 777 ~0.99998, so the true
nearest neighbor is unambiguous); recall@10 = |ANN top-10 ∩ exact
top-10| / 10. The probe sweeps ivf n_probe (1, 4, 16 of 256 cells)
and lsh multi-probe (radius-1 over 16 planes) to record the
probe-count/recall trade.

Usage: python tools/scale_probe_r10.py [n_rows] [reps]
"""

import json
import os
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
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dim = 64

    from biosets_spark.functions.vectors import cosine
    from biosets_spark.operators.similarity import ivf_build, ivf_knn, lsh_knn
    from biosets_spark.session import get_spark

    spark = get_spark("scale-probe-r10", extra_conf={
        "spark.driver.memory": "48g",
        "spark.sql.shuffle.partitions": "64",
        "spark.ui.enabled": "true",
    })

    path = f"/tmp/probe_r9b_emb_{n_rows}.parquet"
    if not os.path.exists(path):
        synth_embeddings(spark, n_rows).write.parquet(path)
    emb = spark.read.parquet(path)
    n = emb.count()
    vec_bytes = n * dim * 8
    print(f"corpus: {n} vectors x {dim} dims, {vec_bytes / 1e6:.0f} MB raw")

    qrow = emb.filter(F.col("vec_id") == 777).collect()[0]
    query = [float(x) for x in qrow["embedding"]]
    query[-1] += 0.003

    def probe(name, fn):
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
        print(f"{name:28} wall={best:7.2f}s shufW_MB={swm} shufR_MB={srm}",
              flush=True)
        return rows

    qv = F.array(*[F.lit(float(x)) for x in query])
    exact = probe("exact_bruteforce_top10", lambda: [
        r.neighbor_id for r in
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   cosine(F.col("embedding"), qv).alias("sim"))
        .orderBy(F.col("sim").desc(), "neighbor_id").limit(10).collect()])
    exact_set = set(exact)
    print(f"  exact top-10: {sorted(exact_set)}")

    def report(got):
        # in a near-orthogonal random corpus only the planted twin is
        # a REAL neighbor (sim ~0.99998); the exact-top-10 tail sits
        # at background sim ~0.02, so recall@10 mostly measures noise
        # agreement — report the true-neighbor hit separately
        print(f"  recall@10 = {len(set(got) & exact_set) / 10:.2f}  "
              f"planted-neighbor found = {777 in got}")

    report(probe("lsh_knn p=16 expression", lambda: [
        r.neighbor_id for r in
        lsh_knn(emb, query, dim=dim, k=10, n_planes=16).collect()]))
    report(probe("lsh_knn p=16 kernel", lambda: [
        r.neighbor_id for r in
        lsh_knn(emb, query, dim=dim, k=10, n_planes=16,
                kernel=True).collect()]))

    # build once per (n_cells) config; assignment is the scale side
    assigned, cents = None, None

    def build():
        nonlocal assigned, cents
        assigned, cents = ivf_build(emb, n_cells=256)
        assigned = assigned.localCheckpoint()  # materialize assignment
        return assigned.count()

    probe("ivf_build n_cells=256", build)
    for n_probe in (1, 4, 16):
        report(probe(f"ivf_knn n_probe={n_probe}", lambda np_=n_probe: [
            r.neighbor_id for r in
            ivf_knn(assigned, cents, query, k=10, n_probe=np_).collect()]))

    # batch retrieval: 100 query vectors in ONE corpus scan — the
    # shuffle contract is k x batches x queries (id, sim) triples
    # into the final merge, never the corpus
    from biosets_spark.operators.similarity import knn_batch

    qrows = emb.filter(F.col("vec_id") < 100).orderBy("vec_id").collect()
    qs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
          for r in qrows]
    rows = probe("knn_batch 100 queries k=10", lambda: knn_batch(
        emb, qs, k=10).count())
    top1 = {r.qid: r.neighbor_id for r in
            knn_batch(emb, qs, k=10).filter(F.col("rnk") == 1).collect()}
    self_hits = sum(1 for qid, nid in top1.items() if qid == nid)
    print(f"  rows={rows}; top-1 self-hit {self_hits}/100 "
          f"(each query vector exists in the corpus)")


if __name__ == "__main__":
    main()
