"""Round-11 ANN recall calibration on a CLUSTERED corpus.

The r10 probe measured IVF recall@10 on a near-orthogonal random
corpus, where the non-planted tail of the exact top-10 is noise
agreement and recall is structurally meaningless (0.10/0.20/0.50 at
n_probe 1/4/16). Real embedding corpora are clustered; this probe
builds one and measures the recall-vs-n_probe curve where it is
meaningful.

Corpus: ``n_rows`` rows in ``n_clusters`` planted clusters. Cluster
center components are xxhash64-derived in [-0.5, 0.5]; each point =
its center + noise * xxhash64-derived offsets. At noise=0.15 and
dim=64 intra-cluster cosine ~ 0.9 while inter-cluster cosine ~ 0.0 —
the "topic cluster" regime IVF is built for.

Protocol: ivf_build(n_cells) with the production row-sample centroid
init; ``n_queries`` query vectors are corpus points from distinct
clusters, each perturbed in one component (so the query is not any
corpus row but its cluster is unambiguous); recall@10 = mean over
queries of |ivf_knn top-10 ∩ exact brute-force top-10| / 10.
Sweeps n_probe; also reports the fraction of each query's exact
top-10 that lives in the single best cell (the ceiling for n_probe=1).

Usage: python tools/scale_probe_r11_ann.py [n_rows] [n_clusters] [n_cells] [n_queries]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def synth_clustered(spark, n_rows: int, n_clusters: int, dim: int = 64,
                    noise: float = 0.15):
    cid = F.pmod(F.col("vec_id"), F.lit(n_clusters))
    comps = []
    for j in range(dim):
        center = (F.pmod(F.xxhash64(cid, F.lit(j)), F.lit(1_000_001))
                  - F.lit(500_000)) / F.lit(1e6)
        nz = (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j), F.lit("n")),
                     F.lit(1_000_001)) - F.lit(500_000)) / F.lit(1e6)
        comps.append(center + nz * F.lit(noise))
    return (
        spark.range(n_rows, numPartitions=64)
        .withColumnRenamed("id", "vec_id")
        .select("vec_id", F.array(*comps).alias("embedding"))
    )


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    from biosets_spark.operators.similarity import ivf_build, ivf_knn, knn_batch
    from biosets_spark.session import get_spark

    spark = get_spark("scale-probe-r11-ann")
    spark.sparkContext.setLogLevel("ERROR")

    df = synth_clustered(spark, n_rows, n_clusters)
    df = df.persist()
    df.count()

    # query vectors: one corpus row per distinct cluster, last
    # component nudged so the query is near but not equal to the row
    qrows = (df.filter(F.pmod(F.col("vec_id"), F.lit(n_clusters))
                       == F.col("vec_id"))  # rows 0..n_clusters-1
             .filter(F.col("vec_id") < n_queries).collect())
    queries = []
    for r in qrows:
        v = [float(x) for x in r["embedding"]]
        v[-1] += 0.003
        queries.append((int(r["vec_id"]), v))
    print(f"corpus={n_rows}x64 clusters={n_clusters} cells={n_cells} "
          f"queries={len(queries)}", flush=True)

    # exact ground truth in ONE pass over the corpus (knn_batch)
    t0 = time.monotonic()
    exact = {}
    for r in knn_batch(df, queries, k=10).collect():
        exact.setdefault(r.qid, []).append(r.neighbor_id)
    t_exact = time.monotonic() - t0
    print(f"exact knn_batch ground truth: {t_exact:.1f}s", flush=True)

    t0 = time.monotonic()
    assigned, cents = ivf_build(df, n_cells=n_cells)
    assigned = assigned.persist()
    assigned.count()
    t_build = time.monotonic() - t0
    print(f"ivf_build({n_cells}): {t_build:.1f}s", flush=True)

    # ceiling diagnostic: how much of the exact top-10 is in one cell
    truth_ids = sorted({n for ns in exact.values() for n in ns})
    cell_of = {r.vec_id: r._cell for r in
               assigned.filter(F.col("vec_id").isin(truth_ids))
               .select("vec_id", "_cell").collect()}
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.monotonic()
        hits = 0
        for qid, vec in queries:
            got = [r.neighbor_id for r in
                   ivf_knn(assigned, cents, vec, k=10, n_probe=n_probe).collect()]
            hits += len(set(got) & set(exact[qid]))
        rec = hits / (10 * len(queries))
        wall = time.monotonic() - t0
        print(f"n_probe={n_probe:3}: recall@10={rec:.3f} "
              f"({wall/len(queries):.2f}s/query)", flush=True)

    # distribution of exact-neighbor cells per query (spread ceiling)
    spreads = []
    for qid, ns in exact.items():
        cells = {cell_of[n] for n in ns if n in cell_of}
        spreads.append(len(cells))
    spreads.sort()
    print(f"exact-top10 cell spread per query: min={spreads[0]} "
          f"median={spreads[len(spreads)//2]} max={spreads[-1]}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
