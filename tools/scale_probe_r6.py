"""Round-6 20x scale probe for the heaviest composite queries
(r5 verdict task #5): q_pipeline_clean_corpus, q_dedup_clusters,
q_ann_recall_audit have per-primitive 20x rows in PERFORMANCE.md but
no row for the COMPOSITION. Protocol matches the earlier probes:
20 shifted copies of the sf0.1 corpus (100k docs; every doc has 19
near-identical siblings — deliberately pathological duplicate mass)
and 20 copies of the embeddings table (40k vectors). Reports wall
seconds, s/doc, and total shuffle read+write bytes from the Spark
UI REST API (per-stage metrics summed over the probe's job window).

Usage: python tools/scale_probe_r6.py [sf_dir]  (default sf0.1)
"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _shuffle_bytes(ui_port=4040):
    """Sum shuffle read+write bytes over all completed stages."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages"))
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe-r6")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from biosets_spark import tables
    from biosets_spark.session import apply_session_conf

    apply_session_conf(spark)

    docs0 = tables.load(spark, sf_dir, "documents")
    n0 = docs0.count()
    shifted = [
        docs0.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # shift breaks exact-hash equality across copies for the
            # quality gate, but 4-gram shingles still overlap heavily,
            # so near-dup stages see the full pathological pair mass
            F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(20)
    ]
    docs = shifted[0]
    for s in shifted[1:]:
        docs = docs.unionByName(s)
    docs = docs.repartition(64).cache()
    n_docs = docs.count()
    print(f"probe corpus: {n_docs} docs (base {n0} x 20)")

    results = {}

    def probe(name, fn):
        rd0, wr0 = _shuffle_bytes()
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        rd1, wr1 = _shuffle_bytes()
        results[name] = {
            "sec": round(dt, 1),
            "s_per_kdoc": round(dt / (n_docs / 1000), 3),
            "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
            "out": out,
        }
        print(name, results[name])

    # -- 1. composed clean-corpus pipeline ---------------------------
    def run_pipeline():
        from biosets_spark.operators.pipeline import clean_corpus

        final = clean_corpus(docs, jaccard_threshold=0.5, shingle_n=4)
        rows = (
            final.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .collect()
        )
        return {"survivors": sum(r["n_docs"] for r in rows)}

    probe("pipeline_clean_corpus", run_pipeline)

    # same composition on the documented LSH scale path (use_lsh=True)
    def run_pipeline_lsh():
        from biosets_spark.operators.pipeline import clean_corpus

        final = clean_corpus(docs, jaccard_threshold=0.5, shingle_n=4,
                             use_lsh=True)
        rows = (
            final.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .collect()
        )
        return {"survivors": sum(r["n_docs"] for r in rows)}

    probe("pipeline_clean_corpus_lsh", run_pipeline_lsh)

    # -- 2. dedup clusters (pairs -> connected components -> sizes) --
    def run_clusters():
        from biosets_spark.operators.dedup import minhash_lsh_pairs
        from biosets_spark.operators.graph import dedup_clusters

        # at 20x duplicate mass the bounded ngram-jaccard self-join is
        # deliberately swapped for the banded-LSH pair generator — the
        # documented scale path the composition is supposed to take
        pairs = minhash_lsh_pairs(docs, threshold=0.5)
        decided = dedup_clusters(docs, pairs)
        hist = (
            decided.groupBy("cluster_id")
            .agg(F.count("*").alias("sz"))
            .groupBy("sz").count().collect()
        )
        return {"size_hist": sorted((r["sz"], r["count"]) for r in hist)[:5]}

    probe("dedup_clusters", run_clusters)

    # -- 3. ANN recall audit at 20x vectors --------------------------
    def run_ann():
        from biosets_spark.operators import similarity as S

        emb0 = tables.load(spark, sf_dir, "embeddings")
        copies = [
            emb0.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                "embedding",
            )
            for i in range(20)
        ]
        emb = copies[0]
        for c in copies[1:]:
            emb = emb.unionByName(c)
        emb = emb.repartition(64).cache()
        n_vec = emb.count()
        qv = [r["embedding"] for r in emb0.filter(F.col("vec_id") == 0).collect()][0]
        exact = S.knn_bruteforce(emb, qv, k=10, exclude_self=0).select("neighbor_id")
        assigned, cents = S.ivf_build(emb.filter(F.col("vec_id") != 0), n_cells=64)
        ivf = S.ivf_knn(assigned, cents, qv, k=10, n_probe=8).select("neighbor_id")
        hits = ivf.join(exact, "neighbor_id").count()
        emb.unpersist()
        return {"n_vectors": n_vec, "recall_at_10": hits / 10.0}

    probe("ann_recall_audit", run_ann)

    docs.unpersist()
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()
