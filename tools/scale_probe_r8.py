"""Round-8 5x spot-bench of the five dedup headliners (r7 verdict
task #7): q_dedup_minhash_lsh, q_dedup_simhash, q_dedup_ngram_jaccard,
q_dedup_clusters, q_pipeline_clean_corpus.

Protocol matches the r5/r6 probes: N shifted copies of the sf0.1
documents corpus (doc_id offsets; shifted ids break exact-hash
equality for the quality gates while 4-gram shingles still overlap
heavily across copies — deliberately PATHOLOGICAL duplicate mass, a
worst case for near-dup pair growth, not a realistic 5x corpus).
Each query runs against BOTH the sf0.1 base (same boot, so the
comparison is drift-free) and the 5x materialized corpus; reports
wall seconds and ms/doc for each, and the growth exponent
log(t5/t1)/log(5) — ~1.0 means linear scaling, ~2.0 quadratic.

Usage: python tools/scale_probe_r8.py [sf_dir] [n_copies]
"""

import math
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

HEADLINERS = (
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_clusters",
    "q_pipeline_clean_corpus",
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe-r8")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from biosets_spark import tables
    from biosets_spark.session import apply_session_conf

    apply_session_conf(spark)
    import __spark_entry__ as entry

    queries = entry.queries()

    # materialize the Nx corpus once (probe dir reuses sf0.1 for every
    # other table via symlink so any auxiliary load still works)
    probe_dir = f"/tmp/sf_probe_r8_{n_copies}x"
    docs_path = os.path.join(probe_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        shutil.rmtree(probe_dir, ignore_errors=True)
        os.makedirs(probe_dir)
        for t in tables.ALL_TABLES:
            if t != "documents":
                os.symlink(os.path.join(sf_dir, f"{t}.parquet"),
                           os.path.join(probe_dir, f"{t}.parquet"))
        docs0 = tables.load(spark, sf_dir, "documents")
        parts = [
            docs0.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                *[c for c in docs0.columns if c != "doc_id"],
            )
            for i in range(n_copies)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(64).write.parquet(docs_path)
    n_base = tables.load(spark, sf_dir, "documents").count()
    n_big = spark.read.parquet(docs_path).count()
    print(f"base docs={n_base}  probe docs={n_big}  ({n_copies}x)")

    print(f"{'query':34} {'t_1x':>7} {'t_Nx':>8} {'ms/doc_1x':>10} "
          f"{'ms/doc_Nx':>10} {'exponent':>9}")
    def timed_min(fn, d, reps=2):
        # min over warm reps: a single cold rep is dominated by
        # plan/codegen/JIT overhead at this corpus size and distorts
        # the growth exponent
        best = float("inf")
        for _ in range(reps + 1):
            t0 = time.time()
            fn(spark, d).collect()
            best = min(best, time.time() - t0)
        return best

    for name in HEADLINERS:
        fn = queries[name]
        t1x = timed_min(fn, sf_dir)
        tnx = timed_min(fn, probe_dir)
        expo = math.log(tnx / t1x) / math.log(n_copies)
        print(f"{name:34} {t1x:6.1f}s {tnx:7.1f}s "
              f"{1000 * t1x / n_base:9.2f} {1000 * tnx / n_big:9.2f} "
              f"{expo:9.2f}")


if __name__ == "__main__":
    main()
