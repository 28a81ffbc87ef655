"""r13 measurement probe (guide §1): build/first/warm phase split plus
job counts for the round's target queries.

build  = query-fn call (plan construction + any eager decision jobs)
first  = cold collect
warm   = second build+collect (fresh fn call, caches cleared between
         reps via release_pinned_indexes + clearCache so every rep
         pays the one-pass bench regime)

Job counts come from StatusTracker (jobs submitted without a group all
land in group None), so a fold that removes a decision job is directly
visible.
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
from biosets_spark import release_pinned_indexes  # noqa: E402
from biosets_spark.session import get_spark  # noqa: E402

TARGETS = [
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_pipeline_clean_corpus",
    "q_components_user_chains",
    "q_dedup_clusters",
    "q_pipeline_curated_corpus",
    "q_pca_power",
    "q_dedup_ngram_jaccard",
    "q_dedup_ngram_jaccard_bounded",
    "q_graph_assortativity",
    "q_powerlaw_alpha",
    "q_pipeline_funnel",
    "q_triangle_count",
    "q_pagerank_nations",
    "q_mann_whitney",
    "q_knn_pairs",
    "q_text_entropy",
    "q_weighted_median",
    "q_skyline_orders",
]


def n_jobs(sc) -> int:
    return len(sc.statusTracker().getJobIdsForGroup(None) or [])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-r13-phases")
    sc = spark.sparkContext
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()

    out = {}
    for name in TARGETS:
        query = _q.QUERIES[name]
        reps = []
        for rep in range(2):
            release_pinned_indexes()
            spark.catalog.clearCache()
            j0 = n_jobs(sc)
            t0 = time.time()
            df = query.fn(spark, sf_dir)
            t1 = time.time()
            jb = n_jobs(sc)
            df.collect()
            t2 = time.time()
            j2 = n_jobs(sc)
            reps.append({
                "build": round(t1 - t0, 3),
                "collect": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
                "build_jobs": jb - j0,
                "collect_jobs": j2 - jb,
            })
        out[name] = reps
        print(name, json.dumps(reps), flush=True)
    Path("/tmp/probe_r13_phases.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
