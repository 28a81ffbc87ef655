"""20x scale probe for the round-6 second-session plan rewrites.

The five structural rewrites (PERFORMANCE.md "Round-6 second-session
plan rewrites") were measured at sf0.1; this probe re-runs the SHIPPED
query functions — not re-implementations — against a 20x materialized
copy of the fact tables (orders/lineitem/documents/embeddings with
shifted keys; dimension tables kept 1x, exactly what scale does to a
star schema), reporting wall seconds and shuffle read/write bytes per
query so the rewrites' scale claims are measured, not asserted:

- q_waiting_suppliers      two-level (order, supplier) agg, no Expand
- q_basket_pairs           basket-local C(k,2) pair expansion
- q_lift_rules             same expansion feeding lift
- q_triangle_count         co-occurrence edge list via expansion
- q_ngram_novelty          first-seen doc per shingle via window min
- q_random_projection      JL sign matrix as per-row array literals
- q_mann_whitney           integer-cents rank histogram

Usage: python tools/scale_probe_r6c.py [sf_dir] [copies]
(defaults: /root/testdata/sf0.1, 20)
"""

import json
import shutil
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _shuffle_bytes(ui_port=4040):
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages"))
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


PROBES = [
    "q_waiting_suppliers",
    "q_basket_pairs",
    "q_lift_rules",
    "q_triangle_count",
    "q_ngram_novelty",
    "q_random_projection",
    "q_mann_whitney",
]

KEY_SHIFT = 100_000_000


def build_corpus(spark, sf_dir: str, out_dir: str, copies: int) -> None:
    """Materialize a ``copies``x star schema: fact keys shifted per
    copy (order keys jointly in orders+lineitem so the join topology is
    preserved), dims copied as-is."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for dim in ["region", "nation", "customer", "supplier", "part", "events"]:
        shutil.copy(Path(sf_dir) / f"{dim}.parquet", out / f"{dim}.parquet")

    def fan(df, exprs):
        parts = [df.select(*exprs(i)) for i in range(copies)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    orders = spark.read.parquet(str(Path(sf_dir) / "orders.parquet"))
    fan(orders, lambda i: [
        (F.col("o_orderkey") + F.lit(i * KEY_SHIFT)).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ]).repartition(64).write.mode("overwrite").parquet(str(out / "orders.parquet"))

    li = spark.read.parquet(str(Path(sf_dir) / "lineitem.parquet"))
    fan(li, lambda i: [
        (F.col("l_orderkey") + F.lit(i * KEY_SHIFT)).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ]).repartition(64).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    docs = spark.read.parquet(str(Path(sf_dir) / "documents.parquet"))
    fan(docs, lambda i: [
        (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
        # copytag breaks exact duplication; shingle mass still overlaps
        F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
        "lang", "source", "n_chars",
    ]).repartition(64).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    emb = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet"))
    fan(emb, lambda i: [
        (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
        "embedding", "label",
    ]).repartition(32).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe-r6c")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from biosets_spark.session import apply_session_conf

    apply_session_conf(spark)
    import __spark_entry__ as entry

    qs = entry.queries()

    work = tempfile.mkdtemp(prefix="probe20x_")
    t0 = time.time()
    build_corpus(spark, sf_dir, work, copies)
    print(f"materialized {copies}x corpus at {work} in {time.time()-t0:.0f}s")

    results = {}
    for name in PROBES:
        rd0, wr0 = _shuffle_bytes()
        t0 = time.time()
        rows = qs[name](spark, work).collect()
        dt = time.time() - t0
        rd1, wr1 = _shuffle_bytes()
        results[name] = {
            "sec": round(dt, 1),
            "rows": len(rows),
            "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
        }
        print(name, results[name], flush=True)

    print(json.dumps({"copies": copies, "results": results}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
