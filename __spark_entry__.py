"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query DataFrame at sf0.001
queries()      -> {name: fn(spark, sf_dir) -> DataFrame} per SURVEY §2
oracle_sql()   -> {name: DuckDB-runnable ANSI SQL} for value-hash compare

Query implementations live in biosets_spark/queries.py (relational
inventory) and biosets_spark/queries_ext.py (dedup / similarity / text
/ events extensions); this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from biosets_spark import queries as _q  # noqa: E402
from biosets_spark import queries_ext  # noqa: E402,F401  (registers extension queries)
from biosets_spark import queries_more  # noqa: E402,F401  (registers second-wave queries)
from biosets_spark import queries_wave3  # noqa: E402,F401
from biosets_spark import queries_wave4  # noqa: E402,F401
from biosets_spark.session import apply_session_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the M0 vertical slice —
    metadata-style broadcast join + label encoding + aggregation over
    the star schema (SURVEY §7.1)."""
    apply_session_conf(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast, col, lit

    from biosets_spark import tables
    from biosets_spark.operators import labels as L

    sf_dir = "/root/testdata/sf0.001"
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")

    # enrich orders (data) with customer attributes (sample metadata)
    enriched = o.join(
        broadcast(c.select(col("c_custkey").alias("o_custkey"), "c_mktsegment", "c_nationkey")),
        on="o_custkey", how="left",
    ).join(broadcast(n), col("c_nationkey") == col("n_nationkey"), "left")
    encoded, _ = L.encode_labels(enriched, "c_mktsegment")
    return (
        encoded.groupBy("n_name", "encoded_labels", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .orderBy("n_name", "encoded_labels")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, query in _q.QUERIES.items():
        def make(fn):
            def wrapped(spark, sf_dir, _fn=fn):
                apply_session_conf(spark)
                return _fn(spark, sf_dir)
            return wrapped
        out[name] = make(query.fn)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: query.oracle for name, query in _q.QUERIES.items() if query.oracle}
