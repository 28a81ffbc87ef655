"""Wave-25 semantics: alpha diversity, Bray-Curtis dissimilarity."""

from __future__ import annotations

import math

import biosets_spark.queries.wave25  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_alpha_diversity_bounds(spark):
    rows = QUERIES["q_alpha_diversity"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["richness"] >= 3
        # Shannon bounded by ln(richness); Simpson and evenness in [0,1]
        assert -1e-9 <= r["shannon"] <= math.log(r["richness"]) + 1e-6
        assert 0.0 <= r["simpson"] <= 1.0
        assert -1e-9 <= r["evenness"] <= 1.0 + 1e-9


def test_alpha_diversity_uniform_composition(spark):
    # hand check: a perfectly even composition has evenness 1
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [(1, p, 5) for p in range(4)], "l_orderkey long, l_partkey long, q long"
    )
    tot = li.groupBy("l_orderkey").agg(F.sum("q").alias("n"), F.count("*").alias("rich"))
    p = F.col("q").cast("double") / F.col("n")
    h = (
        li.join(tot, "l_orderkey")
        .agg(F.sum(-p * F.log(p)).alias("h"))
        .collect()[0]["h"]
    )
    assert math.isclose(h, math.log(4), rel_tol=1e-12)


def test_bray_curtis_bounds_and_identity(spark):
    rows = QUERIES["q_bray_curtis"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["bray_curtis"] <= 1.0
        assert r["order_a"] != r["order_b"]
    # identical compositions -> BC == 0 (pure integer arithmetic)
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(1, 10), (2, 20)], "part long, qa long")
    b = spark.createDataFrame([(1, 10), (2, 20)], "part long, qb long")
    m = a.join(b, "part", "full_outer").select(
        F.coalesce("qa", F.lit(0)).alias("qa"), F.coalesce("qb", F.lit(0)).alias("qb")
    )
    bc = m.agg(
        (F.sum(F.abs(F.col("qa") - F.col("qb"))).cast("double")
         / F.sum(F.col("qa") + F.col("qb"))).alias("bc")
    ).collect()[0]["bc"]
    assert bc == 0.0
