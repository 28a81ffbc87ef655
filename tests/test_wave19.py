"""Wave-19 semantics: drift statistics, EWMA, weighted sampling,
SCD2 point-in-time joins, fixed-iteration PageRank.

Invariant-level checks on the driver tables (SF_SMOKE) plus
hand-built micro-frames where the expected value is computable by
hand. Oracle equality is covered by tools/check_oracle.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import biosets_spark.queries.wave19  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_ks_drift_bounds_and_identity(spark):
    rows = QUERIES["q_ks_drift"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["ks"] <= 1.0
        assert r["n_early"] > 0 and r["n_late"] > 0
    # identical samples => KS exactly 0 (same CDF at every point)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0)], "k string, v double"
    )
    both = df.withColumn("e", F.lit(1)).union(df.withColumn("e", F.lit(0)))
    g = both.groupBy("k", "v").agg(
        F.sum("e").alias("n1"), F.sum(1 - F.col("e")).alias("n2")
    )
    # with n1 == n2 per value, every cumulative gap is zero
    assert g.filter(F.col("n1") != F.col("n2")).count() == 0


def test_psi_identical_cohorts_is_zero(spark):
    rows = QUERIES["q_psi_drift"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        # PSI is a sum of (pa-pb)*ln(pa/pb) terms, each >= 0
        assert r["psi"] >= 0.0
        assert r["n_old"] > 0 and r["n_new"] > 0


def test_chi2_contributions_nonnegative(spark):
    rows = QUERIES["q_chi2_assoc"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    total_orders = sum(r["n_orders"] for r in rows)
    assert total_orders == 1500  # sf0.001 orders
    for r in rows:
        assert r["chi2_contrib"] >= 0.0


def test_ewma_stays_within_window_range(spark):
    out = QUERIES["q_ewma_daily"].fn(spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "daily series empty"
    # EWMA is a convex combination of the window's daily means, so it
    # must lie within the global [min, max] of daily means per type
    daily = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.avg(F.round("value", 2)).alias("m"))
        .groupBy("event_type")
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    )
    bounds = {r["event_type"]: (r["lo"], r["hi"]) for r in daily.collect()}
    for r in rows:
        lo, hi = bounds[r["event_type"]]
        assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6


def test_ewma_constant_series_is_constant(spark):
    # hand-built: constant daily means -> EWMA equals the constant
    df = spark.createDataFrame(
        [("x", f"2024-01-{d:02d}", 5.0) for d in range(1, 11)],
        "event_type string, day string, m double",
    ).select("event_type", F.col("day").cast("date").alias("day"), "m")
    d1, d2 = df.alias("d1"), df.alias("d2")
    k = F.datediff(F.col("d1.day"), F.col("d2.day"))
    num = F.sum(F.col("d2.m") / F.pow(F.lit(2.0), k))
    den = F.sum(F.lit(1.0) / F.pow(F.lit(2.0), k))
    out = (
        d1.join(
            d2,
            (F.col("d1.event_type") == F.col("d2.event_type"))
            & (F.col("d2.day") >= F.date_sub(F.col("d1.day"), 13))
            & (F.col("d2.day") <= F.col("d1.day")),
        )
        .groupBy(F.col("d1.day"))
        .agg((num / den).alias("ewma"))
        .collect()
    )
    for r in out:
        assert math.isclose(r["ewma"], 5.0, rel_tol=1e-12)


def test_weighted_sample_deterministic_and_ranked(spark):
    a = QUERIES["q_weighted_sample"].fn(spark, SF_SMOKE).collect()
    b = QUERIES["q_weighted_sample"].fn(spark, SF_SMOKE).collect()
    assert a == b  # same md5 keys -> identical sample every run
    per_seg: dict[str, list[int]] = {}
    for r in a:
        per_seg.setdefault(r["seg"], []).append(r["rn"])
        assert r["o_totalprice"] > 0
    for seg, rns in per_seg.items():
        assert sorted(rns) == list(range(1, 11)), seg
    # without replacement: no order sampled twice within a segment
    keys = [(r["seg"], r["o_orderkey"]) for r in a]
    assert len(keys) == len(set(keys))


def test_scd2_intervals_partition_purchases(spark):
    ev = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", "signup"),
            (2, 100, "2024-01-03 00:00:00", "error"),
            (3, 100, "2024-01-02 00:00:00", "purchase"),  # in signup state
            (4, 100, "2024-01-04 00:00:00", "purchase"),  # in error state
            (5, 200, "2024-01-01 00:00:00", "purchase"),  # before any state: dropped
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
             "event_type", F.lit(1.0).alias("value"))
    from pyspark.sql import Window

    wlead = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type").isin("signup", "error"))
        .select("user_id", F.col("event_type").alias("state"),
                F.col("ts").alias("valid_from"),
                F.coalesce(F.lead("ts").over(wlead),
                           F.lit("2100-01-01").cast("timestamp")).alias("valid_to"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    got = {
        (r["state"], r["n"]) for r in
        p.join(dim, (F.col("p_user") == F.col("user_id"))
               & (F.col("p_ts") >= F.col("valid_from"))
               & (F.col("p_ts") < F.col("valid_to")))
        .groupBy("state").agg(F.count("*").alias("n")).collect()
    }
    assert got == {("signup", 1), ("error", 1)}
    # exactly one state matches any in-range purchase: intervals tile
    n_matched = (
        p.join(dim, (F.col("p_user") == F.col("user_id"))
               & (F.col("p_ts") >= F.col("valid_from"))
               & (F.col("p_ts") < F.col("valid_to"))).count()
    )
    assert n_matched == 2


def test_pagerank_mass_and_uniform_graph(spark):
    rows = QUERIES["q_pagerank_nations"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    mass = sum(r["pagerank"] for r in rows)
    # rank mass stays near 1 (dangling leak only; every nation trades
    # in TPC-H so out-degrees are all nonzero)
    assert 0.9 <= mass <= 1.01
    for r in rows:
        assert r["pagerank"] >= 0.15 / 25 - 1e-9
