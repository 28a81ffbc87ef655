"""Wave-31 semantics: interval union, weighted median."""

from __future__ import annotations

import biosets_spark.queries.wave31  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_interval_union_bounds(spark):
    from pyspark.sql import functions as F

    rows = QUERIES["q_interval_union"].fn(spark, SF_SMOKE).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_events = ev.count()
    total_cov = sum(r["covered_minutes"] for r in rows)
    # union <= sum of raw window lengths (5 min each); > 0
    assert 0 < total_cov <= n_events * 5
    # islands can't outnumber events
    assert sum(r["n_islands"] for r in rows) <= n_events
    # an isolated event contributes exactly 5 minutes: plant one
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:02:00"),
         (1, "2024-01-01 01:00:00")],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    iv = df.select("user_id", F.unix_micros("ts").alias("s"),
                   (F.unix_micros("ts") + 300_000_000).alias("e"))
    from pyspark.sql import Window

    wprev = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1)
    wcum = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    merged = (
        iv.withColumn("ni", F.when(F.col("s") > F.max("e").over(wprev), 1).otherwise(0))
        .withColumn("island", F.sum("ni").over(wcum))
        .groupBy("user_id", "island")
        .agg((F.max("e") - F.min("s")).alias("len_us"))
    )
    lens = sorted(r["len_us"] for r in merged.collect())
    # two overlapping windows (0:00 + 0:02) merge to 7 min; the 1:00
    # event is its own 5-min island
    assert lens == [300_000_000, 420_000_000]


def test_weighted_median_definition(spark):
    rows = {r["flag"]: r for r in QUERIES["q_weighted_median"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "N", "R"}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    import collections

    for flag, r in rows.items():
        pairs = collections.defaultdict(int)
        for x in li:
            if x["l_returnflag"] == flag:
                pairs[round(x["l_extendedprice"], 2)] += int(x["l_quantity"])
        tw = sum(pairs.values())
        assert r["total_weight"] == tw
        cum = 0
        for price in sorted(pairs):
            cum += pairs[price]
            if 2 * cum >= tw:
                assert abs(r["weighted_median"] - price) < 1e-6
                break


def test_gini_bounds_and_uniform_case(spark):
    import biosets_spark.queries.wave32  # noqa: F401

    rows = QUERIES["q_gini_revenue"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert r["n_customers"] > 0
    # hand check: equal values -> gini 0 by the rank formula
    vals = [10.0] * 8
    n, tot = len(vals), sum(vals)
    weighted = sum((2 * (i + 1) - 1) * v for i, v in enumerate(sorted(vals)))
    assert abs(weighted / (n * tot) - 1.0) < 1e-12


def test_decile_lift_consistency(spark):
    import biosets_spark.queries.wave32  # noqa: F401

    rows = QUERIES["q_decile_lift"].fn(spark, SF_SMOKE).collect()
    assert rows
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        assert sorted(x["decile"] for x in rs) == list(range(1, len(rs) + 1))
        # weighted average lift over deciles is 1 by construction
        tot_n = sum(x["n"] for x in rs)
        avg = sum(x["lift"] * x["n"] for x in rs) / tot_n
        assert abs(avg - 1.0) < 0.02, (source, avg)


def test_autocorrelation_bounds(spark):
    import biosets_spark.queries.wave33  # noqa: F401

    rows = QUERIES["q_autocorrelation"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert -1.0 - 1e-6 <= r["acf_1"] <= 1.0 + 1e-6
        assert -1.0 - 1e-6 <= r["acf_7"] <= 1.0 + 1e-6
        assert r["n_days"] == 30


def test_theil_sen_robustness(spark):
    import biosets_spark.queries.wave33  # noqa: F401

    rows = QUERIES["q_theil_sen"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_pairs"] == 30 * 29 // 2  # C(30,2) day pairs
    # hand check: a clean linear series recovers its slope exactly
    import itertools
    import statistics

    ys = [2.0 * d + 1.0 for d in range(10)]
    slopes = [
        (ys[j] - ys[i]) / (j - i)
        for i, j in itertools.combinations(range(10), 2)
    ]
    assert statistics.median(slopes) == 2.0
