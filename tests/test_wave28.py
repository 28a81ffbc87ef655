"""Wave-28 semantics: A/B z-test, Kaplan-Meier survival."""

from __future__ import annotations

import math

import biosets_spark.queries.wave28  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_ab_test_z_consistency(spark):
    r = QUERIES["q_ab_test_z"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n0"] > 0 and r["n1"] > 0
    assert 0 <= r["x0"] <= r["n0"] and 0 <= r["x1"] <= r["n1"]
    # recompute z from the reported counts
    p0, p1 = r["x0"] / r["n0"], r["x1"] / r["n1"]
    pp = (r["x0"] + r["x1"]) / (r["n0"] + r["n1"])
    z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1 / r["n0"] + 1 / r["n1"]))
    assert math.isclose(r["z"], round(z, 6), abs_tol=2e-6)
    assert math.isclose(r["diff"], round(p0 - p1, 6), abs_tol=2e-6)


def test_survival_km_curve_properties(spark):
    rows = QUERIES["q_survival_km"].fn(spark, SF_SMOKE).collect()
    assert rows
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in sorted(rows, key=lambda r: r["hour"]):
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-9  # monotone non-increasing
        if prev_n is not None:
            assert r["n_at_risk"] <= prev_n  # risk set shrinks
        assert r["n_events"] <= r["n_at_risk"]
        prev_s, prev_n = r["survival"], r["n_at_risk"]


def test_survival_km_matches_product_form(spark):
    """S at the last reported hour equals prod(1 - d/n) computed
    directly from the reported table."""
    rows = sorted(
        QUERIES["q_survival_km"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["hour"],
    )
    s = 1.0
    for r in rows:
        s *= 1.0 - r["n_events"] / r["n_at_risk"]
    assert math.isclose(rows[-1]["survival"], s, rel_tol=1e-4)


def test_bootstrap_ci_brackets_true_mean(spark):
    import biosets_spark.queries.wave29  # noqa: F401

    from pyspark.sql import functions as F

    r = QUERIES["q_bootstrap_ci"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_resamples"] == 64
    true_mean = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
              / F.count("*")).alias("m"))
        .collect()[0]["m"]
    )
    # the 95% CI should bracket the sample mean and be reasonably tight
    assert r["ci_lo"] < true_mean < r["ci_hi"]
    assert (r["ci_hi"] - r["ci_lo"]) < 0.2 * true_mean
    assert r["ci_lo"] < r["boot_mean"] < r["ci_hi"]


def test_bootstrap_deterministic(spark):
    import biosets_spark.queries.wave29  # noqa: F401

    a = QUERIES["q_bootstrap_ci"].fn(spark, SF_SMOKE).collect()
    b = QUERIES["q_bootstrap_ci"].fn(spark, SF_SMOKE).collect()
    assert a == b


def test_welch_ttest_formula(spark):
    import biosets_spark.queries.wave30  # noqa: F401

    r = QUERIES["q_welch_ttest"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n0"] > 0 and r["n1"] > 0
    assert r["n0"] + r["n1"] == 1500  # sf0.001 orders
    # df bounded by min(n)-1 .. n0+n1-2 for Welch
    assert min(r["n0"], r["n1"]) - 1 <= r["df"] <= r["n0"] + r["n1"] - 2


def test_ols_normal_eq_against_numpy(spark):
    import numpy as np

    import biosets_spark.queries.wave30  # noqa: F401

    r = QUERIES["q_ols_normal_eq"].fn(spark, SF_SMOKE).collect()[0]
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    from pyspark.sql import functions as F

    feat = li.groupBy("l_orderkey").agg(
        F.count("*").alias("x1"), F.sum("l_quantity").alias("x2"))
    rows = feat.join(o, feat["l_orderkey"] == o["o_orderkey"]).select(
        "x1", "x2", F.round("o_totalprice", 2).alias("y")).collect()
    X = np.array([[1.0, float(x["x1"]), float(x["x2"])] for x in rows])
    y = np.array([float(x["y"]) for x in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(beta[1] - r["beta_items"]) < 1e-2
    assert abs(beta[2] - r["beta_qty"]) < 1e-2
    assert abs(beta[0] - r["intercept"]) < 1.0
    assert 0.0 <= r["r2"] <= 1.0
