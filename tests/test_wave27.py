"""Wave-27 semantics: CUSUM change-point, SAX symbolization."""

from __future__ import annotations

import biosets_spark.queries.wave27  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cusum_changepoint_rows(spark):
    rows = QUERIES["q_cusum_changepoint"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["max_cusum"] >= 0.0
        assert r["changepoint_day"] is not None


def test_cusum_detects_planted_shift(spark):
    """A series with a level shift peaks its |CUSUM| at the shift."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    vals = [1.0] * 10 + [5.0] * 10
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "day int, m double"
    )
    mu = sum(vals) / len(vals)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = df.withColumn(
        "c", F.sum(F.round(F.col("m") - F.lit(mu), 6).cast("decimal(38,6)")).over(w)
    )
    peak = c.orderBy(F.abs(F.col("c")).desc(), "day").first()
    assert peak["day"] == 9  # |CUSUM| maximal just before the shift


def test_sax_strings(spark):
    rows = QUERIES["q_sax_symbolize"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r["sax"]) == r["n_days"]
        assert set(r["sax"]) <= set("abcd")
        # quartile bucketing: roughly a quarter of days per symbol
        for letter in "abcd":
            assert r["sax"].count(letter) >= r["n_days"] // 8
