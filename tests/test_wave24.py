"""Wave-24 semantics: quantile normalization, CLR transform."""

from __future__ import annotations

import math

import biosets_spark.queries.wave24  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_quantile_normalize_reference_is_sorted(spark):
    rows = QUERIES["q_quantile_normalize"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 64  # one reference value per embedding dim rank
    n = rows[0]["n_samples"]
    prev = None
    for r in rows:
        assert r["n_samples"] == n  # every sample contributes each rank
        if prev is not None:
            # per-rank means of sorted values are themselves sorted
            assert r["ref_value"] >= prev - 1e-9
        prev = r["ref_value"]


def test_clr_centering_property(spark):
    from pyspark.sql import functions as F

    rows = QUERIES["q_clr_transform"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_items"] >= 3
        # clr values center on zero: max >= 0 >= min (strictly, unless
        # all quantities equal -> both 0)
        assert r["max_clr"] >= -1e-9 and r["min_clr"] <= 1e-9
        assert r["max_clr"] >= r["min_clr"]
    # exact centering on a hand computation for one order
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .filter(F.col("l_orderkey") == rows[0]["l_orderkey"])
        .select("l_quantity").collect()
    )
    lns = [math.log(x["l_quantity"]) for x in li]
    mean_ln = sum(lns) / len(lns)
    assert math.isclose(max(lns) - mean_ln, rows[0]["max_clr"], abs_tol=1e-4)
