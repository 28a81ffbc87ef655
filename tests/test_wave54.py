"""Wave-54 semantics: threshold sweep, calibration bins."""

from __future__ import annotations

import hashlib

import biosets_spark.queries.wave54  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_threshold_sweep_consistency(spark):
    rows = QUERIES["q_threshold_sweep"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cents = [(round(o["o_totalprice"] * 100),
              o["o_orderpriority"] == "1-URGENT") for o in orders]
    p = sum(1 for _, pos in cents if pos)
    assert len(rows) == 9
    for r in rows:
        tp = sum(1 for c, pos in cents if pos and c > r["threshold_cents"])
        fp = sum(1 for c, pos in cents if not pos and c > r["threshold_cents"])
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert abs(r["precision"] - (tp / (tp + fp))) < 1e-06
        assert abs(r["recall"] - (tp / p)) < 1e-06
        assert abs(r["f1"] - (2 * tp / (tp + fp + p))) < 1e-06
    # recall is monotone non-increasing as the threshold rises
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    # each decile keeps roughly 10% fewer rows than the previous
    kept = [r["tp"] + r["fp"] for r in rows]
    assert kept == sorted(kept, reverse=True)


def test_calibration_bins_train_test_split(spark):
    rows = QUERIES["q_calibration_bins"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    n_test = sum(
        1 for o in orders
        if int(hashlib.md5(str(o["o_orderkey"]).encode()).hexdigest()[:15],
               16) % 5 == 0)
    assert sum(r["n_test"] for r in rows) == n_test
    assert [r["score_bin"] for r in rows] == sorted(r["score_bin"] for r in rows)
    for r in rows:
        assert 0 <= r["predicted_rate"] <= 1
        assert 0 <= r["observed_rate"] <= 1
        assert abs(r["calibration_gap"]
                   - (r["observed_rate"] - r["predicted_rate"])) < 2e-06
        # a histogram model fit on 80% of iid data is well-calibrated
        # on the rest: gaps stay small on this synthetic set
        assert abs(r["calibration_gap"]) < 0.2
