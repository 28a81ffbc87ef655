"""Wave-91 semantics: Youden cutpoint, Hosmer-Lemeshow test."""

from __future__ import annotations

from collections import defaultdict

import biosets_spark.queries.wave91 as w91  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_youden_matches_bruteforce(spark):
    (row,) = QUERIES["q_youden_cutpoint"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    dist = defaultdict(lambda: [0, 0])
    for o in orders:
        c = round(o["o_totalprice"] * 100)
        dist[c][0] += 1
        dist[c][1] += o["o_orderpriority"] == "1-URGENT"
    np_ = sum(k for _, k in dist.values())
    nn = sum(n - k for n, k in dist.values())
    tp = fp = 0
    best = None
    for c in sorted(dist, reverse=True):
        n, k = dist[c]
        tp += k
        fp += n - k
        j = tp / np_ - fp / nn
        key = (-j, c)
        if best is None or key < best[0]:
            best = (key, c, tp, fp, j)
    assert abs(row["optimal_cut"] - (best[1] / 100)) < 0.01
    assert abs(row["tpr_at_cut"] - (best[2] / np_)) < 1e-06
    assert abs(row["fpr_at_cut"] - (best[3] / nn)) < 1e-06
    assert abs(row["youden_j"] - (best[4])) < 1e-06
    assert row["youden_j"] == row["ks_distance"]
    assert -1 <= row["youden_j"] <= 1


def test_hosmer_lemeshow_matches_bruteforce(spark):
    (row,) = QUERIES["q_hosmer_lemeshow"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cents = [(round(o["o_totalprice"] * 100),
              int(o["o_orderpriority"] == "1-URGENT")) for o in orders]
    mc = max(c for c, _ in cents)
    bins = defaultdict(lambda: [0, 0, 0.0])
    for c, y in cents:
        p = c / mc
        b = min(int(p * 10), 9)
        bins[b][0] += 1
        bins[b][1] += y
        bins[b][2] += round(p, 10)
    hl = 0.0
    for n, o, e in bins.values():
        if 0 < e < n:
            hl += round((o - e) ** 2 / (e * (1 - e / n)), 8)
    assert row["n_bins"] == len(bins)
    assert abs(row["hl_chi2"] - (hl)) < 1e-05
    assert row["reject_calibrated_5pct"] == (hl > 15.507313)
    assert row["hl_chi2"] >= 0
