"""Wave-86 semantics: Cochran-Armitage trend, Mood's median test."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import biosets_spark.queries.wave86 as w86  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cochran_armitage_matches_bruteforce(spark):
    (row,) = QUERIES["q_cochran_armitage"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cells = defaultdict(lambda: [0, 0])
    for o in orders:
        w = int(o["o_orderpriority"][0])
        cells[w][0] += 1
        cells[w][1] += o["o_orderstatus"] == "F"
    nt = sum(n for n, _ in cells.values())
    kt = sum(k for _, k in cells.values())
    p = kt / nt
    num = sum(w * (k - n * p) for w, (n, k) in cells.items())
    swn = sum(n * w for w, (n, _) in cells.items())
    swn2 = sum(n * w * w for w, (n, _) in cells.items())
    wvar = swn2 - swn ** 2 / nt
    z = num / math.sqrt(p * (1 - p) * wvar)
    assert row["n_orders"] == nt
    assert abs(row["pooled_rate"] - (p)) < 1e-06
    assert abs(row["z_trend"] - (z)) < 1e-05
    assert row["trend_5pct"] == (abs(z) > 1.959964)


def test_moods_median_matches_bruteforce(spark):
    (row,) = QUERIES["q_moods_median"].fn(spark, SF_SMOKE).collect()
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    all_mc = []
    for (et, _), (c, n) in acc.items():
        mc = math.floor(c / 100 / n * 100 + 0.5)
        series[et].append(mc)
        all_mc.append(mc)
    md = statistics.median(all_mc)
    cells = {et: (sum(1 for m in ms if m > md),
                  sum(1 for m in ms if m <= md))
             for et, ms in series.items()}
    at_ = sum(a for a, _ in cells.values())
    bt = sum(b for _, b in cells.values())
    nt = at_ + bt
    chi2 = sum(
        round((a - (a + b) * at_ / nt) ** 2 / ((a + b) * at_ / nt)
              + (b - (a + b) * bt / nt) ** 2 / ((a + b) * bt / nt), 8)
        for a, b in cells.values()
    )
    assert row["n_days"] == nt
    assert row["n_groups"] == len(cells)
    assert abs(row["chi2"] - (chi2)) < 1e-05
    assert row["reject_equal_medians_5pct"] == (chi2 > 9.487729)
    assert row["chi2"] >= 0
