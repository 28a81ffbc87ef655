"""Wave-89 semantics: Hurst exponent, Jain's fairness index."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave89 as w89  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_hurst_matches_bruteforce(spark):
    (row,) = QUERIES["q_hurst_exponent"].fn(spark, SF_SMOKE).collect()
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        day = e["ts"].date()
        acc[day][0] += round(round(e["value"], 2) * 100)
        acc[day][1] += 1
    series = [math.floor(c / 100 / n * 100 + 0.5)
              for _, (c, n) in sorted(acc.items())]
    pts = []
    for sz in (5, 10, 15):
        ratios = []
        for b in range(len(series) // sz):
            blk = series[b * sz:(b + 1) * sz]
            mu = sum(blk) / sz
            w = 0.0
            walk = []
            for x in blk:
                w += x - mu
                walk.append(w)
            rng = max(walk) - min(walk)
            sd = math.sqrt(sum(round((x - mu) ** 2, 6) for x in blk) / sz)
            ratios.append(round(rng / sd, 8))
        pts.append((math.log(sz), math.log(sum(ratios) / len(ratios))))
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert row["n_sizes"] == k
    assert abs(row["hurst_h"] - round(h, 6)) < 1e-5
    assert row["long_memory"] == (h > 0.65)
    # R/S slopes of any real series land in a sane band
    assert -0.5 < row["hurst_h"] < 1.5


def test_jain_matches_bruteforce_and_hhi_identity(spark):
    (row,) = QUERIES["q_jain_fairness"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    rev = defaultdict(int)
    for x in li:
        rev[x["l_suppkey"]] += round(x["l_extendedprice"] * 100)
    vals = list(rev.values())
    n = len(vals)
    s1 = sum(vals)
    s2 = sum(v * v for v in vals)
    jain = s1 * s1 / (n * s2)
    assert row["n_suppliers"] == n
    assert abs(row["jain_index"] - round(jain, 6)) < 1e-6
    assert row["effective_suppliers"] == round(n * jain)
    # identity: J = 1/(n * HHI) with HHI = sum of squared shares
    hhi = sum((v / s1) ** 2 for v in vals)
    assert abs(row["jain_index"] - 1 / (n * hhi)) < 1e-6
    assert 1 / n <= row["jain_index"] <= 1
