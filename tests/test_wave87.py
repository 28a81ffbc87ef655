"""Wave-87 semantics: Fisher-z correlation diff, Welch ANOVA."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave87 as w87  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _daily_xy(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    out = []
    for (et, day), (c, n) in acc.items():
        out.append((et, day, n, math.floor(c / 100 / n * 100 + 0.5)))
    return out


def _pearson(pairs):
    n = len(pairs)
    sx = float(sum(x for x, _ in pairs))
    sy = float(sum(y for _, y in pairs))
    sxy = float(sum(x * y for x, y in pairs))
    sxx = float(sum(x * x for x, _ in pairs))
    syy = float(sum(y * y for _, y in pairs))
    return n, (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def test_fisher_z_matches_bruteforce(spark):
    (row,) = QUERIES["q_fisher_z_diff"].fn(spark, SF_SMOKE).collect()
    wd, we = [], []
    for et, day, x, y in _daily_xy(spark):
        (we if day.isoweekday() >= 6 else wd).append((x, y))
    n1, r1 = _pearson(wd)
    n2, r2 = _pearson(we)
    z1 = 0.5 * math.log((1 + r1) / (1 - r1))
    z2 = 0.5 * math.log((1 + r2) / (1 - r2))
    zf = (z1 - z2) / math.sqrt(1 / (n1 - 3) + 1 / (n2 - 3))
    assert (row["n_weekday"], row["n_weekend"]) == (n1, n2)
    assert abs(row["r_weekday"] - round(r1, 6)) < 1e-5
    assert abs(row["r_weekend"] - round(r2, 6)) < 1e-5
    assert abs(row["z_fisher"] - round(zf, 6)) < 1e-4
    assert row["differ_5pct"] == (abs(zf) > 1.959964)


def test_welch_anova_matches_bruteforce(spark):
    (row,) = QUERIES["q_welch_anova"].fn(spark, SF_SMOKE).collect()
    groups = defaultdict(list)
    for et, _, _, y in _daily_xy(spark):
        groups[et].append(y)
    stats = []
    for ys in groups.values():
        n = len(ys)
        m = sum(ys) / n
        v = (sum(y * y for y in ys) - sum(ys) ** 2 / n) / (n - 1)
        stats.append((n, m, v, n / v))
    k = len(stats)
    sw = sum(w for _, _, _, w in stats)
    mbar = sum(w * m for _, m, _, w in stats) / sw
    num = sum(round(w * (m - mbar) ** 2, 8)
              for _, m, _, w in stats) / (k - 1)
    hsum = sum(round((1 - w / sw) ** 2 / (n - 1), 10)
               for n, _, _, w in stats)
    f_star = num / (1 + 2 * (k - 2) / (k * k - 1) * hsum)
    df2 = (k * k - 1) / (3 * hsum)
    assert row["n_groups"] == k
    assert abs(row["welch_f"] - round(f_star, 6)) < 1e-4
    assert abs(row["df2"] - round(df2, 6)) < 1e-3
    assert row["reject_equal_means_5pct"] == (f_star > 2.65)
    assert row["welch_f"] >= 0
