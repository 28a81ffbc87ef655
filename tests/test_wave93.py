"""Wave-93 semantics: Bonferroni family summary, BH FDR step-up."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave93 as w93  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_LADDER = (2.575829, 2.326348, 2.170090, 2.053749, 1.959964)


def _mk_z(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    for (et, day), (c, n) in acc.items():
        series[et].append((day, round(c / 100 / n, 6)))
    zs = {}
    for et, pts in series.items():
        pts.sort()
        ms = [m for _, m in pts]
        n = len(ms)
        s = sum((ms[j] > ms[i]) - (ms[j] < ms[i])
                for i in range(n) for j in range(i + 1, n))
        ties = defaultdict(int)
        for m in ms:
            ties[m] += 1
        tie = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18
        zs[et] = ((s - 1) if s > 0 else (s + 1) if s < 0 else 0) \
            / math.sqrt(var) if s != 0 else 0.0
    return zs


def test_bonferroni_matches_bruteforce(spark):
    (row,) = QUERIES["q_bonferroni_family"].fn(spark, SF_SMOKE).collect()
    zs = _mk_z(spark)
    assert row["n_tests"] == len(zs)
    assert row["n_raw_5pct"] == sum(1 for z in zs.values()
                                    if abs(z) > 1.959964)
    assert row["n_bonferroni_5pct"] == sum(1 for z in zs.values()
                                           if abs(z) > 2.575829)
    assert abs(row["max_abs_z"]
               - round(max(abs(z) for z in zs.values()), 6)) < 1e-5
    # family-wise control can only shrink the discovery count
    assert row["n_bonferroni_5pct"] <= row["n_raw_5pct"]


def test_bh_fdr_matches_bruteforce(spark):
    got = QUERIES["q_bh_fdr"].fn(spark, SF_SMOKE).collect()
    zs = _mk_z(spark)
    ranked = sorted(((abs(z), et) for et, z in zs.items()),
                    key=lambda t: (-t[0], t[1]))
    imax = 0
    for i, (az, _) in enumerate(ranked, 1):
        if az >= _LADDER[i - 1]:
            imax = i
    assert len(got) == len(ranked)
    n_bh = 0
    for row, (i, (az, et)) in zip(got, enumerate(ranked, 1)):
        assert row["abs_z_rank"] == i
        assert row["event_type"] == et
        assert abs(row["abs_z"] - round(az, 6)) < 1e-5
        assert row["bh_discovery_5pct"] == (i <= imax)
        n_bh += row["bh_discovery_5pct"]
    # BH keeps at least the Bonferroni discoveries
    (bf,) = QUERIES["q_bonferroni_family"].fn(spark, SF_SMOKE).collect()
    assert n_bh >= bf["n_bonferroni_5pct"]
