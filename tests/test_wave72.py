"""Wave-72 semantics: Hill tail index, Wilcoxon signed-rank."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave72 as w72  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_hill_tail_matches_bruteforce(spark):
    (row,) = QUERIES["q_hill_tail"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cents = sorted(
        (round(o["o_totalprice"] * 100), o["o_orderkey"]) for o in orders
    )
    top = sorted(cents, key=lambda x: (-x[0], x[1]))[:200]
    ck = min(c for c, _ in top)
    gamma = sum(round(math.log(c / ck), 10) for c, _ in top) / 200
    assert row["k"] == 200
    assert abs(row["threshold_value"] - round(ck / 100, 2)) < 1e-9
    assert abs(row["hill_gamma"] - round(gamma, 6)) < 1e-6
    assert abs(row["tail_alpha"] - round(1 / gamma, 6)) < 1e-4
    # heavy-ish but finite-variance tail for TPC-H-style totals
    assert row["tail_alpha"] > 1


def test_wilcoxon_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_wilcoxon_signed_rank"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    # replicate the engine op-for-op: decimal value sum -> double,
    # / count, * 100, HALF_UP round (the W statistic is invariant to
    # the |d| scale, but quantization boundaries are not)
    mc = {k: math.floor(c / 100 / n * 100 + 0.5) for k, (c, n) in acc.items()}
    import datetime

    diffs = defaultdict(list)
    for (et, day), m in mc.items():
        nxt = (et, day + datetime.timedelta(days=7))
        if nxt in mc and mc[nxt] != m:
            diffs[et].append(mc[nxt] - m)
    for et, ds in diffs.items():
        n = len(ds)
        # midranks of |d|
        by_abs = sorted(range(n), key=lambda i: abs(ds[i]))
        ranks = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j < n and abs(ds[by_abs[j]]) == abs(ds[by_abs[i]]):
                j += 1
            mid = (i + 1 + j) / 2
            for t in range(i, j):
                ranks[by_abs[t]] = mid
            i = j
        w_plus = sum(r for r, d in zip(ranks, ds) if d > 0)
        z = (w_plus - n * (n + 1) / 4) / math.sqrt(
            n * (n + 1) * (2 * n + 1) / 24
        )
        r = rows[et]
        assert r["n_pairs"] == n
        assert abs(r["w_plus"] - round(w_plus, 1)) < 1e-9
        assert abs(r["z_wilcoxon"] - round(z, 6)) < 1e-6
        # W+ is bounded by the total rank sum
        assert 0 <= r["w_plus"] <= n * (n + 1) / 2
