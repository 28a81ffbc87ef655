"""Wave-48 semantics: ABC/XYZ matrix, dispersion index."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave48  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_abc_xyz_matches_bruteforce(spark):
    rows = {(r["abc"], r["xyz"]): r
            for r in QUERIES["q_abc_xyz"].fn(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    brand = {p["p_partkey"]: p["p_brand"]
             for p in spark.read.parquet(f"{SF_SMOKE}/part.parquet").collect()}
    rev = defaultdict(int)
    monthly = defaultdict(lambda: defaultdict(int))
    for x in li:
        rev[x["l_partkey"]] += round(x["l_extendedprice"] * 100)
        m = (x["l_shipdate"].year, x["l_shipdate"].month)
        monthly[x["l_partkey"]][m] += int(x["l_quantity"])
    # per-brand ABC
    by_brand = defaultdict(list)
    for pk, cents in rev.items():
        by_brand[brand[pk]].append((pk, cents))
    abc = {}
    for b, parts in by_brand.items():
        parts.sort(key=lambda t: (-t[1], t[0]))
        total = sum(c for _, c in parts)
        cum = 0
        for pk, c in parts:
            cum += c
            share = cum / total
            abc[pk] = "A" if share <= 0.80 else ("B" if share <= 0.95 else "C")
    cells = defaultdict(lambda: [0, 0])
    for pk, cents in rev.items():
        qs = list(monthly[pk].values())
        n = len(qs)
        mu = sum(qs) / n
        var = sum(q * q for q in qs) / n - mu * mu
        cvv = math.sqrt(max(var, 0)) / mu
        xyz = "X" if cvv < 0.5 else ("Y" if cvv < 1.0 else "Z")
        cells[(abc[pk], xyz)][0] += 1
        cells[(abc[pk], xyz)][1] += cents
    all_cents = sum(rev.values())
    assert set(rows) == set(cells)
    for key, (n, cents) in cells.items():
        r = rows[key]
        assert r["n_parts"] == n
        assert abs(r["revenue_share"] - (cents / all_cents)) < 1e-06
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1) < 1e-4


def test_dispersion_index_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_dispersion_index"].fn(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = defaultdict(int)
    for e in ev:
        daily[(e["event_type"], e["ts"].date())] += 1
    by_type = defaultdict(list)
    for (t, _), n in daily.items():
        by_type[t].append(n)
    for t, ns in by_type.items():
        r = rows[t]
        nd = len(ns)
        mu = sum(ns) / nd
        var = sum(n * n for n in ns) / nd - mu * mu
        assert r["n_days"] == nd
        assert abs(r["mean_daily"] - (mu)) < 1e-06
        assert abs(r["dispersion_index"] - (var / mu)) < 1e-05
        assert r["overdispersed"] == (var / mu > 1.5)
