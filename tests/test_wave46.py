"""Wave-46 semantics: partial correlation, HHI concentration."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave46  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))


def test_partial_correlation_matches_bruteforce(spark):
    rows = {r["l_returnflag"]: r
            for r in QUERIES["q_partial_correlation"].fn(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    by_flag = defaultdict(lambda: ([], [], []))
    for x in li:
        g = by_flag[x["l_returnflag"]]
        g[0].append(int(x["l_quantity"]))
        g[1].append(round(x["l_extendedprice"] * 100))
        g[2].append(round(x["l_discount"] * 10000))
    for flag, (xs, ys, zs) in by_flag.items():
        r = rows[flag]
        assert r["n_rows"] == len(xs)
        rxy = _pearson(xs, ys)
        rxz = _pearson(xs, zs)
        ryz = _pearson(ys, zs)
        part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
        assert abs(r["r_qty_price"] - round(rxy, 6)) < 1e-5
        assert abs(r["r_partial_given_discount"] - round(part, 6)) < 1e-5
        assert -1 <= r["r_partial_given_discount"] <= 1


def test_hhi_matches_bruteforce(spark):
    rows = {r["n_name"]: r
            for r in QUERIES["q_hhi_concentration"].fn(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    sup = {s["s_suppkey"]: s["s_nationkey"]
           for s in spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").collect()}
    nat = {n["n_nationkey"]: n["n_name"]
           for n in spark.read.parquet(f"{SF_SMOKE}/nation.parquet").collect()}
    rev = defaultdict(lambda: defaultdict(int))
    for x in li:
        nk = sup.get(x["l_suppkey"])
        if nk is not None:
            rev[nat[nk]][x["l_suppkey"]] += round(x["l_extendedprice"] * 100)
    assert set(rows) == set(rev)
    for name, by_sup in rev.items():
        r = rows[name]
        cents = list(by_sup.values())
        s = sum(cents)
        hhi = sum(c * c for c in cents) / (s * s)
        assert r["n_suppliers"] == len(cents)
        assert abs(r["hhi"] - round(hhi, 6)) < 1e-9
        assert abs(r["effective_suppliers"] - round(1 / hhi, 2)) < 1e-6
        assert abs(r["top_share"] - round(max(cents) / s, 6)) < 1e-9
        # bounds: 1/N <= HHI <= 1; effective count <= N
        assert 1 / len(cents) - 1e-12 <= hhi <= 1
        assert r["effective_suppliers"] <= len(cents) + 1e-6
