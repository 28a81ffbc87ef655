"""Wave-99 semantics: Chao1 richness, revenue doubling time."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import biosets_spark.queries.wave99 as w99  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def test_chao1_matches_bruteforce(spark):
    rows = {r["source"]: r
            for r in QUERIES["q_chao1_richness"].fn(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        cnt[d["source"]].update(t for t in _WS.split(d["text"].strip()) if t)
    for src, c in cnt.items():
        v = len(c)
        n = sum(c.values())
        f1 = sum(1 for x in c.values() if x == 1)
        f2 = sum(1 for x in c.values() if x == 2)
        r = rows[src]
        assert r["observed_types"] == v
        assert r["singletons"] == f1
        assert r["doubletons"] == f2
        if f2 > 0:
            assert abs(r["chao1_estimate"]
                       - (v + f1 * f1 / (2 * f2))) < 0.1
            # Chao1 is a lower bound ABOVE the observed count
            assert r["chao1_estimate"] >= v
        else:
            assert r["chao1_estimate"] is None
        assert abs(r["good_coverage"] - (1 - f1 / n)) < 1e-06
        assert 0 <= r["good_coverage"] <= 1


def test_doubling_time_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_doubling_time"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    daily = defaultdict(lambda: defaultdict(int))
    import datetime

    epoch0 = datetime.date(1970, 1, 1)
    for o in orders:
        od = o["o_orderdate"]
        if isinstance(od, datetime.datetime):
            od = od.date()
        x = (od - epoch0).days
        daily[seg_of[o["o_custkey"]]][x] += round(o["o_totalprice"] * 100)
    for seg, days in daily.items():
        pts = [(x, round(math.log(c), 8)) for x, c in days.items()]
        n = len(pts)
        sx = float(sum(x for x, _ in pts))
        sy = sum(y for _, y in pts)
        sxy = sum(round(x * y, 6) for x, y in pts)
        sxx = float(sum(x * x for x, _ in pts))
        syy = sum(round(y * y, 8) for _, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r2 = (n * sxy - sx * sy) ** 2 / (
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        r = rows[seg]
        assert r["n_days"] == n
        assert abs(r["daily_log_slope"] - (slope)) < 1e-07
        assert abs(r["doubling_time_days"]
                   - (math.log(2) / slope)) < 1
        assert abs(r["r_squared"] - (r2)) < 0.0001
        # flat synthetic revenue: exponential growth explains ~nothing
        assert 0 <= r["r_squared"] <= 1
