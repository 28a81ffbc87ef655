"""Wave-75 semantics: Theil's U, AR(1) unit-root check."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import biosets_spark.queries.wave75 as w75  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_theils_u_matches_bruteforce(spark):
    (row,) = QUERIES["q_theils_u"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    joint = Counter((d["source"], d["lang"]) for d in docs)
    nt = sum(joint.values())
    lang_m = Counter()
    src_m = Counter()
    for (s, l), n in joint.items():
        lang_m[l] += n
        src_m[s] += n
    h_lang = sum(round(-(n / nt) * math.log(n / nt), 12)
                 for n in lang_m.values())
    h_cond = sum(round(-(n / nt) * math.log(n / src_m[s]), 12)
                 for (s, l), n in joint.items())
    u = (h_lang - h_cond) / h_lang
    assert row["n_docs"] == nt
    assert abs(row["h_lang"] - round(h_lang, 6)) < 1e-6
    assert abs(row["h_lang_given_source"] - round(h_cond, 6)) < 1e-6
    assert abs(row["theils_u"] - round(u, 6)) < 1e-6
    # U is a fraction of removed uncertainty
    assert -1e-9 <= row["theils_u"] <= 1


def test_unit_root_ar1_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_unit_root_ar1"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    for (et, day), (c, n) in acc.items():
        series[et].append((day, math.floor(c / 100 / n * 100 + 0.5)))
    for et, pts in series.items():
        pts.sort()
        xs = [m for _, m in pts[:-1]]
        ys = [m for _, m in pts[1:]]
        n = len(xs)
        sx, sy = float(sum(xs)), float(sum(ys))
        sxy = float(sum(a * b for a, b in zip(xs, ys)))
        sxx = float(sum(a * a for a in xs))
        syy = float(sum(b * b for b in ys))
        rho = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        sse = (syy - sy * sy / n) - rho * (sxy - sx * sy / n)
        se = math.sqrt(sse / (n - 2) / (sxx - sx * sx / n))
        t = (rho - 1) / se
        r = rows[et]
        assert r["n_pairs"] == n
        assert abs(r["rho"] - round(rho, 6)) < 1e-5
        assert abs(r["df_t"] - round(t, 6)) < 1e-4
        assert r["mean_reverting_5pct"] == (rho < 1 and t < -2.99)
        # AR(1) coefficient of a stationary-ish series stays in (-1, 1.1)
        assert -1 < r["rho"] < 1.1
