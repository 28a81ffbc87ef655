"""Wave-34 semantics: Mann-Whitney U, Spearman rank correlation."""

from __future__ import annotations

import math

import biosets_spark.queries.wave34  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _midranks(values):
    """value -> average rank (1-based) with ties averaged."""
    out = {}
    pos = 0
    from collections import Counter

    cnt = Counter(values)
    for v in sorted(cnt):
        n = cnt[v]
        out[v] = pos + (n + 1) / 2
        pos += n
    return out


def test_mann_whitney_matches_bruteforce(spark):
    rows = {r["l_linestatus"]: r
            for r in QUERIES["q_mann_whitney"].fn(spark, SF_SMOKE).collect()}
    li = [r for r in spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
          if r["l_returnflag"] in ("A", "R")]
    for ls, row in rows.items():
        sub = [r for r in li if r["l_linestatus"] == ls]
        vals = [round(r["l_extendedprice"], 2) for r in sub]
        mr = _midranks(vals)
        a = [round(r["l_extendedprice"], 2) for r in sub if r["l_returnflag"] == "A"]
        b = [round(r["l_extendedprice"], 2) for r in sub if r["l_returnflag"] == "R"]
        n1, n2 = len(a), len(b)
        assert (row["n_a"], row["n_r"]) == (n1, n2)
        ra = sum(mr[v] for v in a)
        u = ra - n1 * (n1 + 1) / 2
        assert abs(row["u_stat"] - u) < 1e-6
        # z sign sanity + tie-corrected sigma
        from collections import Counter

        t = sum(c**3 - c for c in Counter(vals).values())
        nn = n1 + n2
        sigma = math.sqrt(n1 * n2 / 12 * ((nn + 1) - t / (nn * (nn - 1))))
        z = (u - n1 * n2 / 2) / sigma
        assert abs(row["z_score"] - round(z, 6)) < 1e-5
        assert abs(row["rank_biserial"] - round(1 - 2 * u / (n1 * n2), 6)) < 1e-5


def test_spearman_matches_bruteforce(spark):
    rows = {r["l_returnflag"]: r
            for r in QUERIES["q_spearman_corr"].fn(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    assert set(rows) == {"A", "N", "R"}
    for flag, row in rows.items():
        sub = [r for r in li if r["l_returnflag"] == flag]
        xs = [int(r["l_quantity"]) for r in sub]
        ys = [round(r["l_discount"] * 100) for r in sub]
        rx = _midranks(xs)
        ry = _midranks(ys)
        xr = [rx[v] for v in xs]
        yr = [ry[v] for v in ys]
        n = len(sub)
        assert row["n_rows"] == n
        sx, sy = sum(xr), sum(yr)
        sxx = sum(v * v for v in xr)
        syy = sum(v * v for v in yr)
        sxy = sum(a * b for a, b in zip(xr, yr))
        rho = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy))
        assert abs(row["spearman_rho"] - round(rho, 6)) < 1e-5
        assert -1 <= row["spearman_rho"] <= 1
