"""Wave-77 semantics: rank churn, Kendall ranking distance."""

from __future__ import annotations

from collections import defaultdict

import biosets_spark.queries.wave77 as w77  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _half_ranks(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    years = [x["l_shipdate"].year for x in li]
    mid = (min(years) + max(years)) // 2
    rev = defaultdict(lambda: [0, 0])  # suppkey -> [early, late] cents
    for x in li:
        c = round(x["l_extendedprice"] * 100)
        rev[x["l_suppkey"]][0 if x["l_shipdate"].year <= mid else 1] += c

    def ranks(idx):
        present = [(sk, v[idx]) for sk, v in rev.items() if v[idx] > 0]
        ordered = sorted(present, key=lambda x: (-x[1], x[0]))
        return {sk: i + 1 for i, (sk, _) in enumerate(ordered)}

    return ranks(0), ranks(1)


def test_rank_churn_matches_bruteforce(spark):
    got = QUERIES["q_rank_churn"].fn(spark, SF_SMOKE).collect()
    r_early, r_late = _half_ranks(spark)
    common = sorted(set(r_early) & set(r_late))
    movers = sorted(
        ((sk, r_early[sk], r_late[sk]) for sk in common),
        key=lambda t: (-abs(t[2] - t[1]), t[0]),
    )[:10]
    assert len(got) == 10
    for row, (sk, re_, rl) in zip(got, movers):
        assert row["suppkey"] == sk
        assert (row["rank_early"], row["rank_late"]) == (re_, rl)
        assert row["rank_change"] == rl - re_


def test_kendall_rankings_matches_bruteforce(spark):
    (row,) = QUERIES["q_kendall_rankings"].fn(spark, SF_SMOKE).collect()
    r_early, r_late = _half_ranks(spark)
    common = sorted(set(r_early) & set(r_late))
    nc = nd = 0
    for i, a in enumerate(common):
        for b in common[i + 1:]:
            p = (r_early[a] - r_early[b]) * (r_late[a] - r_late[b])
            nc += p > 0
            nd += p <= 0
    np_ = nc + nd
    assert row["n_suppliers"] == len(common)
    assert (row["concordant"], row["discordant"]) == (nc, nd)
    assert abs(row["kendall_tau"] - ((2 * nc - np_) / np_)) < 1e-06
    assert abs(row["churn_fraction"] - (nd / np_)) < 1e-06
    assert -1 <= row["kendall_tau"] <= 1
