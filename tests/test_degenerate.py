"""Degenerate-scale differential: the ~20-row corpus where empty
groups, single-sample strata, zero variances, and empty join baskets
live. Every query here previously CRASHED (ANSI DIVIDE_BY_ZERO /
sqrt-of-negative) or silently diverged from its oracle on this
corpus; the fixes (try_divide / two-sided GREATEST clamps / global
aggregates / support gates) must keep engine parity at this scale
too. The graded scales are covered by tools/check_oracle.py."""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

from biosets_spark import queries as Q
from biosets_spark.tables import ALL_TABLES

# the formerly-crashing / formerly-diverging set (see
# tools/make_degenerate.py; q_pca_power is the one documented
# exception — a ROUND(x,10) tie in the iteration trajectory)
HARDENED = [
    "q_skew_kurtosis", "q_auc_roc", "q_price_index", "q_gumbel_maxima",
    "q_embedding_anisotropy", "q_jarque_bera", "q_mde_planner",
    "q_overdispersion", "q_cpk_capability", "q_levene_bf",
    "q_grubbs_test", "q_welch_anova", "q_capm_beta",
    "q_neyman_allocation", "q_winsor_variance_gain", "q_eb_shrinkage",
    "q_doubling_time", "q_approx_quantile_audit", "q_ks_drift",
    "q_power_analysis", "q_anova_oneway", "q_diff_in_diff",
    "q_control_chart", "q_seasonal_strength", "q_mann_whitney",
    "q_partial_correlation",
]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sftiny"))
    subprocess.run(
        [sys.executable, "tools/make_degenerate.py", out],
        check=True, capture_output=True,
    )
    return out


@pytest.fixture(scope="module")
def tiny_duck(tiny_dir):
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tiny_dir}/{t}.parquet')"
        )
    return con


def test_degenerate_corpus_parity(spark, tiny_dir, tiny_duck):
    import __spark_entry__ as entry
    from tools.check_oracle import rows_canon

    oracles = entry.oracle_sql()
    failures = []
    for name in HARDENED:
        sdf = Q.QUERIES[name].fn(spark, tiny_dir)
        srows = rows_canon(sdf.columns, sdf.collect())
        res = tiny_duck.execute(oracles[name])
        cols = [d[0] for d in res.description]
        orows = rows_canon(cols, res.fetchall())
        if srows != orows:
            failures.append((name, srows[:2], orows[:2]))
    assert failures == [], failures
