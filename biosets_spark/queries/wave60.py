"""Sixtieth-wave query inventory: nonparametric trend and extreme
values — the MANN-KENDALL trend test (is each event type's daily
series monotonically drifting? The distribution-free test regulators
and SRE dashboards use where q_theil_sen gives the slope magnitude:
Kendall-score sign sums with the exact tie-corrected variance) and
GUMBEL BLOCK-MAXIMA fitting (method-of-moments fit of the extreme-
value distribution to daily maxima with the 100-block return level —
the 'how bad can a day get' number capacity planning reads, where
q_control_chart bounds only typical variation).

Determinism discipline: daily means are the shared exact 6-dec
decimal ratios (q_cusum prelude); Mann-Kendall S and its tie terms
are pure integer sums over sign comparisons of identical doubles;
daily maxima are exact DECIMAL(18,2) maxima; Gumbel moments come
from exact decimal sums with shared literals for Euler-Mascheroni
(0.5772156649015329) and pi (3.141592653589793); every output is one
closing closed-form double.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

_DAILY_SQL = """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                          AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS m
        FROM events GROUP BY event_type, CAST(ts AS DATE)
      )
"""

_EULER = 0.5772156649015329
_PI = 3.141592653589793


@q(
    "q_mann_kendall",
    oracle=_DAILY_SQL + """
    , pairs AS (
      SELECT a.event_type,
             CASE WHEN b.m > a.m THEN 1
                  WHEN b.m < a.m THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ), s AS (
      SELECT event_type, SUM(sgn) AS s_stat FROM pairs GROUP BY event_type
    ), ties AS (
      SELECT event_type,
             SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
      FROM (SELECT event_type, m, COUNT(*) AS t FROM daily GROUP BY 1, 2)
      GROUP BY event_type
    ), n AS (
      SELECT event_type, COUNT(*) AS nd FROM daily GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(n.nd AS BIGINT) AS n_days,
           CAST(s.s_stat AS BIGINT) AS s_stat,
           FLOOR(((n.nd * (n.nd - 1.0) * (2 * n.nd + 5) - ties.tie_term)
                 / 18) * 1e6 + 0.5) / 1e6 AS var_s,
           (CASE
             WHEN s.s_stat > 0 THEN (s.s_stat - 1)
               / SQRT((n.nd * (n.nd - 1.0) * (2 * n.nd + 5) - ties.tie_term)
                      / 18)
             WHEN s.s_stat < 0 THEN (s.s_stat + 1)
               / SQRT((n.nd * (n.nd - 1.0) * (2 * n.nd + 5) - ties.tie_term)
                      / 18)
             ELSE 0 END) AS z_mk
    FROM s JOIN ties ON s.event_type = ties.event_type
    JOIN n ON s.event_type = n.event_type
    ORDER BY s.event_type
    """,
    desc="Mann-Kendall trend test on each event type's daily-mean "
         "series: S = sum over day pairs of sign(m_later - m_earlier), "
         "the tie-corrected variance (n(n-1)(2n+5) - sum t(t-1)(2t+5))"
         "/18, and the continuity-corrected z — the distribution-free "
         "monotone-trend test that pairs with q_theil_sen's robust "
         "slope (detect here, size there) and needs no normality "
         "assumption q_control_chart's limits lean on. The day-pair "
         "self-join is bounded at C(n_days,2) rows per type over the "
         "TINY daily table (the event stream collapses first — the "
         "wave-33 prelude); sign comparisons see identical 6-dec "
         "doubles so S is a pure integer on both engines.",
    tags=["events", "stats", "join", "agg"],
)
def q_mann_kendall(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    sgn = (
        F.when(col("b.m") > col("a.m"), 1)
        .when(col("b.m") < col("a.m"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            b,
            (col("a.event_type") == col("b.event_type"))
            & (col("a.day") < col("b.day")),
        )
        .groupBy(col("a.event_type").alias("event_type"))
        .agg(F.sum(sgn).alias("s_stat"))
    )
    ties = (
        daily.groupBy("event_type", "m").agg(F.count("*").alias("t"))
        .groupBy(col("event_type").alias("et_t"))
        .agg(
            F.sum(col("t") * (col("t") - 1) * (2 * col("t") + 5))
            .alias("tie_term")
        )
    )
    n = daily.groupBy(col("event_type").alias("et_n")).agg(
        F.count("*").alias("nd")
    )
    joined = (
        s.join(broadcast(ties), col("event_type") == col("et_t"))
        .join(broadcast(n), col("event_type") == col("et_n"))
    )
    nd = col("nd").cast("double")
    var_s = (nd * (nd - 1) * (2 * col("nd") + 5) - col("tie_term")) / 18
    z = (
        F.when(col("s_stat") > 0, (col("s_stat") - 1) / F.sqrt(var_s))
        .when(col("s_stat") < 0, (col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "event_type",
        col("nd").cast("long").alias("n_days"),
        col("s_stat").cast("long").alias("s_stat"),
        (dfloor((var_s) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("var_s"),
        (z).alias("z_mk"),
    ).orderBy("event_type")


@q(
    "q_gumbel_maxima",
    oracle=f"""
    WITH blockmax AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             MAX(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2))) AS mx
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), mom AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(mx) AS DOUBLE) AS s1,
             CAST(SUM(mx * mx) AS DOUBLE) AS s2
      FROM blockmax GROUP BY event_type
    ), fit AS (
      SELECT event_type, n,
             s1 / n AS mean,
             SQRT(GREATEST(6 * (s2 / n - POWER(s1 / n, 2)), 0)) / {_PI}
               AS beta
      FROM mom
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_blocks,
           (mean) AS block_mean,
           (mean - {_EULER} * beta) AS gumbel_mu,
           (beta) AS gumbel_beta,
           (mean - {_EULER} * beta
                 - beta * LN(-LN(0.99))) AS return_level_100
    FROM fit ORDER BY event_type
    """,
    desc="Gumbel extreme-value fit to each event type's daily maxima "
         "by method of moments: location mu = mean - gamma*beta and "
         "scale beta = s*sqrt(6)/pi from the block-maxima series, "
         "plus the 100-block return level mu - beta*ln(-ln(0.99)) — "
         "the 'value exceeded once per 100 days' number capacity "
         "planning actually budgets against, which q_control_chart's "
         "3-sigma limits (typical variation, not extremes) "
         "systematically understate for heavy-ish tails. Daily "
         "maxima are exact DECIMAL(18,2) (max of 2-dec values), "
         "moments are exact decimal sums, and Euler-Mascheroni / pi "
         "are shared literals — the fit is one closed-form double "
         "per type. One combinable (type, day) max agg; everything "
         "after runs on the tiny block table.",
    tags=["events", "stats", "agg"],
)
def q_gumbel_maxima(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    blockmax = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(F.max((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)")).alias("mx"))
    )
    mom = blockmax.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("mx").cast("double").alias("s1"),
        F.sum(col("mx") * col("mx")).cast("double").alias("s2"),
    )
    nd = col("n").cast("double")
    mean = col("s1") / nd
    # GREATEST(.,0) on BOTH engines: the population variance of a
    # 1-block (or constant) series cancels to an epsilon-negative
    # double, where Spark yields NaN but DuckDB raises on sqrt — the
    # clamp pins the degenerate scale to exactly 0.0 in both
    beta = F.sqrt(F.greatest(
        6 * (col("s2") / nd - F.pow(mean, 2)), lit(0.0))) / lit(_PI)
    mu = mean - lit(_EULER) * beta
    return mom.select(
        "event_type",
        col("n").cast("long").alias("n_blocks"),
        (mean).alias("block_mean"),
        (mu).alias("gumbel_mu"),
        (beta).alias("gumbel_beta"),
        (mu - beta * F.log(-F.log(lit(0.99))))
        .alias("return_level_100"),
    ).orderBy("event_type")
