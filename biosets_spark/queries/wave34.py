"""Thirty-fourth-wave query inventory: nonparametric statistics —
the Mann-Whitney U rank-sum test (the distribution-free A/B test a
pipeline reaches for when values are skewed and q_welch_ttest's
normality assumption is suspect) and Spearman rank correlation (the
monotone-association companion to q_corr_exact's Pearson).

Both need GLOBAL ranks, the textbook single-task window trap. The
mechanism here is the scalable one: ranks come from a value HISTOGRAM
(combinable agg over distinct values), and the prefix sum over that
histogram is two-level — a window partitioned by (group, value-bucket)
plus a broadcast join of per-bucket offsets — so no window ever has an
empty partition spec and no task sees more than one bucket of one
group. Midranks stay exact integers throughout (2*midrank = 2*cum_before
+ n_ties + 1 is an odd integer), so rank sums are decimal-exact and the
final z / rho are single closed-form double expressions.

Determinism discipline (queries.py header): all rank arithmetic is
integer/decimal-exact; doubles appear only in the final closed-form
statistic, rounded to 6 decimals on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from ..operators import ranking
from . import dfloor, q


@q(
    "q_mann_whitney",
    oracle="""
    WITH hist AS (
      SELECT l_linestatus AS ls,
             CAST(FLOOR((l_extendedprice * 100) + 0.5) AS BIGINT) AS v,
             CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bkt,
             COUNT(*) FILTER (WHERE l_returnflag = 'A') AS na,
             COUNT(*) FILTER (WHERE l_returnflag = 'R') AS nr,
             COUNT(*) AS nt
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1, 2, 3
    ), in_bkt AS (
      SELECT *, COALESCE(SUM(nt) OVER (
               PARTITION BY ls, bkt ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_in
      FROM hist
    ), bkt_tot AS (
      SELECT ls, bkt, SUM(nt) AS bn FROM hist GROUP BY ls, bkt
    ), bkt_off AS (
      SELECT ls, bkt, COALESCE(SUM(bn) OVER (
               PARTITION BY ls ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS off
      FROM bkt_tot
    ), ranked AS (
      SELECT i.ls, i.na, i.nr, i.nt,
             2 * (i.cum_in + o.off) + i.nt + 1 AS mr2
      FROM in_bkt i JOIN bkt_off o ON i.ls = o.ls AND i.bkt = o.bkt
    ), agg AS (
      SELECT ls,
             SUM(na) AS n1, SUM(nr) AS n2,
             CAST(SUM(CAST(na AS DECIMAL(38,0)) * mr2) AS DECIMAL(38,0))
               AS r2a,
             CAST(SUM(CAST(nt AS DECIMAL(38,0)) * nt * nt - nt)
                  AS DECIMAL(38,0)) AS tsum
      FROM ranked GROUP BY ls
    )
    SELECT ls AS l_linestatus,
           CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_r,
           (CAST(r2a - n1 * (n1 + 1) AS DOUBLE) / 2) AS u_stat,
           ((CAST(r2a - n1 * (n1 + 1) AS DOUBLE) / 2
                  - CAST(n1 AS DOUBLE) * n2 / 2)
                 / SQRT(CAST(n1 AS DOUBLE) * n2 / 12
                        * ((n1 + n2 + 1)
                           - CAST(tsum AS DOUBLE)
                             / ((n1 + n2) * (CAST(n1 AS DOUBLE) + n2 - 1))))) AS z_score,
           (1 - CAST(r2a - n1 * (n1 + 1) AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * n2)) AS rank_biserial
    FROM agg ORDER BY ls
    """,
    desc="Mann-Whitney U rank-sum test per linestatus: does the "
         "extended-price distribution differ between returned (A) and "
         "refused (R) lineitems? Distribution-free — the test "
         "q_welch_ttest cannot replace when prices are skewed. The "
         "scalable-ranking mechanism: ranks come from a distinct-value "
         "histogram (combinable agg), and the global prefix sum over "
         "it is TWO-LEVEL — an in-bucket window partitioned by "
         "(status, price-bucket) plus a broadcast per-bucket offset "
         "join — so no empty-partition window exists and no task holds "
         "more than one bucket. Midranks are exact odd integers "
         "(2*mid = 2*before + ties + 1), rank sums are DECIMAL(38,0), "
         "and z (with the full tie correction) plus the rank-biserial "
         "effect size are single closed-form double expressions.",
    tags=["stats", "window", "agg"],
)
def q_mann_whitney(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    hist = (
        li.where(col("l_returnflag").isin("A", "R"))
        .groupBy(
            col("l_linestatus").alias("ls"),
            dfloor((col("l_extendedprice") * 100) + F.lit(0.5)).cast("long").alias("v"),
            F.floor(col("l_extendedprice") / 5000).cast("long").alias("bkt"),
        )
        .agg(
            F.count(F.when(col("l_returnflag") == "A", 1)).alias("na"),
            F.count(F.when(col("l_returnflag") == "R", 1)).alias("nr"),
            F.count("*").alias("nt"),
        )
    )
    ranked = ranking.doubled_midranks(hist, ["ls"]).select(
        "ls", "na", "nr", "nt", "mr2"
    )
    agg = ranked.groupBy("ls").agg(
        F.sum("na").alias("n1"),
        F.sum("nr").alias("n2"),
        F.sum(col("na").cast("decimal(38,0)") * col("mr2"))
        .cast("decimal(38,0)").alias("r2a"),
        F.sum(col("nt").cast("decimal(38,0)") * col("nt") * col("nt")
              - col("nt")).cast("decimal(38,0)").alias("tsum"),
    )
    n1d = col("n1").cast("double")
    n2d = col("n2").cast("double")
    u = (col("r2a") - col("n1") * (col("n1") + 1)).cast("double") / 2
    nn = col("n1") + col("n2")
    # try_divide twice: a single-row status zeroes the tie-correction
    # denominator, and a status missing one arm (n1*n2 = 0) has no
    # defined z / effect size — NULL in both engines (the oracle's
    # x/0 is NULL)
    sigma = F.sqrt(
        n1d * n2d / 12
        * ((nn + 1).cast("double")
           - F.try_divide(col("tsum").cast("double"),
                          nn.cast("double") * (n1d + n2d - 1)))
    )
    return agg.select(
        col("ls").alias("l_linestatus"),
        col("n1").cast("long").alias("n_a"),
        col("n2").cast("long").alias("n_r"),
        (u).alias("u_stat"),
        (F.try_divide(u - n1d * n2d / 2, sigma)).alias("z_score"),
        (1 - F.try_divide(2 * u, n1d * n2d)).alias("rank_biserial"),
    ).orderBy("l_linestatus")


_RANK_SQL = """
      SELECT g, v,
             2 * COALESCE(SUM(cnt) OVER (
                   PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS mr2
      FROM (SELECT {g} AS g, {v} AS v, COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2)
"""


@q(
    "q_spearman_corr",
    oracle=f"""
    WITH rx AS ({_RANK_SQL.format(g="l_returnflag",
                                  v="CAST(l_quantity AS BIGINT)")}),
    ry AS ({_RANK_SQL.format(g="l_returnflag",
                             v="CAST(FLOOR((l_discount * 100) + 0.5) AS BIGINT)")}),
    joined AS (
      SELECT li.l_returnflag AS g, rx.mr2 AS x2, ry.mr2 AS y2
      FROM lineitem li
      JOIN rx ON rx.g = li.l_returnflag
             AND rx.v = CAST(li.l_quantity AS BIGINT)
      JOIN ry ON ry.g = li.l_returnflag
             AND ry.v = CAST(FLOOR((li.l_discount * 100) + 0.5) AS BIGINT)
    ), mom AS (
      SELECT g, COUNT(*) AS n,
             CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y2 AS DECIMAL(38,0)) * y2) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * y2) AS DECIMAL(38,0)) AS sxy
      FROM joined GROUP BY g
    )
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS spearman_rho
    FROM mom ORDER BY l_returnflag
    """,
    desc="Spearman rank correlation between quantity and discount per "
         "return flag — the monotone-association measure that "
         "q_corr_exact's Pearson misses when the relationship is "
         "nonlinear. Tie-corrected by construction: Pearson on exact "
         "integer MIDRANKS (2*mid = 2*before + ties + 1), where ranks "
         "come from per-group distinct-value histograms (~50 quantity "
         "/ ~11 discount values per flag) whose prefix-sum windows "
         "partition by group and whose join back to the fact rows is "
         "a BROADCAST of those tiny rank maps. Moment sums accumulate "
         "as DECIMAL(38,0) (exact up to ~1e29, far past 100 TB row "
         "counts); rho is one closed-form double, rounded 6.",
    tags=["stats", "window", "agg"],
)
def q_spearman_corr(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")

    def rank_map(value_col):
        hist = (
            li.groupBy(
                col("l_returnflag").alias("g"), value_col.alias("v")
            ).agg(F.count("*").alias("cnt"))
        )
        w = (
            Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return hist.select(
            "g", "v",
            (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
             + col("cnt") + 1).alias("mr2"),
        )

    xv = col("l_quantity").cast("long")
    yv = dfloor((col("l_discount") * 100) + F.lit(0.5)).cast("long")
    rx = rank_map(xv).select(
        col("g").alias("gx"), col("v").alias("vx"), col("mr2").alias("x2")
    )
    ry = rank_map(yv).select(
        col("g").alias("gy"), col("v").alias("vy"), col("mr2").alias("y2")
    )
    joined = (
        li.select(col("l_returnflag").alias("g"), xv.alias("xv"), yv.alias("yv"))
        .join(broadcast(rx), (col("g") == col("gx")) & (col("xv") == col("vx")))
        .join(broadcast(ry), (col("g") == col("gy")) & (col("yv") == col("vy")))
        .select("g", "x2", "y2")
    )
    d38 = "decimal(38,0)"
    mom = joined.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(col("x2").cast(d38)).cast(d38).alias("sx"),
        F.sum(col("y2").cast(d38)).cast(d38).alias("sy"),
        F.sum(col("x2").cast(d38) * col("x2")).cast(d38).alias("sxx"),
        F.sum(col("y2").cast(d38) * col("y2")).cast(d38).alias("syy"),
        F.sum(col("x2").cast(d38) * col("y2")).cast(d38).alias("sxy"),
    )
    nd = col("n").cast("double")
    num = nd * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    den = F.sqrt(
        (nd * col("sxx").cast("double")
         - col("sx").cast("double") * col("sx").cast("double"))
        * (nd * col("syy").cast("double")
           - col("sy").cast("double") * col("sy").cast("double"))
    )
    return mom.select(
        col("g").alias("l_returnflag"),
        col("n").cast("long").alias("n_rows"),
        (num / den).alias("spearman_rho"),
    ).orderBy("l_returnflag")
