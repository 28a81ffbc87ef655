"""Nineteenth-wave query inventory: distribution-drift statistics and
temporal/iterative shapes a training-data pipeline runs continuously —
two-sample KS drift, PSI, chi-square association, EWMA smoothing,
weighted sampling without replacement, SCD2 point-in-time joins, and a
fixed-iteration weighted PageRank.

Determinism discipline (queries.py header): every cross-engine double
reduction is decimal-accumulated after an explicit ROUND (the engines'
shared ROUND semantics, per ADVICE r3), divisions happen on doubles
produced from exact integers/decimals, and EWMA weights are exact
powers of two so the weighting itself introduces zero FP noise.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators.dedup import portable_hash60
from . import dfloor, q

# Portable deterministic uniform in (0, 1]: md5 of the key's decimal
# string, first 15 hex digits (fits a signed BIGINT exactly in both
# engines), modulo 1e6, shifted off zero. Same construction as the
# q_stratified_sample gate (queries/wave4.py), reused so one audited
# hash idiom serves every sampling query.
_U_SQL = (
    "((('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15))::BIGINT % 1000000) + 1)"
    " / 1000000.0"
)


def _uniform(key):
    return (F.pmod(portable_hash60(key.cast("string")), lit(1000000)) + 1) / 1000000.0


@q(
    "q_ks_drift",
    oracle="""
    WITH g AS (
      SELECT event_type, FLOOR((value) * 1e2 + 0.5) / 1e2 AS v,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n2
      FROM events
      GROUP BY event_type, FLOOR((value) * 1e2 + 0.5) / 1e2
    ), c AS (
      SELECT event_type,
             SUM(n1) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS c1,
             SUM(n2) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS c2,
             SUM(n1) OVER (PARTITION BY event_type) AS t1,
             SUM(n2) OVER (PARTITION BY event_type) AS t2
      FROM g
    )
    SELECT event_type,
           CAST(MAX(t1) AS BIGINT) AS n_early,
           CAST(MAX(t2) AS BIGINT) AS n_late,
           (MAX(ABS(CAST(c1 AS DOUBLE) / t1 - CAST(c2 AS DOUBLE) / t2))) AS ks
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    desc="Two-sample Kolmogorov-Smirnov drift statistic per event "
         "type: first half of January vs second half. The continuous "
         "value is quantized to 2 decimals, counted per (type, period, "
         "v) — a combinable agg that collapses the stream to distinct "
         "values BEFORE any window — then the empirical CDF gap is a "
         "per-type window over distinct values only. At 100 TB the "
         "sort covers |distinct quantized values| per type, not rows. "
         "All divisions are exact-integer -> double (IEEE-identical "
         "across engines); the max-abs-gap needs no FP accumulation "
         "at all.",
    tags=["events", "window", "drift"],
)
def q_ks_drift(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    early = (col("ts") < lit("2024-01-16").cast("timestamp")).cast("long")
    g = (
        ev.select("event_type", (dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).alias("v"), early.alias("e"))
        .groupBy("event_type", "v")
        .agg(F.sum("e").alias("n1"), F.sum(1 - col("e")).alias("n2"))
    )
    wcum = (
        Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("n1").over(wcum).alias("c1"),
        F.sum("n2").over(wcum).alias("c2"),
        F.sum("n1").over(wtot).alias("t1"),
        F.sum("n2").over(wtot).alias("t2"),
    )
    # try_divide: a type entirely inside one half has an empty other
    # ECDF; its KS gap is NULL, matching the oracle's x/0 = NULL
    gap = F.abs(F.try_divide(col("c1").cast("double"), col("t1"))
                - F.try_divide(col("c2").cast("double"), col("t2")))
    return (
        c.groupBy("event_type")
        .agg(
            F.max("t1").alias("n_early"),
            F.max("t2").alias("n_late"),
            (F.max(gap)).alias("ks"),
        )
        .orderBy("event_type")
    )


@q(
    "q_psi_drift",
    oracle="""
    WITH o AS (
      SELECT c_mktsegment AS seg,
             LEAST(CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT), 9) AS bin,
             CASE WHEN o_orderdate < DATE '1998-01-01' THEN 1 ELSE 0 END AS old
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), cells AS (
      SELECT seg, bin, SUM(old) AS na, SUM(1 - old) AS nb FROM o GROUP BY seg, bin
    ), tot AS (
      SELECT seg, SUM(na) AS ta, SUM(nb) AS tb FROM cells GROUP BY seg
    ), terms AS (
      SELECT cells.seg,
             (CAST(na + 1 AS DOUBLE) / (ta + 10)) AS pa,
             (CAST(nb + 1 AS DOUBLE) / (tb + 10)) AS pb,
             ta, tb
      FROM cells JOIN tot ON cells.seg = tot.seg
    )
    SELECT seg,
           CAST(MAX(ta) AS BIGINT) AS n_old,
           CAST(MAX(tb) AS BIGINT) AS n_new,
           (CAST(SUM(CAST(FLOOR(((pa - pb) * LN(pa / pb)) * 1e12 + 0.5) / 1e12
                               AS DECIMAL(38,12))) AS DOUBLE)) AS psi
    FROM terms GROUP BY seg ORDER BY seg
    """,
    desc="Population Stability Index of the order-price distribution "
         "per market segment: pre-1998 cohort vs 1998+ cohort over 10 "
         "fixed 25k-wide price bins (Laplace +1 smoothing keeps LN "
         "finite). The fact scan reduces to (segment, bin, cohort) "
         "counts in one combinable agg; the PSI itself runs over 50 "
         "cells. Per-bin terms are ROUNDed to 12 decimals then "
         "decimal-summed so the 10-term reduction is order-independent "
         "across engines (the queries.py dsum discipline applied to a "
         "log-domain term).",
    tags=["join", "agg", "drift"],
)
def q_psi_drift(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = o.join(broadcast(c), col("o_custkey") == col("c_custkey")).select(
        col("c_mktsegment").alias("seg"),
        F.least(F.floor(col("o_totalprice") / 25000.0).cast("long"), lit(9)).alias("bin"),
        F.when(col("o_orderdate") < lit("1998-01-01").cast("date"), 1).otherwise(0).alias("old"),
    )
    cells = joined.groupBy("seg", "bin").agg(
        F.sum("old").alias("na"), F.sum(1 - col("old")).alias("nb")
    )
    tot = cells.groupBy("seg").agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    terms = cells.join(broadcast(tot), "seg").select(
        "seg", "ta", "tb",
        ((col("na") + 1).cast("double") / (col("ta") + 10)).alias("pa"),
        ((col("nb") + 1).cast("double") / (col("tb") + 10)).alias("pb"),
    )
    term = (dfloor(((col("pa") - col("pb")) * F.log(col("pa") / col("pb"))) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12))
    return (
        terms.groupBy("seg")
        .agg(
            F.max("ta").alias("n_old"),
            F.max("tb").alias("n_new"),
            (F.sum(term.cast("decimal(38,12)")).cast("double")).alias("psi"),
        )
        .orderBy("seg")
    )


@q(
    "q_chi2_assoc",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS prio, COUNT(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority
    ), m AS (
      SELECT seg, prio, n,
             SUM(n) OVER (PARTITION BY seg) AS rt,
             SUM(n) OVER (PARTITION BY prio) AS ct,
             SUM(n) OVER (PARTITION BY 1) AS tot
      FROM cells
    )
    SELECT seg,
           CAST(SUM(n) AS BIGINT) AS n_orders,
           (CAST(SUM(CAST(FLOOR((POWER(CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * ct / tot, 2)
               / (CAST(rt AS DOUBLE) * ct / tot)) * 1e10 + 0.5) / 1e10 AS DECIMAL(38,10)))
             AS DOUBLE)) AS chi2_contrib
    FROM m GROUP BY seg ORDER BY seg
    """,
    desc="Chi-square association between market segment and order "
         "priority (the categorical-dependence screen a feature audit "
         "runs): contingency cells via one combinable count, margins "
         "via windows over the 25-cell table, per-segment chi-square "
         "contributions decimal-accumulated after a 10-decimal ROUND. "
         "Expected counts are computed in doubles from exact integer "
         "margins, so engines agree bit-for-bit before the ROUND. "
         "The margin windows run over 25 rows, never the fact table "
         "(the grand total is the deliberate 1-row broadcast cross "
         "join, the q_mix_temperature precedent).",
    tags=["join", "agg", "window", "drift", "cross"],
)
def q_chi2_assoc(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(broadcast(c), col("o_custkey") == col("c_custkey"))
        .groupBy(col("c_mktsegment").alias("seg"), col("o_orderpriority").alias("prio"))
        .agg(F.count("*").alias("n"))
    )
    tot = cells.agg(F.sum("n").alias("tot"))
    m = cells.select(
        "seg", "n",
        F.sum("n").over(Window.partitionBy("seg")).alias("rt"),
        F.sum("n").over(Window.partitionBy("prio")).alias("ct"),
    ).crossJoin(broadcast(tot))
    e = col("rt").cast("double") * col("ct") / col("tot")
    term = (dfloor((F.pow(col("n").cast("double") - e, 2) / e) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
    return (
        m.groupBy("seg")
        .agg(
            F.sum("n").alias("n_orders"),
            (F.sum(term.cast("decimal(38,10)")).cast("double")).alias("chi2_contrib"),
        )
        .orderBy("seg")
    )


@q(
    "q_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS m
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT d1.event_type, d1.day, CAST(MAX(d1.n) AS BIGINT) AS n,
           (CAST(SUM(CAST(FLOOR((d2.m / POWER(2.0, date_diff('day', d2.day, d1.day))) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(38,10))) AS DOUBLE)
             / CAST(SUM(CAST(FLOOR((1.0 / POWER(2.0, date_diff('day', d2.day, d1.day))) * 1e10 + 0.5) / 1e10
                             AS DECIMAL(38,10))) AS DOUBLE)) AS ewma
    FROM daily d1
    JOIN daily d2
      ON d1.event_type = d2.event_type
     AND d2.day BETWEEN d1.day - 13 AND d1.day
    GROUP BY d1.event_type, d1.day
    ORDER BY d1.event_type, d1.day
    """,
    desc="Exponentially weighted moving average of the daily mean "
         "value per event type (half-life 1 day, 14-day support). The "
         "stream first collapses to one row per (type, day) via a "
         "combinable decimal agg; the EWMA is then a bounded-range "
         "self-join over the tiny daily series (fan-out <= 14 rows per "
         "day, partitioned by type). Weights are exact powers of two — "
         "2^-k scales the mantissa without rounding — so the only FP "
         "noise is the final division, and numerator/denominator are "
         "each decimal-accumulated after a shared 10-decimal ROUND.",
    tags=["events", "range", "agg"],
)
def q_ewma_daily(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            (F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)")).cast("double")
             / F.count("*")).alias("m"),
        )
    )
    d1 = daily.alias("d1")
    d2 = daily.alias("d2")
    k = F.datediff(col("d1.day"), col("d2.day"))
    wnum = (dfloor((col("d2.m") / F.pow(lit(2.0), k)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(38,10)")
    wden = (dfloor((lit(1.0) / F.pow(lit(2.0), k)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(38,10)")
    return (
        d1.join(
            d2,
            (col("d1.event_type") == col("d2.event_type"))
            & (col("d2.day") >= F.date_sub(col("d1.day"), 13))
            & (col("d2.day") <= col("d1.day")),
        )
        .groupBy(col("d1.event_type").alias("event_type"), col("d1.day").alias("day"))
        .agg(
            F.max(col("d1.n")).alias("n"),
            (F.sum(wnum).cast("double") / F.sum(wden).cast("double")).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


@q(
    "q_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT c_mktsegment AS seg, o_orderkey, o_totalprice,
             LN({_U_SQL.format(key='o_orderkey')}) / o_totalprice AS ekey
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), ranked AS (
      SELECT seg, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY seg
                                ORDER BY ekey DESC, o_orderkey) AS rn
      FROM keyed
    )
    SELECT seg, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
    FROM ranked WHERE rn <= 10 ORDER BY seg, rn
    """,
    desc="Weighted sampling WITHOUT replacement, 10 orders per market "
         "segment with probability proportional to order value — the "
         "Efraimidis-Spirakis exponential-keys construction "
         "(key = ln(u)/w, take the largest; u is the audited portable "
         "md5 uniform). One pass, no collect: the per-group top-k is a "
         "rank window that AQE turns into partial top-k pushdown; at "
         "100 TB this is the one-shot alternative to iterative "
         "reservoir passes, and composes with any weight expression "
         "(quality score, token count).",
    tags=["sample", "window", "join"],
)
def q_weighted_sample(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    keyed = o.join(broadcast(c), col("o_custkey") == col("c_custkey")).select(
        col("c_mktsegment").alias("seg"), "o_orderkey", "o_totalprice",
        (F.log(_uniform(col("o_orderkey"))) / col("o_totalprice")).alias("ekey"),
    )
    w = Window.partitionBy("seg").orderBy(col("ekey").desc(), col("o_orderkey"))
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") <= 10)
        .select("seg", "rn", "o_orderkey", "o_totalprice")
        .orderBy("seg", "rn")
    )


@q(
    "q_scd2_pit_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             COALESCE(LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                      TIMESTAMP '2100-01-01') AS valid_to
      FROM events WHERE event_type IN ('signup', 'error')
    )
    SELECT dim.state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(FLOOR((p.value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events p
    JOIN dim ON p.user_id = dim.user_id
            AND p.ts >= dim.valid_from AND p.ts < dim.valid_to
    WHERE p.event_type = 'purchase'
    GROUP BY dim.state ORDER BY dim.state
    """,
    desc="SCD2 point-in-time join: signup/error events define each "
         "user's state history as half-open validity intervals "
         "(LEAD over the per-user timeline, deterministic tie-break on "
         "event_id), and purchases join to the state that was current "
         "at purchase time. The interval build is one per-user window; "
         "the PIT join is equi on user_id with a range residual, so it "
         "hash-partitions on the user key — no nested loop. This is "
         "the dimension-history pattern every warehouse fact load "
         "needs; intervals never overlap by construction.",
    tags=["events", "join", "window", "range"],
)
def q_scd2_pit_join(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    wlead = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(col("event_type").isin("signup", "error"))
        .select(
            "user_id", col("event_type").alias("state"), col("ts").alias("valid_from"),
            F.coalesce(
                F.lead("ts").over(wlead), lit("2100-01-01").cast("timestamp")
            ).alias("valid_to"),
        )
    )
    p = ev.filter(col("event_type") == "purchase").select(
        col("user_id").alias("p_user"), col("ts").alias("p_ts"), "value"
    )
    return (
        p.join(
            dim,
            (col("p_user") == col("user_id"))
            & (col("p_ts") >= col("valid_from")) & (col("p_ts") < col("valid_to")),
        )
        .groupBy("state")
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("p_user").alias("n_users"),
            F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)")).cast("double")
            .alias("total_value"),
        )
        .orderBy("state")
    )


_PR_EDGE_SQL = """
      SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY cn.n_name, sn.n_name
"""

# One PageRank sweep as SQL: new_p(dst) = 0.15/25 + 0.85 * decimal-sum
# of inbound p(src) * w / outdeg(src), contributions ROUNDed to 12
# decimals first so the <=25-term reduction is order-independent.
_PR_STEP_SQL = """
      SELECT n.n_name AS node,
             FLOOR((0.15 / 25 + 0.85 * COALESCE(CAST(SUM(CAST(
               FLOOR(({prev}.p * e.w / CAST(od.outw AS DOUBLE))
                     * 1e12 + 0.5)
               AS DECIMAL(38,0))) AS DOUBLE) / 1e12, 0.0))
                   * 1e12 + 0.5) / 1e12 AS p
      FROM nation n
      LEFT JOIN edges e ON e.dst = n.n_name
      LEFT JOIN {prev} ON {prev}.node = e.src
      LEFT JOIN outdeg od ON od.src = e.src
      GROUP BY n.n_name
"""


@q(
    "q_pagerank_nations",
    oracle=f"""
    WITH edges AS ({_PR_EDGE_SQL}),
    outdeg AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
    p0 AS (SELECT n_name AS node, 1.0 / 25 AS p FROM nation),
    p1 AS ({_PR_STEP_SQL.format(prev='p0')}),
    p2 AS ({_PR_STEP_SQL.format(prev='p1')}),
    p3 AS ({_PR_STEP_SQL.format(prev='p2')})
    SELECT node AS n_name, (p) AS pagerank
    FROM p3 ORDER BY n_name
    """,
    desc="Three fixed iterations of weighted PageRank over the "
         "customer-nation -> supplier-nation trade graph (damping "
         "0.85). The heavy stage is the edge extraction — a fact join "
         "with every dimension broadcast, collapsing 100 TB of "
         "lineitems to a <=625-edge weighted graph — after which each "
         "sweep is a broadcast join-agg over the <=625-row edge list, "
         "lineage-truncated once as bounded model state so no sweep "
         "re-derives the fact join (the same message-passing shape as "
         "q_dedup_clusters' connected components, which handles the "
         "unbounded-iteration case with checkpoints). "
         "Per-sweep inbound sums are decimal-accumulated "
         "after a 12-decimal ROUND and the rank vector is re-ROUNDed "
         "each sweep, so both engines walk identical trajectories.",
    tags=["join", "agg", "graph"],
)
def q_pagerank_nations(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = tables.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        li.join(o, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") == col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(nat.select(col("n_nationkey").alias("ck"),
                                   col("n_name").alias("src"))),
              col("c_nationkey") == col("ck"))
        .join(broadcast(nat.select(col("n_nationkey").alias("sk"),
                                   col("n_name").alias("dst"))),
              col("s_nationkey") == col("sk"))
        .groupBy("src", "dst").agg(F.count("*").alias("w"))
    )
    # Truncate lineage at the <=625-row edge list (25x25 nations, a
    # bounded model table like kmeans centroids): without it every
    # unrolled sweep re-derives the fact-table edge extraction — the
    # audited plan was 266 nodes / 22 exchanges / 8 sort-merge joins,
    # and the ONE stage that is heavy at 100 TB ran up to three times.
    # Lazy localCheckpoint materializes it once on first use; each
    # sweep is then a broadcast join over tiny frames. Measured at
    # sf0.1 (noop sink, alternating reps): warm 1.4-1.9 s -> 0.6-0.9 s,
    # cold 4.95 -> 0.88; results bit-identical.
    edges = edges.localCheckpoint(eager=False)
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("outw")) \
        .select(col("src").alias("od_src"), "outw")
    nodes = nat.select(col("n_name").alias("node"))
    p = nodes.select(col("node").alias("p_node"), (lit(1.0) / 25).alias("p"))
    for _ in range(3):
        # engine-identical 1e-12 integer grid per contribution, exact
        # integer sum, one shared /1e12 — then the damped iterate
        # re-grids the same way (r9: ROUND double-rounded differently
        # across engines on this derived trajectory)
        contrib = F.floor(
            (col("p") * col("w") / col("outw").cast("double"))
            * F.lit(1e12) + F.lit(0.5)
        ).cast("decimal(38,0)")
        p = (
            nodes.join(broadcast(edges), col("dst") == col("node"), "left")
            .join(broadcast(p), col("p_node") == col("src"), "left")
            .join(broadcast(outdeg), col("od_src") == col("src"), "left")
            .groupBy("node")
            .agg(
                (dfloor((lit(0.15) / 25
                    + 0.85 * F.coalesce(
                        F.sum(contrib).cast("double") / F.lit(1e12),
                        lit(0.0)))
                    * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).alias("p")
            )
            .select(col("node").alias("p_node"), "p")
        )
    return p.select(col("p_node").alias("n_name"), col("p").alias("pagerank")) \
        .orderBy("n_name")
