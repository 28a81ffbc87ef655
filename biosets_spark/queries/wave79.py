"""Seventy-ninth-wave query inventory: collocation strength and
equivalence — DUNNING'S LOG-LIKELIHOOD RATIO for adjacent bigrams
(G2 over the 2x2 contingency of (w1 precedes w2): the standard
collocation statistic that stays calibrated for RARE words where
q_skipgram_pmi's PMI explodes — PMI ranks a hapax pair above 'of
the'; G2 weighs the evidence mass) and the TOST EQUIVALENCE test
(two one-sided t-tests that the early-half vs late-half daily means
per event type differ by LESS than a 10% margin: the only correct
way to claim 'nothing changed' — q_welch_ttest's non-rejection is
absence of evidence, TOST is evidence of absence).

Determinism discipline: bigram/unigram counts are exact integers;
each G2 cell term O*ln(O/E) is one closed-form double quantized
the 1e-6 grid ->DECIMAL(28,6) before the 4-cell sum; daily means are
exact integer cents with decimal moment sums per half; every t is
one closing closed form against the shared t-critical literal.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL
_MIN_BG = 30
_T_CRIT = 1.703  # one-sided 5%, ~27 df (n_days-2 per half at 30-day span)
_MARGIN = 0.10


@q(
    "q_collocation_llr",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), posed AS (
      SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS p
      FROM toks
    ), bg AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS o11
      FROM posed a JOIN posed b
        ON a.doc_id = b.doc_id AND b.p = a.p + 1
      GROUP BY 1, 2
    ), tot AS (
      SELECT SUM(o11) AS nn FROM bg
    ), m1 AS (
      SELECT w1, SUM(o11) AS c1 FROM bg GROUP BY w1
    ), m2 AS (
      SELECT w2, SUM(o11) AS c2 FROM bg GROUP BY w2
    ), cells AS (
      SELECT bg.w1, bg.w2, bg.o11,
             m1.c1 - bg.o11 AS o12,
             m2.c2 - bg.o11 AS o21,
             t.nn - m1.c1 - m2.c2 + bg.o11 AS o22,
             m1.c1, m2.c2, t.nn
      FROM bg JOIN m1 ON bg.w1 = m1.w1 JOIN m2 ON bg.w2 = m2.w2
      CROSS JOIN tot t
      WHERE bg.o11 >= {_MIN_BG}
    ), g2 AS (
      SELECT w1, w2, o11,
             2 * CAST(
               CAST(FLOOR((CASE WHEN o11 > 0 THEN o11 * LN(o11 * CAST(nn AS DOUBLE) / (c1 * CAST(c2 AS DOUBLE))) ELSE 0 END) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))
             + CAST(FLOOR((CASE WHEN o12 > 0 THEN o12 * LN(o12 * CAST(nn AS DOUBLE) / (c1 * CAST(nn - c2 AS DOUBLE))) ELSE 0 END) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))
             + CAST(FLOOR((CASE WHEN o21 > 0 THEN o21 * LN(o21 * CAST(nn AS DOUBLE) / (CAST(nn - c1 AS DOUBLE) * c2)) ELSE 0 END) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))
             + CAST(FLOOR((CASE WHEN o22 > 0 THEN o22 * LN(o22 * CAST(nn AS DOUBLE) / (CAST(nn - c1 AS DOUBLE) * (nn - c2))) ELSE 0 END) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))
               AS DOUBLE) AS llr
      FROM cells
    )
    SELECT w1, w2, CAST(o11 AS BIGINT) AS pair_count,
           (llr) AS g2_llr
    FROM g2 ORDER BY llr DESC, w1, w2 LIMIT 20
    """,
    desc="Dunning log-likelihood collocations: for each adjacent "
         f"bigram with support >= {_MIN_BG}, the G2 statistic over "
         "its 2x2 contingency (o11 = together, o12/o21 = one "
         "without the other, o22 = neither), top-20 — the standard "
         "collocation test that stays CALIBRATED for rare words "
         "where PMI (q_skipgram_pmi) diverges: G2 weighs evidence "
         "mass, so 'hash join' beats a hapax pair. Adjacent bigrams "
         "are built per-row via zip_with over two array slices (no "
         "explode-side self-join — the token table is never "
         "shuffled, only (w1,w2) pairs); margins come from the "
         "bigram table itself "
         "(independence model over bigram positions); each of the "
         "four O*ln(O/E) cell terms quantizes the 1e-6 grid ->DECIMAL "
         "before the sum so G2 is order-free; ordering tie-breaks "
         "on the pair strings.",
    tags=["text", "stats", "join", "agg", "cross", "range"],
)
def q_collocation_llr(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    # Adjacent bigrams per-row: zip_with over two slices of the token
    # array (the q_bigram_surprise / text.bigram_surprise idiom). The
    # exploded positional self-join this replaces shuffled the token
    # table twice (build + probe of the adjacency join) to produce
    # pairs a single narrow pass computes in place; only (w1, w2)
    # pairs ever reach an exchange now.
    # Tokenize in a separate projection: CollapseProject duplicates
    # only cheap expressions, so the regex split runs once per row
    # instead of once per slice reference (measured ~2x on the
    # skipgram sibling).
    tokd = docs.select(tokens(col("text")).alias("_t"))
    tk = col("_t")
    n = F.size(tk)
    bg_arr = F.when(
        n >= 2,
        F.zip_with(
            F.slice(tk, F.lit(1), n - 1),
            F.slice(tk, F.lit(2), n - 1),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = (
        tokd.select(F.explode(bg_arr).alias("_bg"))
        .groupBy(col("_bg.w1").alias("w1"), col("_bg.w2").alias("w2"))
        .agg(F.count("*").alias("o11"))
    )
    tot = bg.agg(F.sum("o11").alias("nn"))
    m1 = bg.groupBy("w1").agg(F.sum("o11").alias("c1"))
    m2 = bg.groupBy("w2").agg(F.sum("o11").alias("c2"))
    cells = (
        bg.filter(col("o11") >= _MIN_BG)
        .join(broadcast(m1), "w1")
        .join(broadcast(m2), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("o12", col("c1") - col("o11"))
        .withColumn("o21", col("c2") - col("o11"))
        .withColumn("o22", col("nn") - col("c1") - col("c2") + col("o11"))
    )

    def term(o, e_num, e_den):
        return F.when(
            o > 0,
            (dfloor((o * F.log(o * col("nn").cast("double") / (e_num * e_den))) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)),
        ).otherwise(F.lit(0.0)).cast("decimal(28,6)")

    nn_c1 = (col("nn") - col("c1")).cast("double")
    nn_c2 = (col("nn") - col("c2")).cast("double")
    llr = 2 * (
        term(col("o11"), col("c1"), col("c2").cast("double"))
        + term(col("o12"), col("c1"), nn_c2)
        + term(col("o21"), nn_c1, col("c2"))
        + term(col("o22"), nn_c1, (col("nn") - col("c2")))
    ).cast("double")
    return (
        cells.select(
            "w1", "w2",
            col("o11").cast("long").alias("pair_count"),
            (llr).alias("g2_llr"),
            llr.alias("_l"),
        )
        .orderBy(col("_l").desc(), "w1", "w2")
        .limit(20)
        .drop("_l")
    )


@q(
    "q_tost_equivalence",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), split AS (
      SELECT CAST(FLOOR((CAST(MIN(day) - DATE '1970-01-01' AS BIGINT)
                         + CAST(MAX(day) - DATE '1970-01-01' AS BIGINT))
                        / 2.0) AS BIGINT) AS mid
      FROM daily
    ), halves AS (
      SELECT d.event_type,
             (CAST(d.day - DATE '1970-01-01' AS BIGINT) <= s.mid) AS early,
             COUNT(*) AS n,
             CAST(SUM(CAST(d.mc AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(d.mc AS DECIMAL(38,0)) * d.mc) AS DOUBLE) AS s2
      FROM daily d, split s
      GROUP BY 1, 2
    ), stats AS (
      SELECT e.event_type,
             e.n AS n1, l.n AS n2,
             e.s1 / e.n AS m1, l.s1 / l.n AS m2,
             (e.s2 - e.s1 * e.s1 / e.n) / (e.n - 1) AS v1,
             (l.s2 - l.s1 * l.s1 / l.n) / (l.n - 1) AS v2
      FROM halves e JOIN halves l
        ON e.event_type = l.event_type AND e.early AND NOT l.early
    )
    SELECT event_type,
           ((m2 - m1) / 100) AS mean_diff,
           FLOOR(({_MARGIN} * (m1 + m2) / 2 / 100) * 1e4 + 0.5) / 1e4 AS margin,
           (((m2 - m1) + {_MARGIN} * (m1 + m2) / 2)
                 / SQRT(v1 / n1 + v2 / n2)) AS t_lower,
           (({_MARGIN} * (m1 + m2) / 2 - (m2 - m1))
                 / SQRT(v1 / n1 + v2 / n2)) AS t_upper,
           ((m2 - m1) + {_MARGIN} * (m1 + m2) / 2)
             / SQRT(v1 / n1 + v2 / n2) > {_T_CRIT}
           AND ({_MARGIN} * (m1 + m2) / 2 - (m2 - m1))
             / SQRT(v1 / n1 + v2 / n2) > {_T_CRIT} AS equivalent_5pct
    FROM stats ORDER BY event_type
    """,
    desc="TOST equivalence test per event type: are the early-half "
         "and late-half daily mean levels equivalent within a 10% "
         "margin of their pooled level? Two one-sided Welch t's "
         "(diff above -margin AND below +margin, both at 5%) — the "
         "only statistically valid way to CLAIM stability: "
         "q_welch_ttest failing to reject is absence of evidence, "
         "TOST's double rejection is evidence of absence (the "
         "regression-gate semantics a release pipeline wants). "
         "Daily means are exact integer cents; the period split is "
         "the exact FLOOR-midpoint epoch day on both engines; "
         "per-half moments are DECIMAL-accumulated; both t's are "
         "single closed forms against the shared critical literal.",
    tags=["events", "stats", "agg", "cross"],
)
def q_tost_equivalence(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    epoch_day = F.datediff(col("day"), F.lit("1970-01-01").cast("date"))
    split = daily.agg(
        F.floor(
            (F.min(epoch_day) + F.max(epoch_day)) / 2
        ).cast("long").alias("mid")
    )
    mcd = col("mc").cast("decimal(38,0)")
    halves = (
        daily.crossJoin(broadcast(split))
        .groupBy("event_type", (epoch_day <= col("mid")).alias("early"))
        .agg(
            F.count("*").alias("n"),
            F.sum(mcd).cast("double").alias("s1"),
            F.sum(mcd * col("mc")).cast("double").alias("s2"),
        )
    )
    e = halves.filter(col("early")).select(
        "event_type", col("n").alias("n1"),
        col("s1").alias("e1"), col("s2").alias("e2"),
    )
    late = halves.filter(~col("early")).select(
        col("event_type").alias("et2"), col("n").alias("n2"),
        col("s1").alias("l1"), col("s2").alias("l2"),
    )
    st = e.join(late, col("event_type") == col("et2"))
    n1 = col("n1").cast("double")
    n2 = col("n2").cast("double")
    m1 = col("e1") / n1
    m2 = col("l1") / n2
    v1 = (col("e2") - col("e1") * col("e1") / n1) / (n1 - 1)
    v2 = (col("l2") - col("l1") * col("l1") / n2) / (n2 - 1)
    se = F.sqrt(v1 / n1 + v2 / n2)
    margin = _MARGIN * (m1 + m2) / 2
    t_lo = ((m2 - m1) + margin) / se
    t_hi = (margin - (m2 - m1)) / se
    return st.select(
        "event_type",
        ((m2 - m1) / 100).alias("mean_diff"),
        (dfloor((margin / 100) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias("margin"),
        (t_lo).alias("t_lower"),
        (t_hi).alias("t_upper"),
        ((t_lo > _T_CRIT) & (t_hi > _T_CRIT)).alias("equivalent_5pct"),
    ).orderBy("event_type")
