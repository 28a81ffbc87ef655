"""Fifty-sixth-wave query inventory: quasi-experimental estimation —
DIFFERENCE-IN-DIFFERENCES (the pre/post x treated/control estimator
that removes both the group baseline and the common time trend: the
workhorse of policy/rollout analysis, one rung above
q_stratified_effect's single-snapshot adjustment) and
CAPTURE-RECAPTURE (the Chapman-corrected Lincoln-Petersen population
estimate from two independent hash samples — ecology's abundance
estimator, in pipeline terms a way to estimate a table's true
cardinality from two cheap overlapping samples, here self-validated
against the known truth).

Determinism discipline: cell sums are exact integer cents/quantities
in one conditional agg; both hash samples use the engine-portable md5
gate on disjoint hex slices, so membership and overlap are identical
on both engines; every estimate is one closed-form double, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import q

_CUT = "1997-01-01"


@q(
    "q_diff_in_diff",
    oracle=f"""
    WITH units AS (
      SELECT (p.p_type LIKE 'PROMO%') AS treated,
             (l.l_shipdate >= TIMESTAMP '{_CUT} 00:00:00') AS post,
             CAST(l.l_quantity AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), cells AS (
      SELECT treated, post, COUNT(*) AS n,
             SUM(CAST(y AS DECIMAL(38,0))) AS s,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS ss
      FROM units GROUP BY treated, post
    ), wide AS (
      SELECT
        MAX(CASE WHEN treated AND post THEN CAST(s AS DOUBLE) / n END) AS tp,
        MAX(CASE WHEN treated AND NOT post
                 THEN CAST(s AS DOUBLE) / n END) AS tb,
        MAX(CASE WHEN NOT treated AND post
                 THEN CAST(s AS DOUBLE) / n END) AS cp,
        MAX(CASE WHEN NOT treated AND NOT post
                 THEN CAST(s AS DOUBLE) / n END) AS cb,
        MAX(CASE WHEN treated AND post THEN n END) AS n_tp,
        SUM(n) AS n_all,
        SUM(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS ssw,
        SUM(CAST(1.0 AS DOUBLE) / n) AS inv_n
      FROM cells
    )
    SELECT CAST(n_all AS BIGINT) AS n_rows,
           (tb) AS treated_pre, (tp) AS treated_post,
           (cb) AS control_pre, (cp) AS control_post,
           ((tp - tb) - (cp - cb)) AS did_estimate,
           (SQRT(ssw / (n_all - 4) * inv_n)) AS did_se
    FROM wide
    """,
    desc="Difference-in-differences: effect of PROMO part types on "
         "quantity across the 1997 cut — (treated post - treated "
         "pre) - (control post - control pre), which cancels BOTH "
         "the permanent treated/control baseline gap and the common "
         "time trend that a naive post-vs-pre or treated-vs-control "
         "comparison conflates (the parallel-trends workhorse of "
         "rollout analysis; q_stratified_effect's longitudinal "
         "sibling). The SE is the classical pooled-within-cell form "
         "sqrt(s2_w * sum(1/n_cell)). Four cells' exact integer "
         "moments come from ONE conditional agg over the "
         "broadcast-dim join; every output is a closed-form double.",
    tags=["stats", "join", "agg"],
)
def q_diff_in_diff(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part")
    d38 = "decimal(38,0)"
    units = li.join(
        broadcast(part), col("l_partkey") == col("p_partkey")
    ).select(
        col("p_type").startswith("PROMO").alias("treated"),
        (col("l_shipdate") >= F.lit(f"{_CUT} 00:00:00").cast("timestamp"))
        .alias("post"),
        col("l_quantity").cast("long").alias("y"),
    )
    cells = units.groupBy("treated", "post").agg(
        F.count("*").alias("n"),
        F.sum(col("y").cast(d38)).alias("s"),
        F.sum(col("y").cast(d38) * col("y")).alias("ss"),
    )
    mean = col("s").cast("double") / col("n")
    wide = cells.agg(
        F.max(F.when(col("treated") & col("post"), mean)).alias("tp"),
        F.max(F.when(col("treated") & ~col("post"), mean)).alias("tb"),
        F.max(F.when(~col("treated") & col("post"), mean)).alias("cp"),
        F.max(F.when(~col("treated") & ~col("post"), mean)).alias("cb"),
        F.sum("n").alias("n_all"),
        F.sum(
            col("ss").cast("double")
            - col("s").cast("double") * col("s").cast("double") / col("n")
        ).alias("ssw"),
        F.sum(F.lit(1.0) / col("n")).alias("inv_n"),
    )
    return wide.select(
        col("n_all").cast("long").alias("n_rows"),
        (col("tb")).alias("treated_pre"),
        (col("tp")).alias("treated_post"),
        (col("cb")).alias("control_pre"),
        (col("cp")).alias("control_post"),
        ((col("tp") - col("tb")) - (col("cp") - col("cb")))
        .alias("did_estimate"),
        # try_divide: with n_all <= 4 rows the pooled-variance df is
        # zero or negative-degenerate; the SE is NULL, matching the
        # oracle's x/0 = NULL
        (F.sqrt(F.try_divide(col("ssw"), col("n_all") - 4)
                   * col("inv_n"))).alias("did_se"),
    )


# two INDEPENDENT deterministic samples: gates on disjoint md5 hex
# slices (chars 1-15 vs 16-30) — the portable-hash construction, twice
_GATE_A = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10"
_GATE_B = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 16, 15))::BIGINT % 10"


@q(
    "q_capture_recapture",
    oracle=f"""
    WITH marked AS (
      SELECT doc_id,
             ({_GATE_A}) < 3 AS in_a,
             ({_GATE_B}) < 3 AS in_b
      FROM documents
    ), counts AS (
      SELECT COUNT(*) AS n_true,
             COUNT(*) FILTER (WHERE in_a) AS n1,
             COUNT(*) FILTER (WHERE in_b) AS n2,
             COUNT(*) FILTER (WHERE in_a AND in_b) AS m
      FROM marked
    )
    SELECT CAST(n1 AS BIGINT) AS capture_1,
           CAST(n2 AS BIGINT) AS capture_2,
           CAST(m AS BIGINT) AS recaptured,
           CAST(n_true AS BIGINT) AS true_population,
           ((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1)
             AS chapman_estimate,
           (((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1
                  - n_true) / n_true) AS relative_error
    FROM counts
    """,
    desc="Capture-recapture (Chapman-corrected Lincoln-Petersen) "
         "population estimate: two INDEPENDENT 30% samples of the "
         "document table — gated on disjoint md5 hex slices, so both "
         "engines mark the identical animals — and the abundance "
         "estimate N ~ (n1+1)(n2+1)/(m+1) - 1 from their overlap, "
         "validated against the true count (relative_error ~ "
         "1/sqrt(m)). Ecology's estimator, and in pipeline terms the "
         "cheap-cardinality trick when scanning is expensive but two "
         "small samples exist; also the honesty check for the "
         "independence assumption itself (correlated gates would "
         "bias it, which is why the slices are disjoint). ONE "
         "conditional-count agg, closed-form doubles.",
    tags=["sampling", "stats", "agg"],
)
def q_capture_recapture(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(col("doc_id").cast("string"))
    in_a = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 10 < 3
    in_b = F.conv(F.substring(h, 16, 15), 16, 10).cast("long") % 10 < 3
    counts = docs.select(in_a.alias("in_a"), in_b.alias("in_b")).agg(
        F.count("*").alias("n_true"),
        F.count(F.when(col("in_a"), 1)).alias("n1"),
        F.count(F.when(col("in_b"), 1)).alias("n2"),
        F.count(F.when(col("in_a") & col("in_b"), 1)).alias("m"),
    )
    chapman = (
        (col("n1") + 1).cast("double") * (col("n2") + 1) / (col("m") + 1) - 1
    )
    return counts.select(
        col("n1").cast("long").alias("capture_1"),
        col("n2").cast("long").alias("capture_2"),
        col("m").cast("long").alias("recaptured"),
        col("n_true").cast("long").alias("true_population"),
        (chapman).alias("chapman_estimate"),
        ((chapman - col("n_true")) / col("n_true"))
        .alias("relative_error"),
    )
