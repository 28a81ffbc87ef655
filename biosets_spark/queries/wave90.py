"""Ninetieth-wave query inventory: sampling design and mixture
optimality — NEYMAN ALLOCATION (the optimal per-segment sample
counts n_h proportional to N_h * S_h for a 10k-row stratified
sample of order value: the survey-sampling answer to 'how do I
sample a 100 TB corpus to estimate a mean cheapest' — with the
variance-efficiency gain over proportional allocation, which is
what q_stratified_sample's rates should be SET from) and the
MIXTURE GAP audit (KL(uniform-target || corpus language mix) with
per-language up/down-sampling factors: the number corpus curation
minimizes when balancing languages, giving q_mix_resample and
q_mix_temperature their target — gap 0 means balanced, and each
factor IS the resampling rate that gets there).

Determinism discipline: strata sizes and language counts are exact
integers; per-stratum sds use exact decimal moments; Neyman shares
and KL terms quantize ROUND->DECIMAL before cross-stratum sums;
allocations round half-up on identical doubles; every output is a
closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_BUDGET = 10_000


@q(
    "q_neyman_allocation",
    oracle=f"""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), mom AS (
      SELECT seg, COUNT(*) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) AS s2
      FROM vals GROUP BY seg
    ), strata AS (
      SELECT seg, n,
             SQRT((s2 - s1 * s1 / n) / (n - 1)) AS sd
      FROM mom
    ), tot AS (
      SELECT SUM(n) AS nt,
             CAST(SUM(CAST(FLOOR((n * sd) * 1e4 + 0.5) / 1e4 AS DECIMAL(38,4))) AS DOUBLE)
               AS sns
      FROM strata
    )
    SELECT s.seg AS c_mktsegment,
           CAST(s.n AS BIGINT) AS stratum_size,
           (s.sd / 100) AS stratum_sd,
           CAST(FLOOR(({_BUDGET} * s.n * s.sd / t.sns) + 0.5) AS BIGINT)
             AS neyman_n,
           CAST(FLOOR(({_BUDGET} * CAST(s.n AS DOUBLE) / t.nt) + 0.5) AS BIGINT)
             AS proportional_n,
           (s.n * s.sd / t.sns
                 - CAST(s.n AS DOUBLE) / t.nt) AS share_shift
    FROM strata s, tot t ORDER BY s.seg
    """,
    desc=f"Neyman allocation of a {_BUDGET}-row stratified sample of "
         "order value across market segments: optimal n_h = budget * "
         "N_h S_h / sum(N S), next to proportional allocation and "
         "the share shift — the survey-sampling design that "
         "minimizes the stratified mean's variance (high-variance "
         "segments get oversampled), i.e. the principled way to SET "
         "the rates q_stratified_sample then applies when sampling "
         "a corpus too big to scan twice. Per-stratum sds use exact "
         "decimal moments (sample sd, n-1); the N*S terms quantize "
         "the 1e-4 grid ->DECIMAL before the normalizing sum; "
         "allocations round on identical doubles.",
    tags=["stats", "join", "agg", "cross"],
)
def q_neyman_allocation(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        col("o_custkey") == col("c_custkey"),
    ).select(
        col("c_mktsegment").alias("seg"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
    )
    cd = col("cents").cast("decimal(38,0)")
    mom = vals.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(cd).cast("double").alias("s1"),
        F.sum(cd * col("cents")).cast("double").alias("s2"),
    )
    nd = col("n").cast("double")
    # try_divide: a 1-order stratum has no sample sd (n-1 = 0) and
    # drops out of the Neyman shares as NULL (SUM skips NULLs in both
    # engines), matching the oracle's x/0 = NULL
    sd = F.sqrt(F.try_divide(col("s2") - col("s1") * col("s1") / nd, nd - 1))
    strata = mom.select("seg", "n", sd.alias("sd"))
    tot = strata.agg(
        F.sum("n").alias("nt"),
        F.sum((dfloor((col("n") * col("sd")) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).cast("decimal(38,4)"))
        .cast("double").alias("sns"),
    )
    j = strata.crossJoin(broadcast(tot))
    return j.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("stratum_size"),
        (col("sd") / 100).alias("stratum_sd"),
        dfloor((F.try_divide(_BUDGET * col("n") * col("sd"), col("sns"))) + F.lit(0.5))
        .cast("long").alias("neyman_n"),
        dfloor((_BUDGET * col("n").cast("double") / col("nt")) + F.lit(0.5)).cast("long")
        .alias("proportional_n"),
        (F.try_divide(col("n") * col("sd"), col("sns"))
            - col("n").cast("double") / col("nt")).alias("share_shift"),
    ).orderBy("c_mktsegment")


@q(
    "q_mixture_gap",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n) AS nt, COUNT(*) AS k FROM counts
    ), terms AS (
      SELECT c.lang, c.n, t.nt, t.k,
             (1.0 / t.k) / (CAST(c.n AS DOUBLE) / t.nt) AS factor,
             CAST(FLOOR(((1.0 / t.k)
                        * LN((1.0 / t.k) / (CAST(c.n AS DOUBLE) / t.nt))) * 1e10 + 0.5) / 1e10
                  AS DECIMAL(28,10)) AS klt
      FROM counts c, tot t
    )
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           (CAST(n AS DOUBLE) / nt) AS current_share,
           (1.0 / k) AS target_share,
           (factor) AS resample_factor,
           (CAST(SUM(klt) OVER () AS DOUBLE)) AS kl_gap_total
    FROM terms ORDER BY lang
    """,
    desc="Corpus language-mixture gap: for a uniform language target, "
         "each language's current share, the resampling factor "
         "target/current that would reach it (factor > 1 = "
         "up-sample, < 1 = down-sample), and the total "
         "KL(target || corpus) gap — the objective corpus balancing "
         "minimizes, giving q_mix_resample its per-slice rates and "
         "q_mix_temperature a 'how far from balanced' scalar (gap 0 "
         "= balanced). Counts are exact integers, shares exact "
         "ratios, each KL term quantized the 1e-10 grid ->DECIMAL before "
         "the total (repeated per row over the tiny language "
         "table via a partition-free SUM OVER an already-collapsed "
         "5-row frame — bounded by the language count).",
    tags=["text", "stats", "agg", "cross", "window"],
)
def q_mixture_gap(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("nt"), F.count("*").alias("k"))
    j = counts.crossJoin(broadcast(tot))
    share = col("n").cast("double") / col("nt")
    target = 1.0 / col("k")
    klt = (dfloor((target * F.log(target / share)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")
    terms = j.select(
        "lang", "n", "nt", "k",
        share.alias("share"), target.alias("target"),
        (target / share).alias("factor"), klt.alias("klt"),
    )
    total = terms.agg(F.sum("klt").cast("double").alias("kl_gap"))
    return (
        terms.crossJoin(broadcast(total))
        .select(
            "lang",
            col("n").cast("long").alias("n_docs"),
            (col("share")).alias("current_share"),
            (col("target")).alias("target_share"),
            (col("factor")).alias("resample_factor"),
            (col("kl_gap")).alias("kl_gap_total"),
        )
        .orderBy("lang")
    )
