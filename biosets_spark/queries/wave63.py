"""Sixty-third-wave query inventory: corpus stylometry — BURROWS'
DELTA between sources (the authorship-attribution distance: z-score
the top-K token frequencies across sources, then mean |z_a - z_b| —
the standard stylometric measure for 'which sources write alike',
catching register/template kinship that q_vocab_stats' per-source
scalars and q_crosslingual_dup's doc-level pairs both miss) and the
RENYI ENTROPY SPECTRUM per source (H0 = ln richness, H1 = Shannon,
H2 = collision entropy: the three-point diversity profile whose
SLOPE says whether a source's vocabulary is head-heavy — H1-H2 large
— or uniformly spread, extending q_alpha_diversity's single-alpha
view to the spectrum).

Determinism discipline: token counts and per-source totals are exact
integers; relative frequencies are exact-ratio doubles; z-scores and
entropy terms are closed-form doubles quantized FLOOR((,8/) * 1e12 + 0.5) / 1e12->
DECIMAL before any cross-token sum; the top-K token set is ordered
(count DESC, token) so both engines pick the identical basis.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL
_TOP_K = 30


@q(
    "q_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ), src_tot AS (
      SELECT source, COUNT(*) AS ns FROM toks GROUP BY source
    ), topk AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
        ORDER BY c DESC, tok LIMIT {_TOP_K}
      )
    ), grid AS (
      SELECT s.source, s.ns, k.tok FROM src_tot s CROSS JOIN topk k
    ), freq AS (
      SELECT g.source, g.tok,
             CAST(FLOOR((CAST(COALESCE(c.c, 0) AS DOUBLE) / g.ns) * 1e10 + 0.5) / 1e10
                  AS DECIMAL(28,10)) AS f
      FROM grid g LEFT JOIN (
        SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
      ) c ON g.source = c.source AND g.tok = c.tok
    ), marg AS (
      SELECT tok, COUNT(*) AS k,
             CAST(SUM(f) AS DOUBLE) AS s1,
             CAST(SUM(CAST(FLOOR((CAST(f AS DOUBLE) * CAST(f AS DOUBLE)) * 1e14 + 0.5) / 1e14
                           AS DECIMAL(38,14))) AS DOUBLE) AS s2
      FROM freq GROUP BY tok
    ), zs AS (
      SELECT fr.source, fr.tok,
             (CAST(fr.f AS DOUBLE) - m.s1 / m.k)
             / SQRT(m.s2 / m.k - POWER(m.s1 / m.k, 2)) AS z
      FROM freq fr JOIN marg m ON fr.tok = m.tok
    ), deltas AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(SUM(CAST(FLOOR((ABS(a.z - b.z)) * 1e8 + 0.5) / 1e8 AS DECIMAL(18,8)))
                  AS DOUBLE) / COUNT(*) AS delta
      FROM zs a JOIN zs b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, (delta) AS delta
    FROM deltas ORDER BY delta, source_a, source_b LIMIT 10
    """,
    desc=f"Burrows' delta stylometric distance between sources over "
         f"the top-{_TOP_K} corpus tokens: per-source relative "
         "frequencies, z-scored per token across the source "
         "population (margins from exact DECIMAL moment sums of "
         "quantized frequencies, never streaming STDDEV), "
         "delta(a,b) = mean "
         "|z_a - z_b| — the authorship-attribution measure; the 10 "
         "lowest-delta pairs are the sources that write alike "
         "(template kinship q_vocab_stats' scalars can't see). The "
         "corpus collapses to a (source, token) count table; the "
         "token basis is deterministically ordered (count DESC, "
         "token); |z| differences quantize the 1e-8 grid ->DECIMAL before "
         "the per-pair sum; token margins come from a group-by over "
         f"the {_TOP_K}-token grid with a broadcast join back, no "
         "corpus-wide window. Source-pair join is bounded at "
         "C(n_sources,2) x K rows.",
    tags=["text", "stats", "join", "agg", "cross"],
)
def q_burrows_delta(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select("source", F.explode(tokens(col("text"))).alias("tok"))
    src_tot = toks.groupBy("source").agg(F.count("*").alias("ns"))
    topk = (
        toks.groupBy("tok").agg(F.count("*").alias("c"))
        .orderBy(col("c").desc(), "tok").limit(_TOP_K).select("tok")
    )
    stc = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    grid = src_tot.crossJoin(broadcast(topk))
    freq = grid.join(stc, ["source", "tok"], "left").select(
        "source", "tok",
        (dfloor((F.coalesce(col("c"), F.lit(0)).cast("double") / col("ns")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)").alias("f"),
    )
    # square in DOUBLE and quantize: a (28,10)x(28,10) decimal multiply
    # overflows precision 38 and the two engines truncate differently
    fd = col("f").cast("double")
    marg = freq.groupBy(col("tok").alias("tok_m")).agg(
        F.count("*").alias("k"),
        F.sum("f").cast("double").alias("s1"),
        F.sum((dfloor((fd * fd) * F.lit(1e14) + F.lit(0.5)) / F.lit(1e14)).cast("decimal(38,14)"))
        .cast("double").alias("s2"),
    )
    mu = col("s1") / col("k")
    sigma = F.sqrt(col("s2") / col("k") - F.pow(mu, 2))
    zs = freq.join(broadcast(marg), col("tok") == col("tok_m")).select(
        "source", "tok",
        ((col("f").cast("double") - mu) / sigma).alias("z"),
    )
    a, b = zs.alias("a"), zs.alias("b")
    deltas = (
        a.join(
            b,
            (col("a.tok") == col("b.tok"))
            & (col("a.source") < col("b.source")),
        )
        .groupBy(
            col("a.source").alias("source_a"),
            col("b.source").alias("source_b"),
        )
        .agg(
            # COUNT(*) over the joined top-k tokens, not the _TOP_K
            # literal: on inputs with fewer than _TOP_K distinct tokens
            # the mean-|Δz| denominator reflects the true marker count
            # in BOTH engines (same class as the r5 q_hill_tail ADVICE)
            (
                F.sum(
                    (dfloor((F.abs(col("a.z") - col("b.z"))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8))
                    .cast("decimal(18,8)")
                ).cast("double") / F.count("*")
            ).alias("delta")
        )
    )
    return (
        deltas.select("source_a", "source_b", col("delta").alias("delta"))
        .orderBy("delta", "source_a", "source_b")
        .limit(10)
    )


@q(
    "q_renyi_spectrum",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ), stc AS (
      SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), tot AS (
      SELECT source, SUM(c) AS ns, COUNT(*) AS v FROM stc GROUP BY source
    ), terms AS (
      SELECT s.source, t.ns, t.v,
             CAST(FLOOR((-(CAST(s.c AS DOUBLE) / t.ns)
                        * LN(CAST(s.c AS DOUBLE) / t.ns)) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(38,12)) AS h1t,
             CAST(FLOOR((POWER(CAST(s.c AS DOUBLE) / t.ns, 2)) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(38,12)) AS p2t
      FROM stc s JOIN tot t ON s.source = t.source
    )
    SELECT source,
           CAST(MAX(v) AS BIGINT) AS richness,
           (LN(MAX(v))) AS h0,
           (CAST(SUM(h1t) AS DOUBLE)) AS h1_shannon,
           (-LN(CAST(SUM(p2t) AS DOUBLE))) AS h2_collision,
           (CAST(SUM(h1t) AS DOUBLE) / LN(MAX(v))) AS evenness,
           (CAST(SUM(h1t) AS DOUBLE)
                 - (-LN(CAST(SUM(p2t) AS DOUBLE)))) AS head_heaviness
    FROM terms GROUP BY source ORDER BY source
    """,
    desc="Renyi entropy spectrum of each source's token distribution: "
         "H0 = ln(richness), H1 = Shannon, H2 = -ln(sum p^2) "
         "(collision entropy), with evenness H1/H0 and head-heaviness "
         "H1 - H2 — the spectrum's downward slope quantifies how "
         "much of a source's diversity lives in its head (H1-H2 "
         "large = a few dominant tokens carry the mass; 0 = uniform) "
         "— the multi-alpha extension of q_alpha_diversity and the "
         "per-source refinement of q_text_entropy's per-doc scalar. "
         "Token probabilities are exact-ratio doubles; both the "
         "-p ln p and p^2 terms quantize the 1e-12 grid ->DECIMAL(38,12) "
         "before their per-source sums, so no accumulation order "
         "exists. The corpus collapses to (source, token) counts; "
         "everything downstream runs on the vocabulary table.",
    tags=["text", "stats", "agg"],
)
def q_renyi_spectrum(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("source", "text")
    stc = (
        docs.select("source", F.explode(tokens(col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = stc.groupBy(col("source").alias("src_t")).agg(
        F.sum("c").alias("ns"), F.count("*").alias("v")
    )
    p = col("c").cast("double") / col("ns")
    terms = stc.join(broadcast(tot), col("source") == col("src_t")).select(
        "source", "v",
        (dfloor((-p * F.log(p)) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("h1t"),
        (dfloor((F.pow(p, 2)) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("p2t"),
    )
    h1 = F.sum("h1t").cast("double")
    h2 = -F.log(F.sum("p2t").cast("double"))
    return (
        terms.groupBy("source")
        .agg(
            F.max("v").cast("long").alias("richness"),
            (F.log(F.max("v"))).alias("h0"),
            (h1).alias("h1_shannon"),
            (h2).alias("h2_collision"),
            (h1 / F.log(F.max("v"))).alias("evenness"),
            (h1 - h2).alias("head_heaviness"),
        )
        .orderBy("source")
    )
