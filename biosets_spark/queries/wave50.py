"""Fiftieth-wave query inventory: corpus-scaling laws — the HEAPS'
LAW vocabulary-growth curve with its fitted exponent (how fast does
vocabulary grow as the corpus doubles? the number that sizes
tokenizer vocabularies and predicts what another crawl buys,
complementing q_good_turing's one-point unseen-mass estimate with the
whole curve) and Church-Gale WORD ADAPTATION (P(word repeats in a doc
| it appears at all) vs its document frequency — content words adapt
far above chance, function words don't; the burstiness signal behind
every TF saturation term, q_burstiness' lexical twin).

Determinism discipline: the document order behind the growth curve is
the engine-portable md5 hash (so 'corpus prefixes' are identical on
both engines and carry no crawl-order bias); the 10-point cumulative
curve is built by a range self-join over the 10-row bucket table
(tagged range — no empty-partition window); OLS terms over the 10
log-log points quantize the 1e-12 grid ->DECIMAL before summing.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL
_GATE = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10"


@q(
    "q_heaps_law",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_GATE} AS bkt, unnest({_TOKS_SQL}) AS tok
      FROM documents
    ), first_bkt AS (
      SELECT tok, MIN(bkt) AS fb FROM toks GROUP BY tok
    ), new_types AS (
      SELECT fb AS bkt, COUNT(*) AS n_new FROM first_bkt GROUP BY fb
    ), docs_per AS (
      SELECT {_GATE} AS bkt, COUNT(*) AS n_docs FROM documents GROUP BY 1
    ), curve AS (
      SELECT d.bkt,
             SUM(d2.n_docs) AS cum_docs,
             COALESCE((SELECT SUM(n_new) FROM new_types nt
                       WHERE nt.bkt <= d.bkt), 0) AS cum_vocab
      FROM docs_per d JOIN docs_per d2 ON d2.bkt <= d.bkt
      GROUP BY d.bkt
    ), pts AS (
      SELECT bkt, cum_docs, cum_vocab,
             CAST(FLOOR((LN(CAST(cum_docs AS DOUBLE))) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(18,12)) AS lx,
             CAST(FLOOR((LN(CAST(cum_vocab AS DOUBLE))) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(18,12)) AS ly
      FROM curve
    ), fit AS (
      SELECT CAST(COUNT(*) AS DECIMAL(4,0)) AS n,
             CAST(SUM(lx) AS DECIMAL(17,12)) AS sx,
             CAST(SUM(ly) AS DECIMAL(17,12)) AS sy,
             CAST(SUM(lx * lx) AS DECIMAL(30,24)) AS sxx,
             CAST(SUM(lx * ly) AS DECIMAL(30,24)) AS sxy
      FROM pts
    )
    SELECT p.bkt AS checkpoint, CAST(p.cum_docs AS BIGINT) AS cum_docs,
           CAST(p.cum_vocab AS BIGINT) AS cum_vocab,
           (CAST(f.n * f.sxy - f.sx * f.sy AS DOUBLE)
                 / CAST(f.n * f.sxx - f.sx * f.sx AS DOUBLE)) AS heaps_beta
    FROM pts p, fit f ORDER BY p.bkt
    """,
    desc="Heaps'-law vocabulary growth: documents fall into 10 "
         "md5-hash buckets (engine-portable, crawl-order-free), each "
         "checkpoint k reports the cumulative docs and cumulative "
         "distinct vocabulary of buckets 0..k (computed from each "
         "type's MIN first-bucket — one agg over the vocabulary, no "
         "10x re-scan), and the fitted log-log slope is the Heaps "
         "exponent beta (V ~ N^beta, typically 0.4-0.6 for natural "
         "text; the synthetic corpus's tiny closed vocabulary yields "
         "beta ~ 0 past the first checkpoint — exactly what the "
         "curve is FOR detecting: a closed vocabulary means more "
         "crawling buys no new types). The 10-row cumulative curve "
         "is a range self-join on the bucket table (tagged range); "
         "OLS terms quantize the 1e-12 grid ->DECIMAL; the 1-row fit "
         "broadcasts back (tagged cross).",
    tags=["text", "agg", "range", "cross"],
)
def q_heaps_law(spark, sf_dir):
    from ..operators.dedup import portable_hash60
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    gate = F.pmod(portable_hash60(col("doc_id").cast("string")), lit(10))
    toks = docs.select(
        gate.alias("bkt"), F.explode(tokens(col("text"))).alias("tok")
    )
    first_bkt = toks.groupBy("tok").agg(F.min("bkt").alias("fb"))
    new_types = first_bkt.groupBy(col("fb").alias("bkt")).agg(
        F.count("*").alias("n_new")
    )
    docs_per = docs.select(gate.alias("bkt")).groupBy("bkt").agg(
        F.count("*").alias("n_docs")
    )
    d2 = docs_per.select(col("bkt").alias("b2"), col("n_docs").alias("nd2"))
    nt2 = new_types.select(col("bkt").alias("b3"), "n_new")
    curve = (
        docs_per.join(broadcast(d2), col("b2") <= col("bkt"))
        .groupBy("bkt")
        .agg(F.sum("nd2").alias("cum_docs"))
        .join(
            broadcast(nt2), col("b3") <= col("bkt"), "left"
        )
        .groupBy("bkt", "cum_docs")
        .agg(F.coalesce(F.sum("n_new"), lit(0)).alias("cum_vocab"))
    )
    pts = curve.select(
        "bkt", "cum_docs", "cum_vocab",
        (dfloor((F.log(col("cum_docs").cast("double"))) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12))
        .cast("decimal(18,12)").alias("lx"),
        (dfloor((F.log(col("cum_vocab").cast("double"))) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12))
        .cast("decimal(18,12)").alias("ly"),
    )
    # r9: the OLS numerator is a catastrophic cancellation — keep it
    # EXACT in decimal and cast only the difference to double (the
    # engines' decimal->double casts can differ by 1 ulp, which the
    # cancellation amplified to a visible residue on a flat curve)
    fit = pts.agg(
        F.count("*").cast("decimal(4,0)").alias("n"),
        F.sum("lx").cast("decimal(17,12)").alias("sx"),
        F.sum("ly").cast("decimal(17,12)").alias("sy"),
        F.sum(col("lx") * col("lx")).cast("decimal(30,24)").alias("sxx"),
        F.sum(col("lx") * col("ly")).cast("decimal(30,24)").alias("sxy"),
    )
    return (
        pts.crossJoin(broadcast(fit))
        .select(
            col("bkt").alias("checkpoint"),
            col("cum_docs").cast("long").alias("cum_docs"),
            col("cum_vocab").cast("long").alias("cum_vocab"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                / (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")).alias("heaps_beta"),
        )
        .orderBy("checkpoint")
    )


@q(
    "q_word_adaptation",
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ), stats AS (
      SELECT tok, SUM(c) AS cf, COUNT(*) AS df,
             COUNT(*) FILTER (WHERE c >= 2) AS df2
      FROM dt GROUP BY tok
    ), tot AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT tok, CAST(cf AS BIGINT) AS corpus_freq,
           CAST(df AS BIGINT) AS doc_freq,
           (CAST(df2 AS DOUBLE) / df) AS adaptation,
           ((CAST(df2 AS DOUBLE) / df)
                 / (CAST(df AS DOUBLE) / n_docs)) AS adaptation_lift
    FROM stats, tot
    ORDER BY cf DESC, tok LIMIT 20
    """,
    desc="Church-Gale word adaptation for the top-20 corpus tokens: "
         "P(a word occurs AGAIN in a doc | it occurs at all) = "
         "df2/df, and its lift over the independence baseline df/N — "
         "content words adapt far above chance (seeing one "
         "occurrence predicts more), function words sit near their "
         "base rate; the lexical burstiness behind BM25's TF "
         "saturation (q_bm25_topk) and the doc-frequency intuition "
         "of q_term_doc_freq. One (doc, token) count agg, then a "
         "vocabulary-sized reduce; the 1-row doc count broadcasts "
         "(tagged cross); TakeOrdered top-20 with full tie-break.",
    tags=["text", "agg", "cross"],
)
def q_word_adaptation(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    dt = (
        docs.select("doc_id", F.explode(tokens(col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    stats = dt.groupBy("tok").agg(
        F.sum("c").alias("cf"),
        F.count("*").alias("df"),
        F.count(F.when(col("c") >= 2, 1)).alias("df2"),
    )
    tot = docs.agg(F.count("*").alias("n_docs"))
    return (
        stats.crossJoin(broadcast(tot))
        .select(
            "tok",
            col("cf").cast("long").alias("corpus_freq"),
            col("df").cast("long").alias("doc_freq"),
            (col("df2").cast("double") / col("df"))
            .alias("adaptation"),
            ((col("df2").cast("double") / col("df"))
                / (col("df").cast("double") / col("n_docs"))).alias("adaptation_lift"),
        )
        .orderBy(col("corpus_freq").desc(), "tok")
        .limit(20)
    )
