"""Sixty-ninth-wave query inventory: distributional lexicon — the
SKIP-GRAM WINDOW PMI (pointwise mutual information of ordered token
pairs within a +-2 position window: the word2vec/GloVe co-occurrence
statistic, strictly tighter than q_token_pmi's whole-document
co-occurrence — collocations like 'hash join' only surface at window
granularity — and directional where q_bigram_surprise's adjacent LM
only scores position +1) and the CHARACTER-TRIGRAM LANGUAGE PROFILE
(each language's top character 3-grams with corpus shares: the
classic langid fingerprint table that explains WHAT q_text_langid's
heuristic keys on, and the drift monitor for mixed-language
contamination inside a declared-language slice).

Determinism discipline: all pair/trigram counts are exact integers;
PMI and shares are single closed-form doubles over exact counts;
every ranking orders by (count or value, then the string) so ties
are deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL
_MIN_PAIR = 50


@q(
    "q_skipgram_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), posed AS (
      SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS p
      FROM toks
    ), pairs AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS cp
      FROM posed a JOIN posed b
        ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2
      GROUP BY 1, 2
    ), uni AS (
      SELECT w, COUNT(*) AS c FROM posed GROUP BY w
    ), tot AS (
      SELECT SUM(cp) AS tp FROM pairs
    )
    SELECT p.w1, p.w2, CAST(p.cp AS BIGINT) AS pair_count,
           (LN(CAST(p.cp AS DOUBLE) * t.tp
                    / (CAST(u1.c AS DOUBLE) * 2 * u2.c))) AS pmi
    FROM pairs p
    JOIN uni u1 ON p.w1 = u1.w
    JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN tot t
    WHERE p.cp >= {_MIN_PAIR}
    ORDER BY LN(CAST(p.cp AS DOUBLE) * t.tp
                / (CAST(u1.c AS DOUBLE) * 2 * u2.c)) DESC, p.w1, p.w2
    LIMIT 20
    """,
    desc="Skip-gram window PMI: ordered token pairs co-occurring "
         "within a +-2 position window (the word2vec-style "
         "co-occurrence), PMI = ln(c_pair * T / (c_w1 * 2 * c_w2)) "
         "with the window-width factor in the null model, top-20 "
         f"collocations at pair support >= {_MIN_PAIR} — window-"
         "granular where q_token_pmi counts whole-document "
         "co-occurrence and directional where q_bigram_surprise "
         "scores only position +1. Window pairs are built per-row "
         "via zip_with over array slices at distances 1 and 2 — "
         "fan-out exactly 2 per token, no explode-side self-join, "
         "the token table never enters an exchange; counts "
         "are exact integers, PMI one closed form, ordering "
         "tie-broken by the pair strings.",
    tags=["text", "stats", "join", "agg", "cross", "range"],
)
def q_skipgram_pmi(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    # Window pairs per-row: for each distance d in {1, 2}, zip_with
    # over two slices of the token array builds exactly the (t[i],
    # t[i+d]) pairs the old positional self-join produced — but with
    # zero joins: the token table is never exploded into an exchange,
    # only (w1, w2) pairs shuffle (and the old form built the
    # self-join TWICE, once for pair counts and once for the total).
    # Tokenize in a separate projection: CollapseProject duplicates
    # only cheap expressions, so the regex split runs once per row
    # instead of once per slice reference (measured ~2x at sf0.1).
    tokd = docs.select(tokens(col("text")).alias("_t"))
    tk = col("_t")
    n = F.size(tk)

    def pairs_at(d):
        return F.when(
            n >= d + 1,
            F.zip_with(
                F.slice(tk, F.lit(1), n - d),
                F.slice(tk, F.lit(1 + d), n - d),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    pair_rows = tokd.select(
        F.explode(F.concat(pairs_at(1), pairs_at(2))).alias("_p"))
    bg_all = pair_rows.groupBy(
        col("_p.w1").alias("w1"), col("_p.w2").alias("w2")
    ).agg(F.count("*").alias("cp"))
    pairs = bg_all.filter(col("cp") >= _MIN_PAIR)
    uni = tokd.select(F.explode(tk).alias("w")).groupBy("w").agg(
        F.count("*").alias("c"))
    # T = total window pairs: SUM over the same unfiltered pair-count
    # table (identical integer to the old second self-join's COUNT(*);
    # the shared grouped subtree re-uses one exchange)
    all_pairs_total = bg_all.agg(F.sum("cp").alias("tp"))
    u1 = uni.select(col("w").alias("w1"), col("c").alias("c1"))
    u2 = uni.select(col("w").alias("w2"), col("c").alias("c2"))
    pmi = F.log(
        col("cp").cast("double") * col("tp")
        / (col("c1").cast("double") * 2 * col("c2"))
    )
    return (
        pairs.join(broadcast(u1), "w1")
        .join(broadcast(u2), "w2")
        .crossJoin(broadcast(all_pairs_total))
        .select(
            "w1", "w2",
            col("cp").cast("long").alias("pair_count"),
            (pmi).alias("pmi"),
            pmi.alias("_p"),
        )
        .orderBy(col("_p").desc(), "w1", "w2")
        .limit(20)
        .drop("_p")
    )


@q(
    "q_char_trigram_profile",
    oracle="""
    WITH chars AS (
      SELECT lang, LOWER(text) AS t FROM documents
    ), tris AS (
      SELECT lang, SUBSTRING(t, i, 3) AS tri
      FROM chars, LATERAL (
        SELECT unnest(range(1, LENGTH(t) - 1)) AS i
      )
      WHERE LENGTH(t) >= 3
    ), counts AS (
      SELECT lang, tri, COUNT(*) AS c FROM tris GROUP BY lang, tri
    ), tot AS (
      SELECT lang, SUM(c) AS nt FROM counts GROUP BY lang
    ), ranked AS (
      SELECT c.lang, c.tri, c.c, t.nt,
             ROW_NUMBER() OVER (PARTITION BY c.lang
                                ORDER BY c.c DESC, c.tri) AS rnk
      FROM counts c JOIN tot t ON c.lang = t.lang
    )
    SELECT lang, CAST(rnk AS INTEGER) AS rnk, tri,
           CAST(c AS BIGINT) AS n_occurrences,
           (CAST(c AS DOUBLE) / nt) AS share
    FROM ranked WHERE rnk <= 5 ORDER BY lang, rnk
    """,
    desc="Character-trigram language fingerprint: each language's 5 "
         "most frequent character 3-grams (lowercased, overlapping) "
         "with their corpus shares — the classic langid feature "
         "table: it shows WHAT q_text_langid's n-gram heuristic "
         "keys on per language, and a drifting profile inside one "
         "declared-language slice flags mixed-language "
         "contamination. The sliding 3-gram explode fans out "
         "len-2 rows per doc (linear, the shingle mechanism); "
         "counts collapse combinably; the rank window partitions "
         "by LANGUAGE over the already-tiny per-lang count table "
         "with (count DESC, trigram) tie-breaks; shares are exact "
         "integer ratios.",
    tags=["text", "window", "agg"],
)
def q_char_trigram_profile(spark, sf_dir):
    from pyspark.sql import Window

    docs = tables.load(spark, sf_dir, "documents").select(
        "lang", F.lower(col("text")).alias("t")
    )
    tris = (
        docs.filter(F.length("t") >= 3)
        .select(
            "lang",
            F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"),
            "t",
        )
        .select("lang", F.expr("substring(t, i, 3)").alias("tri"))
    )
    counts = tris.groupBy("lang", "tri").agg(F.count("*").alias("c"))
    tot = counts.groupBy(col("lang").alias("lg")).agg(F.sum("c").alias("nt"))
    w = Window.partitionBy("lang").orderBy(col("c").desc(), "tri")
    ranked = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(col("rnk") <= 5)
        .join(broadcast(tot), col("lang") == col("lg"))
    )
    return ranked.select(
        "lang",
        col("rnk").cast("int").alias("rnk"),
        "tri",
        col("c").cast("long").alias("n_occurrences"),
        (col("c").cast("double") / col("nt")).alias("share"),
    ).orderBy("lang", "rnk")
