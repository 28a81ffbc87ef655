"""Fifth-wave query inventory: Gopher-style quality gates, repetition
filters, character entropy, PII redaction, and BM25 retrieval — the
remaining text-pipeline surface a 100 TB corpus build runs between
ingest and dedup.

Determinism notes (module pattern from queries.py): ratio outputs are
rounded at 4 decimals only where the underlying value is an irrational
float (entropy, BM25, mean lengths); integer counts pass through
exact. The PII query synthesizes deterministic PII from doc_id in BOTH
engines, since the test corpus contains none naturally — the regex
machinery is what's differentially verified.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from ..operators import pii as PII
from ..operators import text as TX
from . import q

# ---------------------------------------------------------------------
# Gopher-style quality gates
# ---------------------------------------------------------------------


@q(
    "q_quality_gopher",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') toks FROM documents
    ),
    g AS (
      SELECT lang,
             len(toks) AS n_words,
             list_sum(list_transform(toks, w -> len(w))) * 1.0 / greatest(len(toks), 1) AS mwl,
             len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) AS dr,
             len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
               / greatest(len(toks), 1) AS af
      FROM t
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (n_words BETWEEN 30 AND 100000) AS pass_word_count,
           COUNT(*) FILTER (mwl BETWEEN 3.0 AND 10.0) AS pass_word_len,
           COUNT(*) FILTER (dr >= 0.4) AS pass_distinct,
           COUNT(*) FILTER (af >= 0.8) AS pass_alpha,
           COUNT(*) FILTER (n_words BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
                            AND dr >= 0.4 AND af >= 0.8) AS n_keep
    FROM g GROUP BY lang
    """,
    desc="Gopher-rule quality gates (word-count bounds, mean word "
         "length, distinct-word ratio, alphabetic-word fraction) as "
         "pure Catalyst expressions; per-language pass counts.",
    tags=["text", "quality"],
)
def q_quality_gopher(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    g = TX.gopher_rules(docs)
    return g.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_if(col("rule_word_count")).alias("pass_word_count"),
        F.count_if(col("rule_word_len")).alias("pass_word_len"),
        F.count_if(col("rule_distinct")).alias("pass_distinct"),
        F.count_if(col("rule_alpha")).alias("pass_alpha"),
        F.count_if(col("gopher_keep")).alias("n_keep"),
    )


@q(
    "q_text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') toks FROM documents
    ),
    bg AS (
      SELECT doc_id, len(toks) AS n_toks, len(list_distinct(toks)) AS n_distinct,
             unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b
      FROM t
    ),
    cnt AS (SELECT doc_id, n_toks, n_distinct, b, COUNT(*) n FROM bg GROUP BY 1, 2, 3, 4),
    agg AS (
      SELECT doc_id,
             MAX(n) * 1.0 / SUM(n) AS top_frac,
             ANY_VALUE(n_distinct) * 1.0 / ANY_VALUE(n_toks) AS dr
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, (top_frac) AS top_bigram_frac,
           (dr) AS distinct_token_ratio
    FROM agg WHERE top_frac >= 0.08
    """,
    desc="repetition filter (Gopher A1.1 style): documents whose most "
         "frequent bigram covers >= 8% of all bigrams; explode + two "
         "map-side-combinable aggregates, no per-row quadratic scan.",
    tags=["text", "quality", "dedup"],
)
def q_text_repetition(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    r = TX.repetition_stats(docs)
    return r.filter(col("top_bigram_frac") >= 0.08).select(
        "doc_id",
        col("top_bigram_frac").alias("top_bigram_frac"),
        col("distinct_token_ratio").alias("distinct_token_ratio"),
    )


@q(
    "q_text_entropy",
    # per-lang AVG of per-doc entropies: both engines sum ~25 doubles
    # per group; values are irrational (ln of rationals), so a rounded
    # comparison at 4 decimals is ulp-safe in practice (documented
    # module-level determinism note).
    oracle="""
    WITH ch AS (SELECT doc_id, lang, unnest(string_split(text, '')) c FROM documents),
    cnt AS (SELECT doc_id, lang, c, COUNT(*) n FROM ch GROUP BY 1, 2, 3),
    tot AS (SELECT doc_id, SUM(n) tn FROM cnt GROUP BY 1),
    e AS (
      SELECT cnt.doc_id, ANY_VALUE(cnt.lang) lang,
             -SUM((n * 1.0 / tn) * ln(n * 1.0 / tn)) ent
      FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id
    )
    SELECT lang, COUNT(*) AS n_docs,
           (AVG(ent)) AS avg_entropy,
           COUNT(*) FILTER (ent < 2.7) AS n_low_entropy
    FROM e GROUP BY lang
    """,
    desc="character-level Shannon entropy per document (CCNet-style "
         "gibberish gate), aggregated per language; explode chars + "
         "partial-combining counts, never a per-row expression scan.",
    tags=["text", "quality"],
)
def q_text_entropy(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    ent = TX.char_entropy(docs, carry_cols=["lang"])
    return ent.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.avg("entropy")).alias("avg_entropy"),
        F.count_if(col("entropy") < 2.7).alias("n_low_entropy"),
    )


# ---------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------


@q(
    "q_pii_redact",
    # The corpus has no natural PII, so both engines append the SAME
    # deterministic doc_id-derived PII before redacting — the regex
    # detect/replace machinery is the verified subject.
    oracle="""
    WITH seeded AS (
      SELECT doc_id, source,
             text || ' contact user' || doc_id || '@mail.example.com from 10.0.' ||
             (doc_id % 256) || '.7 call +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
             || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    ),
    red AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
             len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ip,
             len(regexp_extract_all(text, '(\\+\\d{1,2} )?\\d{3}[- ]\\d{3}[- ]\\d{4}')) AS n_phone,
             len(text) - len(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                 '(\\+\\d{1,2} )?\\d{3}[- ]\\d{3}[- ]\\d{4}', '<PHONE>', 'g')
             ) AS chars_removed
      FROM seeded
    )
    SELECT source,
           CAST(SUM(n_email) AS BIGINT) AS total_email,
           CAST(SUM(n_ip) AS BIGINT) AS total_ip,
           CAST(SUM(n_phone) AS BIGINT) AS total_phone,
           CAST(SUM(chars_removed) AS BIGINT) AS total_chars_removed
    FROM red GROUP BY source
    """,
    desc="PII scrub audit: regex redaction of emails / IPv4s / phone "
         "numbers (JVM regexp_count + regexp_replace, RE2-portable "
         "patterns) over deterministically seeded text; per-source "
         "match and removed-char totals.",
    tags=["text", "pii"],
)
def q_pii_redact(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        "source",
        F.concat(
            col("text"), lit(" contact user"), col("doc_id"), lit("@mail.example.com from 10.0."),
            (col("doc_id") % 256), lit(".7 call +1 555-"),
            F.lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            F.lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    red = PII.redact_pii(seeded)
    return red.groupBy("source").agg(
        F.sum("n_email").alias("total_email"),
        F.sum("n_ip").alias("total_ip"),
        F.sum("n_phone").alias("total_phone"),
        F.sum("pii_chars_removed").alias("total_chars_removed"),
    )


# ---------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------

_BM25_TERMS = ["table", "scan", "merge", "join", "hash"]


@q(
    "q_bm25_topk",
    oracle=f"""
    WITH params AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT AVG(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'))) FROM documents) AS avgdl
    ),
    toks AS (
      SELECT doc_id, len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS dl,
             unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS t
      FROM documents
    ),
    tf AS (
      SELECT doc_id, dl, t, COUNT(*) AS tf FROM toks
      WHERE t IN ({", ".join(repr(t) for t in _BM25_TERMS)})
      GROUP BY 1, 2, 3
    ),
    df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             SUM( ln((n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                  * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * tf.dl / avgdl)) ) AS score
      FROM tf JOIN df USING (t) CROSS JOIN params
      GROUP BY tf.doc_id
    )
    SELECT doc_id, (score) AS bm25
    FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """,
    desc="BM25 top-10 for a fixed query term set (k1=1.5, b=0.75): "
         "postings filtered to query terms BEFORE the tf aggregate so "
         "only matching tokens shuffle; df table broadcast back.",
    tags=["text", "retrieval"],
)
def q_bm25_topk(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    scored = TX.bm25_scores(docs, _BM25_TERMS)
    return (
        scored.orderBy(col("bm25").desc(), col("doc_id"))
        .limit(10)
        .select("doc_id", col("bm25").alias("bm25"))
    )
