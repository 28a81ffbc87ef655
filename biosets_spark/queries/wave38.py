"""Thirty-eighth-wave query inventory: storage-layout and text
analytics — a Z-order (Morton-curve) clustering audit (the
multi-dimensional layout check behind Delta/Iceberg Z-ORDER writes:
does interleaved-bit bucketing actually bound BOTH dimensions' ranges
per file?) and a Flesch-style readability panel (the prose-complexity
score content pipelines track per language).

Determinism discipline (queries.py header): the Morton code is pure
integer bit arithmetic (identical on both engines); syllable/sentence
counts come from length deltas of regexp_replace with shared RE2/Java
character classes; per-document scores quantize to DECIMAL(18,6) via
an explicit ROUND before the exact decimal average (ADVICE r3: round
first so the rounding rule is shared, not cast behavior).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import dfloor, q

_EPOCH = "2023-01-01"
_BITS = 4  # 4 bits per dimension -> 8-bit Morton code


def _morton_sql(u: str, d: str) -> str:
    """Portable SQL for an 8-bit Morton interleave of two 4-bit ints."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({u} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({d} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@q(
    "q_zorder_layout",
    oracle=f"""
    WITH dims AS (
      SELECT user_id % 16 AS u,
             date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) % 16 AS d
      FROM events
    ), coded AS (
      SELECT u, d, ({_morton_sql('u', 'd')}) >> 4 AS bucket FROM dims
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(u) AS BIGINT) AS u_min, CAST(MAX(u) AS BIGINT) AS u_max,
           CAST(MIN(d) AS BIGINT) AS d_min, CAST(MAX(d) AS BIGINT) AS d_max,
           CAST(MAX(u) - MIN(u) AS BIGINT) AS u_span,
           CAST(MAX(d) - MIN(d) AS BIGINT) AS d_span
    FROM coded GROUP BY bucket ORDER BY bucket
    """,
    desc="Z-order (Morton-curve) clustering audit over events: "
         "interleave the bits of (user_id mod 16, day mod 16) into an "
         "8-bit Morton code, bucket by its top 4 bits (16 'files') "
         "and report each bucket's per-dimension min/max spans — the "
         "check that a Z-ORDERed write actually bounds BOTH "
         "dimensions per file (every bucket's u_span and d_span are "
         "<= 3 for a 16-cell Morton grid, vs 15 for a single-key "
         "sort on the other dimension), which is exactly what lets "
         "parquet min/max row-group stats skip files for predicates "
         "on EITHER column. Pure integer bit arithmetic, one "
         "combinable 16-group agg — scan speed at any scale; at "
         "100 TB the same code is the sort key of the clustered "
         "write (sort_files by morton, as in sources/sink.py's "
         "range-clustered writes).",
    tags=["layout", "events", "agg"],
)
def q_zorder_layout(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    dims = ev.select(
        F.pmod(col("user_id"), F.lit(16)).alias("u"),
        F.pmod(
            F.datediff(col("ts").cast("date"), F.lit(_EPOCH).cast("date")),
            F.lit(16),
        ).alias("d"),
    )
    coded = dims.select(
        "u", "d", F.expr(f"({_morton_sql('u', 'd')}) >> 4").alias("bucket")
    )
    return (
        coded.groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("u").cast("long").alias("u_min"),
            F.max("u").cast("long").alias("u_max"),
            F.min("d").cast("long").alias("d_min"),
            F.max("d").cast("long").alias("d_max"),
            (F.max("u") - F.min("u")).cast("long").alias("u_span"),
            (F.max("d") - F.min("d")).cast("long").alias("d_span"),
        )
        .withColumn("n_events", col("n_events").cast("long"))
        .orderBy("bucket")
    )


# vowel-group / sentence-boundary collapse: replacing each run with one
# marker and diffing lengths counts runs — same trick on both engines,
# shared character classes (no \s shorthand, per ADVICE r3)
_VOWELS = "[aeiouyAEIOUY]+"
_SENTS = "[.!?]+"
from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_readability",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             GREATEST(len({_TOKS_SQL}), 1) AS words,
             GREATEST(length(regexp_replace(text, '{_SENTS}', '.', 'g'))
                      - length(regexp_replace(text, '{_SENTS}', '', 'g')), 1)
               AS sents,
             GREATEST(length(regexp_replace(text, '{_VOWELS}', 'V', 'g'))
                      - length(regexp_replace(text, '{_VOWELS}', '', 'g')), 1)
               AS sylls
      FROM documents
    ), scored AS (
      SELECT lang, words, sents, sylls,
             CAST(FLOOR((206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                        - 84.6 * (CAST(sylls AS DOUBLE) / words)) * 1e6 + 0.5) / 1e6
                  AS DECIMAL(18,6)) AS flesch
      FROM per_doc
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           (CAST(SUM(words) AS DOUBLE) / SUM(sents))
             AS words_per_sentence,
           (CAST(SUM(sylls) AS DOUBLE) / SUM(words))
             AS syllables_per_word,
           (CAST(SUM(flesch) AS DOUBLE) / COUNT(*)) AS mean_flesch
    FROM scored GROUP BY lang ORDER BY lang
    """,
    desc="Flesch-style readability panel per language: words per "
         "sentence, syllables per word (vowel-group heuristic), and "
         "the mean per-document Flesch reading-ease score — the "
         "prose-complexity signal content/education pipelines gate "
         "on (junk machine text scores far off the 0-100 band). Runs "
         "and sentence boundaries are counted by the collapse-and-"
         "diff regexp trick (replace each run with one marker, diff "
         "lengths) with explicit shared character classes; per-doc "
         "scores are identical closed-form doubles on both engines, "
         "quantized ROUND-then-DECIMAL(18,6) so the corpus average "
         "is an exact decimal ratio. Pure expressions + one "
         "combinable agg: scan speed at any scale.",
    tags=["text", "agg"],
)
def q_readability(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("lang", "text")
    n_runs = lambda pat, mark: (  # noqa: E731
        F.length(F.regexp_replace(col("text"), pat, mark))
        - F.length(F.regexp_replace(col("text"), pat, ""))
    )
    per_doc = docs.select(
        "lang",
        F.greatest(F.size(tokens(col("text"))), F.lit(1)).alias("words"),
        F.greatest(n_runs(_SENTS, "."), F.lit(1)).alias("sents"),
        F.greatest(n_runs(_VOWELS, "V"), F.lit(1)).alias("sylls"),
    )
    flesch = (dfloor((206.835
        - 1.015 * (col("words").cast("double") / col("sents"))
        - 84.6 * (col("sylls").cast("double") / col("words"))) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(18,6)")
    scored = per_doc.withColumn("flesch", flesch)
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("words").cast("double") / F.sum("sents")).alias("words_per_sentence"),
            (F.sum("sylls").cast("double") / F.sum("words")).alias("syllables_per_word"),
            (F.sum("flesch").cast("double") / F.count("*")).alias("mean_flesch"),
        )
        .withColumn("n_docs", col("n_docs").cast("long"))
        .orderBy("lang")
    )
