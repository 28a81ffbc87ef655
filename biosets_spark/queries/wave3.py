"""Third-wave query inventory: language ID (with a full SQL mirror of
the stopword-vote heuristic), quality scoring, BPE tokens, window
first/last/lead, sliding event windows, grouped-map Pandas UDF,
approx-distinct.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from ..operators import text as TX
from . import q

# ---------------------------------------------------------------------
# language ID: the DuckDB oracle mirrors the Spark expression tree
# (per-language stopword-hit fraction, argmax with lexicographically-
# greatest language winning ties, 'und' when no stopword hits)
# ---------------------------------------------------------------------

def _lang_scores_sql() -> str:
    score_cols = []
    for lang, ws in TX.STOPWORDS.items():
        arr = ", ".join(f"'{w}'" for w in ws)
        score_cols.append(
            f"len(list_filter(toks, t -> list_contains([{arr}], t))) * 1.0 / greatest(len(toks), 1) AS s_{lang}"
        )
    return ",\n           ".join(score_cols)


_LANGS_DESC = sorted(TX.STOPWORDS.keys(), reverse=True)  # zh, fr, es, en, de
_ARGMAX_CASE = "CASE " + " ".join(
    f"WHEN s_{lang} >= greatest({', '.join('s_' + o for o in TX.STOPWORDS)}) THEN '{lang}'"
    for lang in _LANGS_DESC
) + " END"

_LANGID_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> ''), t -> lower(t)) AS toks
  FROM documents
),
scores AS (
  SELECT doc_id,
           {_lang_scores_sql()}
  FROM toks
)
SELECT CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) > 0
            THEN {_ARGMAX_CASE} ELSE 'und' END AS lang_pred,
       COUNT(*) AS n
FROM scores GROUP BY 1
"""


@q(
    "q_text_langid",
    oracle=_LANGID_ORACLE,
    desc="stopword-vote language ID over documents (pure expression "
         "tree; the oracle mirrors the scoring + argmax exactly). On "
         "this synthetic corpus most docs are 'und'/'en' — accuracy is "
         "pytest-verified on crafted multilingual samples.",
    tags=["text", "langid"],
)
def q_text_langid(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    return TX.lang_id(docs).groupBy("lang_pred").agg(F.count("*").alias("n"))


@q(
    "q_text_quality_score",
    oracle="""
    WITH feats AS (
      SELECT lang,
             len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS n_tokens,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^.,!?;:''"()\\[\\]-]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS n_nonspace
    FROM documents
    ),
    scored AS (
      SELECT lang,
             (CASE WHEN n_tokens >= 5 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN n_tokens > 0 AND (n_nonspace * 1.0 / n_tokens) BETWEEN 2 AND 15 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN n_chars = 0 OR (n_punct * 1.0 / n_chars) <= 0.2 THEN 0.15 ELSE 0.0 END)
             + (CASE WHEN n_chars = 0 OR (n_digit * 1.0 / n_chars) <= 0.3 THEN 0.15 ELSE 0.0 END) AS score
      FROM feats
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN score >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(CAST(score AS DECIMAL(8,2))) AS DOUBLE) AS total_score
    FROM scored GROUP BY lang
    """,
    desc="composite quality score (token count / token length / punct "
         "ratio / digit ratio gates) + keep-rate per language.",
    tags=["text", "quality"],
)
def q_text_quality_score(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    scored = TX.quality_score(docs)
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(col("keep"), 1).otherwise(0)).cast("bigint").alias("n_keep"),
        F.sum(col("quality_score").cast("decimal(8,2)")).cast("double").alias("total_score"),
    )


@q(
    "q_text_bpe_tokens",
    oracle=r"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^ \t\n\x0B\f\r\p{L}\p{N}]'))) AS BIGINT) AS total_bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
    desc="BPE-ish token counting (regexp word/number/symbol classes) — "
         "regexp_extract_all evaluated JVM-side.",
    tags=["text", "tokens"],
)
def q_text_bpe_tokens(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(F.size(TX.bpe_tokens(col("text")))).cast("bigint").alias("total_bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------
# windows wave 2
# ---------------------------------------------------------------------

@q(
    "q_window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           LEAD(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_after_first
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
    """,
    desc="first_value/last_value over an unbounded frame + lead with "
         "default, one row per customer.",
    tags=["window"],
)
def q_window_first_last(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").filter(col("o_custkey") < 50)
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full_w = order_w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(full_w).alias("first_order"),
            F.last("o_orderkey").over(full_w).alias("last_order"),
            F.lead("o_orderkey", 1, -1).over(order_w).alias("next_after_first"),
            F.row_number().over(order_w).alias("_rn"),
        )
        .filter(col("_rn") == 1)
        .drop("_rn")
        .distinct()
    )


@q(
    "q_events_sliding",
    oracle="""
    WITH exploded AS (
      SELECT event_type,
             unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS win_start
      FROM events
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS window_start, event_type, COUNT(*) AS n
    FROM exploded GROUP BY 1, 2
    """,
    desc="sliding window (1h window / 30min slide): each event lands in "
         "2 windows; batch twin of the streaming sliding agg.",
    tags=["events", "window", "streaming-twin"],
)
def q_events_sliding(spark, sf_dir):
    e = tables.load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.date_format(col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"), "event_type", "n")
    )


# ---------------------------------------------------------------------
# UDF surface: grouped-map applyInPandas with a deterministic kernel
# ---------------------------------------------------------------------

@q(
    "q_grouped_map_normalize",
    oracle="""
    WITH stats AS (
      SELECT event_type, MIN(value) AS mn, MAX(value) AS mx FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(CASE WHEN mx > mn THEN (e.value - mn) / (mx - mn) ELSE 0.5 END AS DOUBLE) AS value_scaled
    FROM events e JOIN stats USING (event_type)
    WHERE e.event_id < 500
    """,
    desc="U1 grouped-map UDF: per-group min-max scaling via "
         "applyInPandas (Arrow batches, vectorized pandas kernel). "
         "min/max are exact doubles, so the scaled values hash-match "
         "the relational oracle.",
    tags=["udf", "grouped-map"],
)
def q_grouped_map_normalize(spark, sf_dir):
    import pandas as pd

    e = tables.load(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["value"].min(), pdf["value"].max()
        scaled = (pdf["value"] - mn) / (mx - mn) if mx > mn else pd.Series([0.5] * len(pdf))
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value_scaled": scaled,
        })

    out = e.groupBy("event_type").applyInPandas(
        scale, schema="event_id long, event_type string, value_scaled double"
    )
    return out.filter(col("event_id") < 500)


@q(
    "q_approx_distinct",
    # The raw HLL estimate is engine-specific, but "estimate within
    # tolerance of exact" is a deterministic boolean for a fixed
    # dataset — so emit exact counts plus that flag, and the oracle
    # asserts the flag is 1 (rsd=0.02, bound 8% ≈ 4 sigma). This keeps
    # the sketch in the Spark plan while making the row hash exact.
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n,
           CAST(1 AS INT) AS hll_within_tol
    FROM events GROUP BY event_type
    """,
    desc="approx_count_distinct (HyperLogLog++) of users per event "
         "type — the sketch path for 100 TB cardinality estimation; "
         "verified against the exact distinct count within 8%.",
    tags=["agg", "approx"],
)
def q_approx_distinct(spark, sf_dir):
    e = tables.load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n"),
        (
            F.abs(F.approx_count_distinct("user_id", 0.02) - F.countDistinct("user_id"))
            <= 0.08 * F.countDistinct("user_id")
        )
        .cast("int")
        .alias("hll_within_tol"),
    )


@q(
    "q_term_doc_freq",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS term
      FROM documents
    )
    SELECT term, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS term_freq
    FROM t GROUP BY term
    ORDER BY doc_freq DESC, term LIMIT 20
    """,
    desc="per-term corpus statistics (document frequency + term "
         "frequency, the integer core of TF-IDF); top-20 with "
         "deterministic tie-break.",
    tags=["text", "tfidf"],
)
def q_term_doc_freq(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    return (
        TX.term_doc_freq(docs)
        .orderBy(col("doc_freq").desc(), col("term"))
        .limit(20)
    )


@q(
    "q_dedup_clusters",
    # Connected components ARE oracle-able: min-label-per-component is
    # deterministic, and DuckDB's WITH RECURSIVE computes reachability
    # closure over the same exact-Jaccard edge set (tiny graph — the
    # planted near-dup pairs), then min per node = component id.
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 2)),
                                   i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
      FROM toks
    ),
    cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
    cpairs AS (
      SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT id_a, id_b
      FROM cpairs JOIN cnt ca ON cpairs.id_a = ca.doc_id JOIN cnt cb ON cpairs.id_b = cb.doc_id
      WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM jp UNION SELECT id_b, id_a FROM jp),
    reach AS (
      SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    clus AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM clus GROUP BY cluster_id)
    SELECT cluster_size, COUNT(*) AS n_clusters FROM sizes GROUP BY cluster_size
    """,
    desc="full dedup decision: ngram-jaccard pairs -> connected "
         "components (iterative min-label propagation) -> per-cluster "
         "keep/drop; returns cluster-size histogram.",
    tags=["dedup", "graph"],
)
def q_dedup_clusters(spark, sf_dir):
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graph import dedup_clusters

    docs = tables.load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    decided = dedup_clusters(docs, pairs)
    return (
        decided.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
    )


@q(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', TIMESTAMP '2024-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders WHERE o_custkey < 50
    """,
    desc="value-based RANGE window frame (30-day trailing spend per "
         "customer) — tie-safe because the frame is defined by value, "
         "not row position.",
    tags=["window", "range-frame"],
)
def q_window_range_frame(spark, sf_dir):
    from pyspark.sql import Window

    o = tables.load(spark, sf_dir, "orders").filter(col("o_custkey") < 50)
    days = F.datediff(col("o_orderdate"), F.lit("2024-01-01").cast("timestamp"))
    w = Window.partitionBy("o_custkey").orderBy(days.cast("long")).rangeBetween(-30, 0)
    return o.select(
        "o_orderkey", "o_custkey",
        F.sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("spend_30d"),
    )


# Shared by q_pipeline_clean_corpus (below) and wave101's
# q_pipeline_curated_corpus: stages 1+2 of the corpus pipelines —
# quality gate, then min-id survivor per normalized fingerprint.
# Continues an open WITH chain (callers append their own CTEs).
QUALITY_EXACT_SQL = """
WITH feats AS (
  SELECT *,
         len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS n_tok,
         length(text) AS n_ch,
         length(regexp_replace(text, '[^.,!?;:''"()\\[\\]-]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS n_nonspace
  FROM documents
),
quality AS (
  SELECT doc_id, text, lang FROM feats
  WHERE (CASE WHEN n_tok >= 5 THEN 0.4 ELSE 0.0 END)
      + (CASE WHEN n_tok > 0 AND (n_nonspace * 1.0 / n_tok) BETWEEN 2 AND 15 THEN 0.3 ELSE 0.0 END)
      + (CASE WHEN n_ch = 0 OR (n_punct * 1.0 / n_ch) <= 0.2 THEN 0.15 ELSE 0.0 END)
      + (CASE WHEN n_ch = 0 OR (n_digit * 1.0 / n_ch) <= 0.3 THEN 0.15 ELSE 0.0 END) >= 0.9
),
exact AS (
  SELECT doc_id, text, lang FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS keep_id
    FROM quality
  ) WHERE doc_id = keep_id
)"""

# Stage 3 continuation (also imported by wave103's funnel): greedy
# near-dup removal over the exact-stage survivors; ends at the
# ``final`` CTE so callers append their own SELECT.
NEAR_FINAL_SQL = """,
toks AS (SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') t FROM exact),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 2)),
                               i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
  FROM toks
),
cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near AS (
  SELECT DISTINCT id_b FROM pairs
  JOIN cnt ca ON pairs.id_a = ca.doc_id JOIN cnt cb ON pairs.id_b = cb.doc_id
  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5
),
final AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT id_b FROM near))"""

_PIPELINE_ORACLE = QUALITY_EXACT_SQL + NEAR_FINAL_SQL + """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM final GROUP BY lang
"""


@q(
    "q_pipeline_clean_corpus",
    oracle=_PIPELINE_ORACLE,
    desc="the composed training-data pipeline: quality gate -> exact "
         "dedup (min-id per normalized fingerprint) -> greedy near-dup "
         "removal (drop the higher id of every >=0.5-jaccard pair); "
         "survivors per language. Stage order = cheapest filter first.",
    tags=["pipeline", "dedup", "quality"],
)
def q_pipeline_clean_corpus(spark, sf_dir):
    from ..operators.pipeline import clean_corpus

    docs = tables.load(spark, sf_dir, "documents")
    final = clean_corpus(docs, jaccard_threshold=0.5, shingle_n=4)
    return final.groupBy("lang").agg(
        F.count(lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )
