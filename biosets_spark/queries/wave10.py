"""Tenth-wave query inventory: span-level dedup (the C4/RefinedWeb
boilerplate-span signal), asymmetric containment dedup, batch event
sessionization / changelog compaction, unpivot, rank-window analytics,
exact-sum correlation, histogramming, edit-distance matching, and
per-minute anomaly detection.

Determinism discipline follows queries.py: every score is either an
integer count or a single IEEE expression over exact (decimal- or
integer-summed) inputs; top-k orders use the exact expression with a
unique-key tie-break; computed doubles are grid-rounded before any
DECIMAL quantization so half-way ties use the engines' shared ROUND.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators import text as T
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_span_dedup",
    # spans are non-overlapping 10-token windows; the oracle rebuilds
    # them with the same 1-based inclusive slice arithmetic. Spark
    # hashes spans to xxhash64 longs before shuffling (join-key only;
    # a collision altering counts has probability ~(n_spans)^2 / 2^65).
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    sp AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, greatest(CAST(ceil(len(t) / 10.0) AS INT), 1)),
               i -> array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ')))
               AS s
      FROM toks
    ),
    spn AS (SELECT doc_id, s FROM sp WHERE s <> ''),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_spans FROM spn GROUP BY doc_id),
    hot AS (
      SELECT s FROM spn GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    dup AS (
      SELECT doc_id, COUNT(*) AS dup_spans
      FROM spn WHERE s IN (SELECT s FROM hot) GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_spans AS BIGINT) AS n_spans,
           CAST(COALESCE(d.dup_spans, 0) AS BIGINT) AS dup_spans,
           (CAST(COALESCE(d.dup_spans, 0) AS DOUBLE) / p.n_spans)
             AS dup_frac
    FROM per_doc p LEFT JOIN dup d ON p.doc_id = d.doc_id
    WHERE COALESCE(d.dup_spans, 0) > 0
    ORDER BY CAST(COALESCE(d.dup_spans, 0) AS DOUBLE) / p.n_spans DESC, p.doc_id
    LIMIT 20
    """,
    desc="C4-style span-level duplication profile: top-20 documents by "
         "fraction of 10-token spans that also appear in >= 2 docs "
         "(boilerplate/license/navigation chrome signal). Spans hash "
         "to longs before the shuffle; counts are integers; ordering "
         "uses the exact fraction with a doc_id tie-break.",
    tags=["dedup", "text"],
)
def q_span_dedup(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    stats = T.span_dedup_stats(docs, span_tokens=10, min_docs=2)
    return (
        stats.filter(col("dup_spans") > 0)
        .orderBy(col("dup_frac").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "n_spans", "dup_spans",
                col("dup_frac").alias("dup_frac"))
    )


@q(
    "q_containment",
    # the 1000-doc hot-shingle cutoff cannot trigger at oracle scale
    # (<= 500 docs), so the oracle mirrors it only structurally
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 2)),
                                   i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
      FROM toks
    ),
    kept AS (
      SELECT sh.doc_id, sh.s
      FROM sh JOIN (SELECT s, COUNT(*) AS d FROM sh GROUP BY 1) df USING (s)
      WHERE df.d <= 1000
    ),
    cnt AS (SELECT doc_id, COUNT(*) n FROM kept GROUP BY 1),
    pairs AS (
      SELECT a.doc_id id_small, b.doc_id id_big, COUNT(*) common
      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_small, id_big,
           (common * 1.0 / c.n) AS containment
    FROM pairs JOIN cnt c ON pairs.id_small = c.doc_id
    WHERE common * 1.0 / c.n >= 0.8
    """,
    desc="asymmetric shingle-containment near-dup pairs "
         "(|A inter B| / |A| >= 0.8): catches excerpt/quote duplication "
         "that symmetric Jaccard's union denominator drowns. Same "
         "bounded self-join plan as ngram Jaccard (hot-shingle cutoff "
         "on both the join and the denominators).",
    tags=["dedup", "ngram"],
)
def q_containment(spark, sf_dir):
    from ..operators.dedup import containment_pairs

    docs = tables.load(spark, sf_dir, "documents")
    pairs = containment_pairs(docs, n=4, threshold=0.8, max_shingle_df=1000)
    return pairs.select(
        "id_small", "id_big", col("containment").alias("containment"))


@q(
    "q_keep_latest_event",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    desc="changelog compaction / keep-latest-version per key: "
         "row_number over (key ORDER BY ts DESC, unique-id DESC) = 1. "
         "One exchange on the key, per-partition sort, no global sort; "
         "the unique tie-break makes 'latest' total under timestamp "
         "collisions.",
    tags=["window", "events"],
)
def q_keep_latest_event(spark, sf_dir):
    from ..operators.events import keep_latest

    ev = tables.load(spark, sf_dir, "events")
    return keep_latest(ev).select("user_id", "event_id", "event_type", "value")


@q(
    "q_sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    lens AS (
      SELECT user_id, session_id, COUNT(*) AS session_len
      FROM sess GROUP BY user_id, session_id
    )
    SELECT CAST(session_len AS BIGINT) AS session_len,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM lens GROUP BY session_len
    """,
    desc="batch sessionization (30-min inactivity gap) over the event "
         "archive — the historical twin of the streaming session "
         "window: lag() marks session starts, a running sum over the "
         "same (ts, unique-id) total order numbers them, output is the "
         "session-length histogram. One exchange+sort per key; integer "
         "counts only.",
    tags=["window", "events", "agg"],
)
def q_sessionize_batch(spark, sf_dir):
    from ..operators.events import sessionize

    ev = tables.load(spark, sf_dir, "events")
    sess = sessionize(ev, gap_minutes=30)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("session_len"))
        .groupBy("session_len")
        .agg(F.count("*").alias("n_sessions"))
    )


@q(
    "q_unpivot_measures",
    oracle="""
    WITH long_form AS (
      SELECT 'quantity' AS measure, CAST(l_quantity AS DECIMAL(18,2)) AS val
      FROM lineitem
      UNION ALL
      SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
    )
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val) AS DOUBLE) AS total
    FROM long_form GROUP BY measure
    """,
    desc="unpivot/melt wide measures into long form via stack() — the "
         "Spark-native UNPIVOT (one generator, no join, no shuffle "
         "before the partial agg) — then per-measure exact-decimal "
         "totals.",
    tags=["unpivot", "agg"],
)
def q_unpivot_measures(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    long_form = li.select(
        F.expr(
            "stack(4, "
            "'quantity', CAST(l_quantity AS DECIMAL(18,2)), "
            "'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)), "
            "'discount', CAST(l_discount AS DECIMAL(18,2)), "
            "'tax', CAST(l_tax AS DECIMAL(18,2))"
            ") AS (measure, val)"
        )
    )
    return long_form.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.sum("val").cast("double").alias("total"),
    )


@q(
    "q_percent_rank",
    # percent_rank = (rank-1)/(n-1) and cume_dist = n_le/n are ratios
    # of exact integers, identically defined in both engines; ties get
    # equal ranks so the filter sets are order-independent
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_acctbal,
             PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC) AS pr,
             CUME_DIST() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC) AS cd
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(CASE WHEN pr <= 0.10 THEN 1 END) AS BIGINT) AS n_top10,
           CAST(SUM(CASE WHEN pr <= 0.10
                         THEN CAST(c_acctbal AS DECIMAL(18,2)) END)
                AS DOUBLE) AS top10_bal,
           CAST(COUNT(CASE WHEN cd <= 0.25 THEN 1 END) AS BIGINT) AS n_cume25
    FROM ranked GROUP BY c_mktsegment
    """,
    desc="rank-window analytics: per market segment, the top-decile "
         "customer count and balance mass (percent_rank) and the "
         "top-quartile population (cume_dist) — both ratios of exact "
         "integers with engine-identical tie semantics. 100 TB note: "
         "a rank window over a LOW-cardinality partition key funnels "
         "each segment through one task; at that scale either compute "
         "the decile CUT per segment first (q_winsorize's percentile "
         "pattern) and filter against the broadcast cuts, or — when "
         "exact ranks are needed — use operators/ranking.py's "
         "doubled_midranks (distinct-value histogram + two-level "
         "prefix sum; parallelism = #buckets, not #groups), the "
         "shared scale path of q_mann_whitney and q_auc_roc.",
    tags=["window", "agg"],
)
def q_percent_rank(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc())
    ranked = c.select(
        "c_mktsegment", "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("c_mktsegment").agg(
        F.count(F.when(col("pr") <= 0.10, 1)).alias("n_top10"),
        F.sum(F.when(col("pr") <= 0.10,
                     col("c_acctbal").cast("decimal(18,2)")))
        .cast("double").alias("top10_bal"),
        F.count(F.when(col("cd") <= 0.25, 1)).alias("n_cume25"),
    )


@q(
    "q_corr_exact",
    # Pearson r from six exact sums (decimal/integer accumulation is
    # order-free), then ONE closing double expression — never the
    # engines' streaming corr() aggregates, whose float accumulation
    # order differs. Sums fit decimal(38,4) up to ~1e9 rows/group at
    # these magnitudes; beyond that raise the scale headroom.
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS corr_qty_price
    FROM s
    """,
    desc="deterministic Pearson correlation (quantity vs extended "
         "price per return flag) from six exact decimal sums + one "
         "closing double expression — the portable replacement for "
         "the engines' order-dependent streaming corr() aggregate.",
    tags=["agg", "stats"],
)
def q_corr_exact(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    dq = col("l_quantity").cast("decimal(18,2)")
    dp = col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dq).alias("sx"),
        F.sum(dp).alias("sy"),
        F.sum(dq * dp).alias("sxy"),
        F.sum(dq * dq).alias("sxx"),
        F.sum(dp * dp).alias("syy"),
    )
    n = col("n")
    sx, sy = col("sx").cast("double"), col("sy").cast("double")
    sxy, sxx, syy = (col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return s.select("l_returnflag", "n", (r).alias("corr_qty_price"))


@q(
    "q_length_histogram",
    # integer floor-division (//) on the oracle side: DuckDB's
    # double -> BIGINT cast ROUNDS, so CAST(len/25 AS BIGINT) would
    # disagree with Spark's floor()
    oracle=f"""
    SELECT least(len({_TOKS_SQL}) // 25, 19) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1
    """,
    desc="token-length histogram with manual integer bucketing "
         "(floor(n/25) clamped to 20 buckets) — engine-portable where "
         "width_bucket boundary semantics are not; pure expressions + "
         "combinable counts.",
    tags=["text", "agg"],
)
def q_length_histogram(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("text")
    bucket = F.least(
        F.floor(F.size(T.tokens(col("text"))) / 25), lit(19)).cast("long")
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
    )


@q(
    "q_levenshtein_brands",
    oracle="""
    SELECT CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           min(p_brand) AS sample_brand
    FROM part GROUP BY 1
    """,
    desc="edit-distance profile of a dimension attribute against a "
         "probe value (fuzzy-matching primitive): levenshtein() is "
         "the standard Wagner-Fischer distance in both engines; "
         "integer output, scan-speed, no join.",
    tags=["text", "fuzzy"],
)
def q_levenshtein_brands(spark, sf_dir):
    p = tables.load(spark, sf_dir, "part")
    return (
        p.select(F.levenshtein(col("p_brand"), lit("Brand#33")).alias("dist"),
                 "p_brand")
        .groupBy("dist")
        .agg(F.count("*").alias("n_parts"), F.min("p_brand").alias("sample_brand"))
    )


@q(
    "q_events_anomaly",
    # mean/stddev from exact integer sums (s1, s2 over per-minute
    # counts), threshold = one closing double expression; the minute
    # counts being integers, a count can only tie the double threshold
    # if the threshold is exactly integral — computed identically in
    # both engines either way
    oracle="""
    WITH per_min AS (
      SELECT date_trunc('minute', ts) AS minute, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT COUNT(*) AS nm, SUM(cnt) AS s1, SUM(cnt * cnt) AS s2 FROM per_min
    )
    SELECT p.minute, CAST(p.cnt AS BIGINT) AS cnt
    FROM per_min p, stats
    WHERE CAST(p.cnt AS DOUBLE) >
          CAST(s1 AS DOUBLE) / nm
          + 3.0 * sqrt((nm * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(nm AS DOUBLE) * (nm - 1)))
    """,
    desc="per-minute event-rate anomaly detection: minutes whose count "
         "exceeds mean + 3 sample-stddev, with the moments built from "
         "exact integer sums and broadcast as a 1-row normalizer "
         "(deliberate BroadcastNestedLoopJoin).",
    tags=["events", "agg", "cross"],
)
def q_events_anomaly(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    per_min = (
        ev.select(F.date_trunc("minute", col("ts")).alias("minute"))
        .groupBy("minute")
        .agg(F.count("*").alias("cnt"))
    )
    stats = per_min.agg(
        F.count("*").alias("nm"),
        F.sum("cnt").alias("s1"),
        F.sum(col("cnt") * col("cnt")).alias("s2"),
    )
    nm = col("nm")
    s1, s2 = col("s1").cast("double"), col("s2").cast("double")
    thr = s1 / nm + 3.0 * F.sqrt(
        (nm * s2 - s1 * s1) / (nm.cast("double") * (nm - 1)))
    return (
        per_min.crossJoin(broadcast(stats))
        .filter(col("cnt").cast("double") > thr)
        .select("minute", "cnt")
    )


@q(
    "q_winsorize",
    # exact interpolated percentiles (Spark percentile == DuckDB
    # quantile_cont, both (n-1)*p linear interpolation over sorted
    # values); clipped values grid-rounded before the decimal-exact group
    # sum so the only floats are engine-identical expressions
    oracle=f"""
    WITH lens AS (
      SELECT lang, len({_TOKS_SQL}) AS n_tok FROM documents
    ),
    cuts AS (
      SELECT quantile_cont(n_tok, 0.05) AS lo,
             quantile_cont(n_tok, 0.95) AS hi
      FROM lens
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (CAST(SUM(CAST(FLOOR((least(greatest(CAST(n_tok AS DOUBLE), lo), hi)) * 1e6 + 0.5) / 1e6
                              AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
             AS mean_clipped_len
    FROM lens, cuts
    GROUP BY lang
    """,
    desc="winsorized mean document length per language: global exact "
         "p5/p95 cuts (interpolated percentile, identical (n-1)*p "
         "definition in both engines) broadcast as a 1-row normalizer; "
         "per-doc clipped lengths quantized to DECIMAL(18,6) before "
         "the group sum (order-free).",
    tags=["text", "agg", "cross"],
)
def q_winsorize(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("lang", "text")
    lens = docs.select("lang", F.size(T.tokens(col("text"))).alias("n_tok"))
    cuts = lens.agg(
        F.percentile(col("n_tok"), lit(0.05)).alias("lo"),
        F.percentile(col("n_tok"), lit(0.95)).alias("hi"),
    )
    clipped = (dfloor((F.least(F.greatest(col("n_tok").cast("double"), col("lo")), col("hi"))) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(18,6)")
    return (
        lens.crossJoin(broadcast(cuts))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum(clipped).cast("double") / F.count("*"))
            .alias("mean_clipped_len"),
        )
    )
