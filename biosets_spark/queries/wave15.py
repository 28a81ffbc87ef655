"""Fifteenth-wave query inventory: a differentially-audited Count-Min
sketch (heavy-hitter counting without an unbounded groupBy domain),
per-label embedding centroids (the k-means/IVF building block as a
first-class query), equal-frequency feature binning against broadcast
quantile cuts, and per-user time-weighted averages (the irregular-
time-series mean that plain AVG gets wrong).

Determinism discipline follows queries.py: md5-derived hashes both
engines rebuild bit-identically (operators/dedup.py:portable_hash60),
DECIMAL quantization before any floating sum, total orders with
unique-key tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators import text as T
from ..operators.dedup import portable_hash60
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL

# Deliberately undersized for the synthetic ~31-token vocabulary so the
# one-sided CMS error is actually visible in the audit output (a
# right-sized sketch on this corpus returns overestimate=0 everywhere,
# which verifies nothing). Production sizing: w = ceil(e/eps), d =
# ceil(ln(1/delta)).
_CMS_D = 2  # hash rows
_CMS_W = 8  # buckets per row


@q(
    "q_countmin_audit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    bucketed AS (
      SELECT tok, c, j,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 15))::BIGINT
               % {_CMS_W} AS b
      FROM counts CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j)
    ),
    sketch AS (SELECT j, b, SUM(c) AS s FROM bucketed GROUP BY j, b),
    top AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 20)
    SELECT top.tok, CAST(top.c AS BIGINT) AS exact_count,
           CAST(MIN(sketch.s) AS BIGINT) AS cms_estimate,
           CAST(MIN(sketch.s) - top.c AS BIGINT) AS overestimate
    FROM top
    JOIN bucketed USING (tok)
    JOIN sketch ON sketch.j = bucketed.j AND sketch.b = bucketed.b
    GROUP BY top.tok, top.c
    ORDER BY exact_count DESC, tok
    """,
    desc="Differential audit of a Count-Min sketch (d=2 rows, w=8 "
         "buckets — deliberately undersized for this vocabulary so "
         "the error term is non-trivial; md5-derived bucket hashes "
         "both engines rebuild "
         "bit-identically): for the top-20 exact heavy hitters, the "
         "CMS estimate (min over rows of the bucket sums) and its "
         "one-sided overestimate. At 100 TB the sketch is the point: "
         "d×w longs per shard, merged by addition (map-side "
         "combinable), estimate any token's count without ever "
         "shuffling the unbounded token domain — audited here against "
         "the exact counts the sketch would replace.",
    tags=["text", "approx", "agg", "cross"],
)
def q_countmin_audit(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(T.tokens(col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    bucketed = counts
    for j in range(_CMS_D):
        bucketed = bucketed.withColumn(
            f"b{j}",
            F.pmod(portable_hash60(F.concat(lit(f"{j}:"), col("tok"))), lit(_CMS_W)),
        )
    top = bucketed.orderBy(col("c").desc(), "tok").limit(20)
    est = top
    for j in range(_CMS_D):
        sketch_j = (
            bucketed.groupBy(f"b{j}").agg(F.sum("c").alias(f"s{j}"))
        )
        est = est.join(broadcast(sketch_j), f"b{j}")
    return (
        est.select(
            "tok",
            col("c").alias("exact_count"),
            F.least(*[col(f"s{j}") for j in range(_CMS_D)]).alias("cms_estimate"),
            (F.least(*[col(f"s{j}") for j in range(_CMS_D)]) - col("c")).alias("overestimate"),
        )
        .orderBy(col("exact_count").desc(), "tok")
    )


@q(
    "q_label_centroids",
    oracle="""
    WITH comps AS (
      SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding) AS comp
      FROM embeddings
    )
    SELECT label, CAST(pos AS INT) AS pos, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CAST(FLOOR((CAST(comp AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,8)))
                AS DOUBLE) / COUNT(*) AS centroid
    FROM comps WHERE pos < 8
    GROUP BY label, pos
    ORDER BY label, pos
    """,
    desc="Per-label embedding centroid, first 8 dimensions — the "
         "building block of k-means/IVF training surfaced as a query. "
         "The array is sliced to the audited dims BEFORE posexplode, "
         "so the shuffle carries 8 components per vector, not 64; "
         "component sums are DECIMAL-quantized (order-free exact) and "
         "the groupBy on (label, pos) is map-side combinable. The "
         "same shape at 100 TB is one pass of Lloyd's algorithm with "
         "assignments in place of labels.",
    tags=["vector", "agg"],
)
def q_label_centroids(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings").select("label", "embedding")
    comps = emb.select(
        "label", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "comp")
    )
    return (
        comps.groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            # NO final ROUND: the decimal sum -> double is exact and
            # IEEE division is bit-identical in both engines, while a
            # FLOOR((quotient) * 1e6 + 0.5) / 1e6 can land on a half boundary where
            # Spark (BigDecimal of the shortest repr, HALF_UP) and
            # DuckDB (binary-value rounding) disagree — hit for real
            # at sf0.1 (r8: 0.003213 vs 0.003214)
            (
                F.sum((dfloor((col("comp").cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(18,8)"))
                .cast("double") / F.count("*")
            ).alias("centroid"),
        )
        .select(col("label"), col("pos").cast("int").alias("pos"), "n_vecs", "centroid")
        .orderBy("label", "pos")
    )


@q(
    "q_equal_freq_bins",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS c1,
             quantile_cont(o_totalprice, 0.50) AS c2,
             quantile_cont(o_totalprice, 0.75) AS c3
      FROM orders
    )
    SELECT o_orderpriority,
           CASE WHEN o_totalprice < c1 THEN 1 WHEN o_totalprice < c2 THEN 2
                WHEN o_totalprice < c3 THEN 3 ELSE 4 END AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           (MIN(o_totalprice)) AS min_price,
           (MAX(o_totalprice)) AS max_price
    FROM orders CROSS JOIN cuts
    GROUP BY o_orderpriority,
             CASE WHEN o_totalprice < c1 THEN 1 WHEN o_totalprice < c2 THEN 2
                  WHEN o_totalprice < c3 THEN 3 ELSE 4 END
    ORDER BY o_orderpriority, bin
    """,
    desc="Equal-frequency (quartile) feature binning: global exact "
         "quantile cuts come back as a 1-row broadcast, each order is "
         "bucketed with a pure CASE expression, and the per-"
         "(priority, bin) counts verify the bins actually split "
         "~25/25/25/25 — the feature-engineering discretization pass, "
         "expressed so the fact table is scanned once and never "
         "sorted. Strict '<' on both engines makes cut-boundary rows "
         "deterministic.",
    # "cross" tag: deliberate 1-row crossJoin(broadcast(cuts)).
    tags=["agg", "percentile", "cross"],
)
def q_equal_freq_bins(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    cuts = o.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("c1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("c2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("c3"),
    )
    binned = o.crossJoin(broadcast(cuts)).withColumn(
        "bin",
        F.when(col("o_totalprice") < col("c1"), 1)
        .when(col("o_totalprice") < col("c2"), 2)
        .when(col("o_totalprice") < col("c3"), 3)
        .otherwise(4),
    )
    return (
        binned.groupBy("o_orderpriority", "bin")
        .agg(
            F.count("*").alias("n"),
            (F.min("o_totalprice")).alias("min_price"),
            (F.max("o_totalprice")).alias("max_price"),
        )
        .orderBy("o_orderpriority", "bin")
    )


@q(
    "q_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS t_next
      FROM events
    ),
    seg AS (
      SELECT user_id,
             CAST(FLOOR((value) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) * (t_next - t) AS wv,
             t_next - t AS dt
      FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
           (CAST(SUM(wv) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE)) AS twa_value
    FROM seg GROUP BY user_id
    ORDER BY CAST(SUM(wv) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE) DESC, user_id
    LIMIT 20
    """,
    desc="Top-20 users by time-weighted average event value: each "
         "reading is held until the user's next event and weighted by "
         "that duration in microseconds — the correct mean for "
         "irregularly-sampled series, where plain AVG over-weights "
         "bursts. One lag window over the high-cardinality user key "
         "(single exchange+sort), value quantized to DECIMAL(18,6) "
         "before the exact weighted sum; integer microsecond weights.",
    tags=["window", "events", "agg"],
)
def q_time_weighted_avg(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "value", F.unix_micros("ts").alias("t"), "event_id", "ts"
    ).withColumn("t_next", F.lead("t").over(w)).filter(col("t_next").isNotNull())
    seg = seq.select(
        "user_id",
        ((dfloor((col("value")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(18,6)") * (col("t_next") - col("t"))).alias("wv"),
        (col("t_next") - col("t")).alias("dt"),
    )
    agg = seg.groupBy("user_id").agg(
        (F.count("*") + 1).alias("n_events"),
        (F.sum("wv").cast("double") / F.sum("dt").cast("double")).alias("_twa_raw"),
    )
    return (
        agg.orderBy(col("_twa_raw").desc(), "user_id")
        .limit(20)
        .select("user_id", "n_events", (col("_twa_raw")).alias("twa_value"))
    )


@q(
    "q_hll_portable_audit",
    # Like q_minhash_estimate_quality / q_countmin_audit: the sketch
    # itself is rebuilt bit-identically by both engines (md5-derived
    # 60-bit hashes), so the ESTIMATE is deterministic and directly
    # comparable to the exact distinct count. The register-sum is kept
    # as an exact integer (SUM of 2^(57-rho)) — a float SUM(2^-rho)
    # could round order-dependently once rho spans > 53 bits.
    oracle="""
    WITH hashed AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ),
    regs AS (
      SELECT event_type, h % 16 AS idx,
             MAX(CASE WHEN h // 16 = 0 THEN 57
                      ELSE 56 - length(bin(h // 16)) + 1 END) AS rho
      FROM hashed GROUP BY event_type, h % 16
    ),
    est AS (
      SELECT event_type,
             SUM(CAST(POWER(2, 57 - rho) AS BIGINT)) AS denom_scaled,
             COUNT(*) AS m_used
      FROM regs GROUP BY event_type
    ),
    raw AS (
      SELECT event_type, 16 - m_used AS empties,
             0.673 * 256 * POWER(2.0, 57)
               / (denom_scaled + (16 - m_used) * POWER(2.0, 57)) AS e_raw
      FROM est
    ),
    corrected AS (
      SELECT event_type, empties,
             CASE WHEN e_raw <= 40 AND empties > 0
                  THEN 16 * LN(16.0 / empties) ELSE e_raw END AS e
      FROM raw
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT exact.event_type, CAST(n_exact AS BIGINT) AS n_exact,
           (e) AS hll_estimate,
           ((e - n_exact) / n_exact) AS rel_err,
           CAST(empties AS BIGINT) AS empty_registers
    FROM exact JOIN corrected USING (event_type)
    ORDER BY event_type
    """,
    desc="Differential audit of a PORTABLE HyperLogLog (m=16 "
         "registers, md5-derived hashes both engines rebuild "
         "bit-identically, with the small-range linear-counting "
         "correction): estimated vs exact distinct users per event "
         "type, with the relative error an operator would monitor "
         "before trusting the 16-long mergeable register vector at "
         "100 TB. Register sums stay exact integers (2^(57-rho)) so "
         "the estimate is order-free; completes the audited-sketch "
         "trilogy (MinHash, Count-Min, HLL). The production path is "
         "approx_count_distinct (q_approx_distinct); this one makes "
         "the estimator itself verifiable.",
    tags=["events", "approx", "agg"],
)
def q_hll_portable_audit(spark, sf_dir):
    from ..operators.dedup import portable_hash60

    ev = tables.load(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = ev.select(
        "event_type", portable_hash60(col("user_id").cast("string")).alias("h")
    )
    v = F.expr("h div 16")
    regs = (
        hashed.groupBy("event_type", F.pmod(col("h"), lit(16)).alias("idx"))
        .agg(
            F.max(
                F.when(v == 0, lit(57)).otherwise(lit(56) - F.length(F.bin(v)) + 1)
            ).alias("rho")
        )
    )
    est = regs.groupBy("event_type").agg(
        F.sum(F.pow(lit(2), lit(57) - col("rho")).cast("long")).alias("denom_scaled"),
        F.count("*").alias("m_used"),
    )
    raw = est.select(
        "event_type",
        (lit(16) - col("m_used")).alias("empties"),
        (
            lit(0.673 * 256) * F.pow(lit(2.0), lit(57))
            / (col("denom_scaled") + (lit(16) - col("m_used")) * F.pow(lit(2.0), lit(57)))
        ).alias("e_raw"),
    )
    corrected = raw.select(
        "event_type",
        "empties",
        F.when(
            (col("e_raw") <= 40) & (col("empties") > 0),
            lit(16) * F.log(lit(16.0) / col("empties")),
        ).otherwise(col("e_raw")).alias("e"),
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        exact.join(corrected, "event_type")
        .select(
            "event_type",
            "n_exact",
            (col("e")).alias("hll_estimate"),
            ((col("e") - col("n_exact")) / col("n_exact")).alias("rel_err"),
            col("empties").cast("long").alias("empty_registers"),
        )
        .orderBy("event_type")
    )
