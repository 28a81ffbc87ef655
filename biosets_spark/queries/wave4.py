"""Fourth-wave query inventory: embedding-space dedup, correlated
subquery shapes (EXISTS / scalar / NOT EXISTS), int8 embedding
quantization, and content-defined chunk statistics.

Determinism notes follow the module pattern in queries.py: money
aggregates go through DECIMAL, threshold comparisons avoid
order-dependent float aggregates (integer-valued sums are exact in
double; money cutoffs use multiply-both-sides decimal arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

# ---------------------------------------------------------------------
# embedding-space near-duplicate detection
# ---------------------------------------------------------------------


@q(
    "q_dedup_embedding",
    # ids only (like q_knn_pairs): the pair SET is ulp-robust — the
    # nearest pair cosine sits 7.6e-4 from the 0.42 threshold at
    # sf0.001/sf0.01, ~9 orders of magnitude above double noise.
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.emb, b.emb) >= 0.42
    """,
    desc="embedding-cosine near-duplicate pairs (cosine >= 0.42): the "
         "embedding-space dedup detector, grid-blocked BLAS all-pairs "
         "(single-block: whole-index broadcast, zero shuffle; "
         "multi-block: one block-pair-bucket job, r8).",
    tags=["dedup", "similarity", "embedding"],
)
def q_dedup_embedding(spark, sf_dir):
    from ..operators.similarity import embedding_dup_pairs

    emb = tables.load(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(emb, threshold=0.42).select("id_a", "id_b")


# ---------------------------------------------------------------------
# correlated-subquery SQL shapes (TPC-H Q4 / Q17 / Q22 adapted to the
# columns present in the test schema)
# ---------------------------------------------------------------------


@q(
    "q_exists_subquery",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    """,
    desc="TPC-H Q4 shape: per-priority count of orders with a late-"
         "shipped lineitem — the correlated EXISTS evaluated as "
         "max(l_shipdate) per order (map-side-combinable pre-"
         "aggregate; the exchange carries one row per order, never "
         "raw lineitems) joined back on orderkey with the date "
         "comparison as a post-join filter.",
    tags=["subquery", "semi-join"],
)
def q_exists_subquery(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # EXISTS(l_shipdate > o_orderdate) <=> MAX(l_shipdate) > o_orderdate
    # (see q_order_priority_check): pre-aggregating removes the
    # forced big-side hash build of the left-semi shape.
    ms = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("_max_ship"))
    late = (
        o.join(ms, col("o_orderkey") == col("l_orderkey"))
        .filter(col("_max_ship") > col("o_orderdate"))
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@q(
    "q_scalar_subquery",
    # AVG(l_quantity) is deterministic here: quantities are integer-
    # valued doubles, so every partial sum is exact (< 2^53) and the
    # single closing division is identical in both engines.
    oracle="""
    WITH cut AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
             AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem l JOIN cut c ON l.l_partkey = c.l_partkey
    WHERE l.l_quantity < c.qty_cut
    """,
    desc="TPC-H Q17 shape: revenue of below-20%%-of-average-quantity "
         "lineitems — the correlated scalar subquery expressed as a "
         "per-part aggregate + shuffle join (map-side partial avg).",
    tags=["subquery", "scalar"],
)
def q_scalar_subquery(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    cut = li.groupBy("l_partkey").agg((lit(0.2) * F.avg("l_quantity")).alias("qty_cut"))
    small = li.join(cut, "l_partkey").filter(col("l_quantity") < col("qty_cut"))
    return small.agg(
        (F.sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / lit(7.0))
        .cast("double").alias("avg_yearly"),
        F.count("*").alias("n_small"),
    )


@q(
    "q_not_exists_customers",
    # money cutoff without a float AVG: c*n > total is exact decimal
    # arithmetic on both engines (avg = total/n would be order- and
    # engine-rounding-dependent).
    oracle="""
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS total,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_rich_inactive,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n > pos.total
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2001-01-01')
    GROUP BY c.c_mktsegment
    """,
    desc="TPC-H Q22 shape: above-average-balance customers with no "
         "recent (2001+) orders — scalar aggregate broadcast + anti "
         "join; the cutoff uses multiply-both-sides decimal arithmetic "
         "so the filter is exact (no float-avg nondeterminism).",
    # "cross" tag: the single-row scalar-aggregate crossJoin(broadcast)
    # is a deliberate BroadcastNestedLoopJoin (1-row build side)
    tags=["subquery", "anti-join", "cross"],
)
def q_not_exists_customers(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    pos = c.filter(col("c_acctbal") > 0.0).agg(
        F.sum(col("c_acctbal").cast("decimal(18,2)")).cast("decimal(28,2)").alias("total"),
        F.count("*").alias("n"),
    )
    rich = (
        c.crossJoin(broadcast(pos))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("total"))
    )
    recent = o.filter(col("o_orderdate") >= lit("2001-01-01").cast("date"))
    inactive = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return inactive.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rich_inactive"),
        F.sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
    )


# ---------------------------------------------------------------------
# embedding quantization (training-pipeline scale path: int8 storage /
# transfer is 4x smaller than float32, 8x smaller than float64)
# ---------------------------------------------------------------------


@q(
    "q_quantize_embeddings",
    # element-wise double arithmetic (no aggregation order): identical
    # IEEE ops in both engines, floor(x*s + 0.5) is the explicit
    # engine-portable round-half-up.
    # the int8 vector is serialized to a comma-joined string in BOTH
    # engines: the driver's value-hasher cannot canonicalize top-level
    # array cells (r3 driver-ERR, values verified equal).
    oracle="""
    WITH s AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             127.0 / greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                      y -> abs(y))), 1e-12) AS sc
      FROM embeddings
    )
    SELECT vec_id,
           array_to_string(list_transform(emb,
               x -> CAST(floor(x * sc + 0.5) AS INTEGER)), ',') AS q8,
           CAST(round(sc, 6) AS DOUBLE) AS scale6
    FROM s
    """,
    desc="symmetric int8 quantization of the embedding column "
         "(per-vector scale = 127/max|x|): pure JVM higher-order "
         "expressions, no shuffle, no UDF.",
    tags=["similarity", "quantize"],
)
def q_quantize_embeddings(spark, sf_dir):
    from ..functions.vectors import quantize_int8, quantize_scale

    emb = tables.load(spark, sf_dir, "embeddings")
    withs = emb.select(
        "vec_id", col("embedding").alias("emb"),
        quantize_scale(col("embedding")).alias("sc"),
    )
    return withs.select(
        "vec_id",
        F.concat_ws(
            ",", F.transform(quantize_int8(col("emb"), col("sc")),
                             lambda x: x.cast("string"))
        ).alias("q8"),
        (dfloor((col("sc")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("double").alias("scale6"),
    )


@q(
    "q_knn_quantized",
    # identical elementwise quantize->dequantize->cosine arithmetic in
    # both engines (no aggregation-order divergence: the cosine folds
    # left-to-right over 64 elements in each)
    oracle="""
    WITH qd AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             127.0 / greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                      y -> abs(y))), 1e-12) AS sc
      FROM embeddings
    ),
    deq AS (
      SELECT vec_id,
             list_transform(emb, x -> CAST(floor(x * sc + 0.5) AS DOUBLE) / sc) AS demb
      FROM qd
    ),
    qv AS (SELECT demb AS q FROM deq WHERE vec_id = 0)
    SELECT d.vec_id AS neighbor_id
    FROM deq d, qv
    WHERE d.vec_id <> 0
    ORDER BY list_cosine_similarity(d.demb, qv.q) DESC, d.vec_id
    LIMIT 10
    """,
    desc="top-10 kNN over int8-QUANTIZED vectors (quantize, dequantize, "
         "exact cosine): measures search on the 4x-smaller index the "
         "quantization path produces; the int8 arrays are what a 100 TB "
         "corpus would actually store and shuffle.",
    tags=["similarity", "knn", "quantize"],
)
def q_knn_quantized(spark, sf_dir):
    from ..functions.vectors import cosine, dequantize_int8, quantize_int8, quantize_scale

    emb = tables.load(spark, sf_dir, "embeddings")
    deq = emb.select(
        "vec_id",
        dequantize_int8(
            quantize_int8(col("embedding"), quantize_scale(col("embedding"))),
            quantize_scale(col("embedding")),
        ).alias("demb"),
    )
    qrow = deq.filter(col("vec_id") == 0).select("demb").first()[0]
    qv = F.array(*[lit(float(x)) for x in qrow])
    return (
        deq.filter(col("vec_id") != 0)
        .select(col("vec_id").alias("neighbor_id"), cosine(col("demb"), qv).alias("sim"))
        .orderBy(col("sim").desc(), col("neighbor_id"))
        .limit(10)
        .select("neighbor_id")
    )


# ---------------------------------------------------------------------
# hypertable-style time-series ops: multi-resolution rollup in one
# pass, and gap filling a sparse series onto a dense spine
# ---------------------------------------------------------------------


@q(
    "q_events_multires",
    # one GROUPING SETS pass produces both resolutions (hour + day) —
    # the continuous-aggregate / hypertable-rollup shape; grouping_id
    # disambiguates the level
    oracle="""
    SELECT CASE WHEN GROUPING(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00')) = 0
                THEN 'hour' ELSE 'day' END AS res,
           COALESCE(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00'),
                    strftime(date_trunc('day', ts), '%Y-%m-%d')) AS bucket,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS (
      (strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00'), event_type),
      (strftime(date_trunc('day', ts), '%Y-%m-%d'), event_type)
    )
    """,
    desc="multi-resolution rollup (hour + day in ONE grouping-sets "
         "pass): the hypertable continuous-aggregate shape — partial "
         "aggregation is shared across resolutions, one shuffle total.",
    tags=["events", "rollup"],
)
def q_events_multires(spark, sf_dir):
    e = tables.load(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
    day = F.date_format(F.date_trunc("day", col("ts")), "yyyy-MM-dd")
    g = e.select(hour.alias("h"), day.alias("d"), "event_type", "value")
    rolled = g.groupingSets(
        [[col("h"), col("event_type")], [col("d"), col("event_type")]],
        col("h"), col("d"), col("event_type"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        # grouping() mirrors the oracle's GROUPING(): h being NULL
        # inside the hour set (a null ts) must still label the row
        # 'hour'; only valid inside the aggregate, hence aliased here
        F.grouping(col("h")).alias("_gh"),
    )
    return rolled.select(
        F.when(col("_gh") == 0, "hour").otherwise("day").alias("res"),
        F.coalesce(col("h"), col("d")).alias("bucket"),
        "event_type", "n", "total_value",
    )


@q(
    "q_events_gapfill",
    # dense hourly spine per event_type via sequence/generate_series +
    # left join; missing buckets surface as zeros — sparse series in,
    # dense series out
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.h, '%Y-%m-%d %H:00') AS hour, t.event_type,
           COALESCE(a.n, 0) AS n
    FROM spine s CROSS JOIN types t
    LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type
    """,
    desc="time-series gap filling: dense hourly spine (sequence + "
         "explode, broadcast to the type dimension) left-joined to the "
         "sparse hourly aggregate; absent buckets emit n=0.",
    tags=["events", "gapfill", "cross"],
)
def q_events_gapfill(spark, sf_dir):
    e = tables.load(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.date_trunc("hour", col("ts")).alias("h"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence(col("lo"), col("hi"), F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = e.select("event_type").distinct()
    dense = spine.crossJoin(broadcast(types))
    out = dense.join(agg, ["h", "event_type"], "left")
    return out.select(
        F.date_format(col("h"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        F.coalesce(col("n"), lit(0)).alias("n"),
    )


# ---------------------------------------------------------------------
# deterministic sampling (training-data mixing): hash-gated sampling is
# reproducible across runs/engines and needs no shuffle — every row
# decides its own fate from its key, unlike rand()-based sampling
# ---------------------------------------------------------------------


@q(
    "q_stratified_sample",
    # portable md5-derived hash gate: pmod(h, 10000) < rate*10000.
    # Integer arithmetic — exactly reproducible in any ANSI engine.
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_sampled,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
    FROM customer
    WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 10000 < 2000
    GROUP BY c_mktsegment
    """,
    desc="deterministic 20%% stratified sample via a portable hash gate "
         "on the row key: no rand(), no shuffle, identical sample on "
         "every run and every engine — the reproducible-subset "
         "primitive for training-data pipelines.",
    tags=["sampling"],
)
def q_stratified_sample(spark, sf_dir):
    from ..operators.dedup import portable_hash60

    c = tables.load(spark, sf_dir, "customer")
    gate = F.pmod(portable_hash60(col("c_custkey").cast("string")), lit(10000))
    return (
        c.filter(gate < 2000)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("bal_sum"),
        )
    )


@q(
    "q_mix_resample",
    oracle="""
    WITH langs AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS gate
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept
    FROM langs
    WHERE gate < (CASE lang
                 WHEN 'en' THEN 5000 WHEN 'de' THEN 10000
                 WHEN 'fr' THEN 2500 ELSE 1000 END)
    GROUP BY lang
    """,
    desc="corpus mixing by per-language sampling rates (hash-gated, "
         "deterministic): the down-sampling half of temperature-based "
         "data mixing for training corpora; no shuffle until the "
         "final count.",
    tags=["sampling", "mixing"],
)
def q_mix_resample(spark, sf_dir):
    from ..operators.dedup import portable_hash60

    docs = tables.load(spark, sf_dir, "documents")
    gate = F.pmod(portable_hash60(col("doc_id").cast("string")), lit(10000))
    # rates in integer basis points: float*int casts truncate in Spark
    # but round in DuckDB — integers sidestep the divergence entirely
    rate_bps = F.when(col("lang") == "en", lit(5000)) \
        .when(col("lang") == "de", lit(10000)) \
        .when(col("lang") == "fr", lit(2500)) \
        .otherwise(lit(1000))
    kept = docs.filter(gate < rate_bps)
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


# ---------------------------------------------------------------------
# sequence packing: concatenate-then-chop at a fixed token budget (the
# standard LLM pretraining packing); bins assigned arithmetically from
# a partitioned window cumsum — one shuffle, no stateful pass
# ---------------------------------------------------------------------


@q(
    "q_pack_sequences",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before
      FROM d
    )
    SELECT lang, CAST(floor(cum_before / 512) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY lang, bin
    """,
    desc="sequence packing (concat-and-chop at a 512-token budget): "
         "bin = floor(cumulative-tokens-before / budget) per language "
         "stream — per-key windows keep the cumsum partition-parallel.",
    tags=["text", "packing"],
)
def q_pack_sequences(spark, sf_dir):
    from ..operators.text import pack_bins

    docs = tables.load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.trim(col("text")), r"[ \t\n\x0B\f\r]+")).cast("long").alias("n_tok"),
    )
    packed = pack_bins(d, token_col="n_tok", order_col="doc_id", budget=512, key_cols=["lang"])
    return (
        packed.groupBy("lang", col("_bin").alias("bin"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


# ---------------------------------------------------------------------
# corpus hygiene: boilerplate n-grams and test-set contamination
# ---------------------------------------------------------------------


@q(
    "q_top_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS t FROM documents
    ),
    sh AS (
      -- docs under 3 tokens emit NO grams (range is empty), so short
      -- docs can't pollute the 3-gram counts with 1-/2-grams
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
      FROM toks WHERE len(t) >= 3
    )
    SELECT g AS ngram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
    FROM sh GROUP BY g
    ORDER BY n_occ DESC, ngram LIMIT 20
    """,
    desc="corpus-level top-20 3-grams by occurrence (boilerplate / "
         "template detector): explode + map-side-combinable counts + "
         "TakeOrdered — no global sort.",
    tags=["text", "ngram"],
)
def q_top_ngrams(spark, sf_dir):
    from pyspark.sql import Window

    docs = tables.load(spark, sf_dir, "documents")
    t = F.split(F.trim(col("text")), r"[ \t\n\x0B\f\r]+")
    # sliding trigrams via posexplode + LEAD windows instead of a
    # transform(sequence) array build: the interpreted higher-order
    # function allocated a ~len-sized string array per doc (measured
    # 3x slower end-to-end) and its exploded trigrams shuffled at 3x
    # the token bytes; here ONE doc_id shuffle moves plain tokens and
    # the trigram string is assembled post-shuffle. Docs under 3
    # tokens drop out naturally (lead(w, 2) is null).
    posed = docs.select("doc_id", F.posexplode(t).alias("p", "w"))
    wn = Window.partitionBy("doc_id").orderBy("p")
    sh = posed.select(
        "doc_id",
        F.concat_ws(
            " ", col("w"), F.lead("w", 1).over(wn), F.lead("w", 2).over(wn)
        ).alias("ngram"),
        F.lead("w", 2).over(wn).alias("w2"),
    ).filter(col("w2").isNotNull()).drop("w2")
    # two-level aggregate instead of countDistinct: avoids the Expand
    # (2x row duplication) plan; both shuffles are map-side combinable
    per_doc = sh.groupBy("ngram", "doc_id").agg(F.count("*").alias("n_in_doc"))
    return (
        per_doc.groupBy("ngram")
        .agg(F.sum("n_in_doc").alias("n_occ"), F.count("*").alias("n_docs"))
        .orderBy(col("n_occ").desc(), "ngram")
        .limit(20)
    )


_PROBES = ["stream table hash", "row column sort", "window fast query"]


@q(
    "q_contamination",
    oracle="""
    SELECT doc_id, lang,
           CAST(contains(text, 'stream table hash') AS INTEGER)
         + CAST(contains(text, 'row column sort') AS INTEGER)
         + CAST(contains(text, 'window fast query') AS INTEGER) AS n_probe_hits
    FROM documents
    WHERE contains(text, 'stream table hash')
       OR contains(text, 'row column sort')
       OR contains(text, 'window fast query')
    """,
    desc="test-set contamination scan: documents containing any of a "
         "broadcast probe-phrase list, with per-doc hit counts — plain "
         "substring predicates stay in whole-stage codegen (for large "
         "probe sets swap in an Aho-Corasick pandas UDF).",
    tags=["text", "contamination"],
)
def q_contamination(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    hits = [F.when(col("text").contains(p), 1).otherwise(0) for p in _PROBES]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    return (
        docs.select("doc_id", "lang", total.cast("int").alias("n_probe_hits"))
        .filter(col("n_probe_hits") > 0)
    )


# ---------------------------------------------------------------------
# content-defined chunking (rolling-hash boundaries): chunk-level
# fingerprints power passage-level dedup of training corpora
# ---------------------------------------------------------------------


@q(
    "q_chunk_stats",
    # integer arithmetic end-to-end (portable md5-derived token hash,
    # cumulative-sum chunk ids) — fully deterministic.
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS t FROM documents
    ),
    tok AS (
      SELECT doc_id,
             unnest(range(1, len(t) + 1)) AS pos,
             unnest(t) AS w
      FROM toks
    ),
    b AS (
      SELECT doc_id, pos,
             CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT % 8 = 0
                  THEN 1 ELSE 0 END AS bnd
      FROM tok
    ),
    ch AS (
      SELECT doc_id, pos,
             SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS chunk
      FROM b
    ),
    per_chunk AS (
      SELECT doc_id, chunk, COUNT(*) AS clen FROM ch GROUP BY doc_id, chunk
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(clen) AS BIGINT) AS n_tokens,
           CAST(MAX(clen) AS BIGINT) AS max_chunk_len
    FROM per_chunk GROUP BY doc_id
    """,
    desc="content-defined chunking: rolling-hash token boundaries "
         "(portable md5-derived hash % 8) split each document into "
         "chunks; per-doc chunk stats. Chunk-level fingerprints are "
         "the unit for passage-level dedup of training corpora.",
    tags=["text", "chunking"],
)
def q_chunk_stats(spark, sf_dir):
    from ..operators.dedup import portable_hash60

    docs = tables.load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.trim(col("text")), r"[ \t\n\x0B\f\r]+")).alias("pos", "w")
    )
    bnd = tok.withColumn(
        "bnd", (F.pmod(portable_hash60(col("w")), lit(8)) == 0).cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    ch = bnd.withColumn("chunk", F.sum("bnd").over(w))
    per_chunk = ch.groupBy("doc_id", "chunk").agg(F.count("*").alias("clen"))
    return per_chunk.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("clen").alias("n_tokens"),
        F.max("clen").alias("max_chunk_len"),
    )
