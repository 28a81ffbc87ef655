"""Twentieth-wave query inventory: clustering / graph / rule-mining
closures — nearest-centroid confusion (the k-means E-step as a query),
the near-dup pair-graph degree distribution, association-rule lift,
and calendar interval-overlap aggregation.

Determinism discipline follows queries.py: vector components are
rounded to 6 decimals BEFORE any arithmetic so both engines score the
exact same numbers; distances are used only for ORDERING (argmin with
a full tie-break), never output; lift is computed from exact integer
counts; interval overlap is whole-day integer arithmetic end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, pair_expand, q


@q(
    "q_centroid_confusion",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]), x -> FLOOR((x) * 1e6 + 0.5) / 1e6) AS vec
      FROM embeddings
    ), comps AS (
      SELECT label, generate_subscripts(vec, 1) AS pos, unnest(vec) AS comp FROM v
    ), cent AS (
      SELECT label AS c_label, pos,
             (CAST(SUM(CAST(comp AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*)) AS c
      FROM comps GROUP BY label, pos
    ), cvec AS (
      SELECT c_label, list(c ORDER BY pos) AS cv FROM cent GROUP BY c_label
    ), scored AS (
      SELECT v.vec_id, v.label, cvec.c_label,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, cvec.cv), cvec.c_label) AS rn
      FROM v CROSS JOIN cvec
    )
    SELECT c_label AS assigned, label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scored WHERE rn = 1
    GROUP BY c_label, label ORDER BY assigned, label
    """,
    desc="Nearest-centroid confusion matrix: per-label centroids over "
         "all 64 dims (components 6-dec rounded, then decimal-summed — "
         "identical centroids on both engines), every vector assigned "
         "to its closest centroid (argmin of euclidean distance with a "
         "label tie-break; the distance itself is never output), "
         "counts per (assigned, true label). This is one E-step of "
         "Lloyd's k-means AND the cluster-coherence audit of the "
         "embedding space. Scale: the centroid table is k rows — a "
         "deliberate k-row broadcast nested loop (tagged cross) — and "
         "the fold runs as a JVM higher-order expression, so the scan "
         "is one pass with no Python. Recomputing centroids from "
         "assignments (the M-step) is q_label_centroids' shape keyed "
         "on 'assigned'.",
    tags=["vector", "agg", "window", "cross"],
)
def q_centroid_confusion(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform(col("embedding"), lambda x: (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))).alias("vec"),
    )
    comps = emb.select("label", F.posexplode("vec").alias("pos", "comp"))
    cent = (
        comps.groupBy("label", "pos")
        .agg(
            (F.sum(col("comp").cast("decimal(18,8)")).cast("double") / F.count("*")).alias("c")
        )
    )
    cvec = (
        cent.groupBy(col("label").alias("c_label"))
        .agg(F.sort_array(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("c_label", F.transform(col("pc"), lambda s: s["c"]).alias("cv"))
    )
    scored = emb.crossJoin(broadcast(cvec)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with(col("vec"), col("cv"), lambda x, y: (x - y) * (x - y)),
            lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "c_label")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .groupBy(col("c_label").alias("assigned"), "label")
        .agg(F.count("*").alias("n"))
        .orderBy("assigned", "label")
    )


# The bounded-Jaccard pair set (q_dedup_ngram_jaccard_bounded's
# oracle) reused as a CTE so the degree distribution is differentially
# checked over the exact same graph.
_PAIRS_SQL = """
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
        WHERE df.d <= 50
      ),
      cnt AS (SELECT doc_id, COUNT(*) n FROM kept GROUP BY 1),
      pairs AS (
        SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) common
        FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      edge AS (
        SELECT id_a, id_b
        FROM pairs JOIN cnt ca ON pairs.id_a = ca.doc_id
                   JOIN cnt cb ON pairs.id_b = cb.doc_id
        WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5
      )
"""


@q(
    "q_dup_graph_degree",
    oracle=_PAIRS_SQL + """
    , deg AS (
      SELECT doc_id, COUNT(*) AS degree FROM (
        SELECT id_a AS doc_id FROM edge
        UNION ALL
        SELECT id_b AS doc_id FROM edge
      ) GROUP BY doc_id
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree ORDER BY degree
    """,
    desc="Degree distribution of the near-duplicate pair graph (the "
         "bounded n-gram Jaccard edge set): how many documents have 1, "
         "2, ... near-dup partners. The shape a dedup rollout reads "
         "before choosing keep-one-per-cluster vs drop-all — a heavy "
         "right tail means hub documents (templates/boilerplate) that "
         "connected components will agglomerate into giant clusters. "
         "Pairs explode to two endpoint rows, then two combinable "
         "counts; everything past the (already df-bounded) pair join "
         "is linear in edges.",
    tags=["dedup", "ngram", "graph", "agg"],
)
def q_dup_graph_degree(spark, sf_dir):
    from ..operators import dedup as D

    docs = tables.load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=4, threshold=0.5, max_shingle_df=50)
    ends = pairs.select(col("id_a").alias("doc_id")).unionAll(
        pairs.select(col("id_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree").agg(F.count("*").alias("n_docs")).orderBy("degree")
    )


@q(
    "q_lift_rules",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM lineitem),
    supp AS (SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           (CAST(n_ab AS DOUBLE) * n_baskets / (sa.n * sb.n)) AS lift
    FROM pair
    JOIN supp sa ON pair.part_a = sa.l_partkey
    JOIN supp sb ON pair.part_b = sb.l_partkey
    CROSS JOIN nb
    WHERE n_ab >= 2
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
    desc="Association-rule lift: top-20 part pairs by "
         "lift = P(a,b) / (P(a) P(b)), minimum co-occurrence 2 (a "
         "1-support pair's lift is pure noise). Pairs come from "
         "q_basket_pairs' basket-local expansion (ONE shuffle to "
         "collect each order's sorted item set, C(k,2) struct pairs "
         "generated JVM-side per basket — no fact-fact self-join); "
         "per-item supports join back (key-partitioned; "
         "broadcastable when the item dimension is small) and the "
         "basket total is the deliberate 1-row broadcast. Lift is "
         "computed from exact integer counts in one double "
         "expression — no accumulation — and the top-20 is "
         "TakeOrdered with a full tie-break.",
    tags=["join", "agg", "cross"],
)
def q_lift_rules(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # one shuffle on the order key: collect_set dedups (order, part) and
    # the sorted array generates each basket's C(k,2) ordered pairs
    # in-task — the former items-self-join shuffled the fact table
    # twice and sorted both sides (measured at sf0.1: cold 4.6 ->
    # 3.3 s). Skew bound is identical: a k-item basket produces k^2/2
    # pairs on one key either way, with k <= basket size.
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    nb = baskets.agg(F.count("*").alias("n_baskets"))
    supp = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
    )
    pair = (
        pair_expand(baskets, "items", "part_a", "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(col("n_ab") >= 2)
    )
    sa = supp.select(col("l_partkey").alias("part_a"), col("n").alias("na"))
    sb = supp.select(col("l_partkey").alias("part_b"), col("n").alias("nb"))
    return (
        pair.join(sa, "part_a").join(sb, "part_b").crossJoin(broadcast(nb))
        .select(
            "part_a", "part_b", "n_ab",
            (col("n_ab").cast("double") * col("n_baskets") / (col("na") * col("nb"))).alias("lift"),
        )
        .orderBy(col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@q(
    "q_interval_overlap",
    oracle="""
    WITH months AS (
      SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-12-01',
                                         INTERVAL 1 MONTH)) AS DATE) AS m_start
    ), m AS (
      SELECT m_start, CAST(m_start + INTERVAL 1 MONTH AS DATE) AS m_end FROM months
    ), iv AS (
      SELECT CAST(o_orderdate AS DATE) AS ship, CAST(l_shipdate AS DATE) AS receipt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    )
    SELECT m_start AS month,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(date_diff('day',
                    GREATEST(m_start, ship),
                    LEAST(m_end, receipt + 1))) AS BIGINT)
             AS overlap_days
    FROM iv JOIN m
      ON ship < m_end AND receipt >= m_start
    GROUP BY m_start ORDER BY m_start
    """,
    desc="Interval-overlap aggregation: how many open-order days each "
         "1996 calendar month absorbed, per lineitem's inclusive "
         "[orderdate, shipdate] fulfillment interval clipped against "
         "half-open month windows via GREATEST/LEAST — whole-day "
         "integer arithmetic end-to-end, nothing to round. The month "
         "grid is 12 rows broadcast (tagged cross/range: the overlap "
         "predicate is a band join); the fact-fact join is the "
         "co-partitioned q_ship_latency_histogram SMJ with both scans "
         "year-pruned. The same clip expression prices any resource-"
         "occupancy question (sessions x campaign windows, GPU "
         "reservations x billing periods).",
    tags=["range", "agg", "cross", "join"],
)
def q_interval_overlap(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", col("o_orderdate").cast("date").alias("ship")
    ).filter(col("ship") < lit("1997-01-01").cast("date"))
    l = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", col("l_shipdate").cast("date").alias("receipt")
    ).filter(col("receipt") >= lit("1996-01-01").cast("date"))
    li = l.join(o, col("l_orderkey") == col("o_orderkey")).select("ship", "receipt")
    months = spark.range(12).select(
        F.add_months(lit("1996-01-01").cast("date"), col("id").cast("int")).alias("m_start")
    ).withColumn("m_end", F.add_months(col("m_start"), 1))
    joined = li.join(
        broadcast(months),
        (col("ship") < col("m_end")) & (col("receipt") >= col("m_start")),
    )
    overlap = F.datediff(
        F.least(col("m_end"), F.date_add(col("receipt"), 1)),
        F.greatest(col("m_start"), col("ship")),
    )
    return (
        joined.groupBy(col("m_start").alias("month"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(overlap).alias("overlap_days"),
        )
        .orderBy("month")
    )
