"""Sixty-seventh-wave query inventory: representation quality — the
LABEL-SEPARATION audit (mean intra-label vs inter-label cosine,
both EXACT via centroid algebra over per-component sums: the
one-pass check that the embedding space actually separates the
classes — q_embedding_anisotropy says whether cosine means anything
at all, this says whether it means the LABELS) and LEAVE-ONE-OUT
1-NN EVALUATION (every vector classified by its nearest other
vector's label: the classic nonparametric accuracy bound, per-label
— the model-free twin of q_centroid_confusion whose centroid
classifier underfits multi-modal classes that 1-NN handles).

Determinism discipline: unit components quantize onto the
engine-identical FLOOR(x*1e8+0.5) integer grid and all cross-row
sums are exact decimal (per label-component, then globally per
component by summing the label
decimals); squared sums quantize again before the 64-term closing
sums; LOO predictions come from exact BLAS cosines with neighbor-id
tie-breaks and all accuracies are exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_label_separation",
    oracle="""
    WITH norms AS (
      SELECT label,
             list_transform(CAST(embedding AS DOUBLE[]), x -> FLOOR((x) * 1e6 + 0.5) / 1e6)
               AS vec,
             SQRT(CAST(list_sum(list_transform(
                    CAST(embedding AS DOUBLE[]),
                    x -> CAST(FLOOR(FLOOR((x) * 1e6 + 0.5) / 1e6 * FLOOR((x) * 1e6 + 0.5) / 1e6 * 1e12 + 0.5)
                              AS DECIMAL(38,0)))) AS DOUBLE) / 1e12) AS l2
      FROM embeddings
    ), comps AS (
      SELECT label, generate_subscripts(vec, 1) AS pos,
             CAST(FLOOR(unnest(vec) / l2 * 1e8 + 0.5) AS DECIMAL(28,0)) AS u
      FROM norms
    ), lp AS (
      SELECT label, pos, CAST(SUM(u) AS DECIMAL(19,0)) AS s, COUNT(*) AS nl
      FROM comps GROUP BY label, pos
    ), per_label AS (
      SELECT label, MAX(nl) AS nl, SUM(s * s) AS t
      FROM lp GROUP BY label
    ), intra AS (
      SELECT SUM(t - CAST(nl AS DECIMAL(19,0)) * 10000000000000000)
               AS intra_int,
             SUM(nl * (nl - 1)) AS intra_pairs,
             SUM(nl * nl) AS sum_nl2,
             COUNT(*) AS n_labels
      FROM per_label
    ), allsum AS (
      SELECT SUM(sg * sg) AS norm2_int, MAX(n) AS n
      FROM (
        SELECT pos, CAST(SUM(s) AS DECIMAL(19,0)) AS sg, SUM(nl) AS n
        FROM lp GROUP BY pos
      )
    )
    SELECT CAST(a.n AS BIGINT) AS n_vectors,
           CAST(i.n_labels AS BIGINT) AS n_labels,
           (CAST(i.intra_int AS DOUBLE) / 1e16 / i.intra_pairs)
             AS mean_intra_cosine,
           (CAST(a.norm2_int - CAST(a.n AS DECIMAL(19,0))
                   * 10000000000000000 - i.intra_int AS DOUBLE) / 1e16
                 / (CAST(a.n AS DOUBLE) * a.n - i.sum_nl2))
             AS mean_inter_cosine,
           (CAST(i.intra_int AS DOUBLE) / 1e16 / i.intra_pairs
                 - CAST(a.norm2_int - CAST(a.n AS DECIMAL(19,0))
                        * 10000000000000000 - i.intra_int AS DOUBLE) / 1e16
                   / (CAST(a.n AS DOUBLE) * a.n - i.sum_nl2))
             AS separation
    FROM intra i, allsum a
    """,
    desc="Label-separation audit in ONE pass: mean intra-label and "
         "mean inter-label cosine of unit vectors via centroid "
         "algebra — intra = sum_labels(||sum_l u||^2 - n_l) over the "
         "ordered intra pairs, inter = (||sum_all u||^2 - N - intra) "
         "over N^2 - sum n_l^2 — so the class-geometry check costs "
         "per-component decimal sums, never a pair join (the O(N^2) "
         "truth is what q_knn_loo_eval then confirms "
         "nonparametrically). separation = intra - inter; near 0 "
         "means cosine retrieval cannot see the labels. Unit "
         "components quantize onto the engine-identical "
         "FLOOR(x*1e8 + 0.5) integer grid; label sums add EXACTLY "
         "into the global component sums and both squarings are "
         "exact decimal arithmetic — no quantizer after the grid. Shuffles only (label, pos, decimal) partials.",
    tags=["vector", "stats", "agg", "cross"],
)
def q_label_separation(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    # r9: every derived-double quantizer uses the engine-identical
    # integer grid FLOOR(x*K + 0.5); s is then an exact integer on the
    # 1e-8 grid, so both squarings and the inter numerator are EXACT
    # decimal arithmetic with no quantizer at all
    sq = F.aggregate(
        F.transform(
            col("embedding"),
            lambda x: F.floor(
                (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)) * (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                * lit(1e12) + lit(0.5)
            ).cast("decimal(38,0)"),
        ),
        lit(0).cast("decimal(38,0)"),
        lambda acc, v: (acc + v).cast("decimal(38,0)"),
    )
    norms = emb.select(
        "label",
        F.transform(col("embedding"), lambda x: (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)))
        .alias("vec"),
        F.sqrt(sq.cast("double") / lit(1e12)).alias("l2"),
    )
    comps = norms.select(
        "label", F.posexplode("vec").alias("pos0", "comp"), "l2"
    ).select(
        "label", (col("pos0") + 1).alias("pos"),
        F.floor(col("comp") / col("l2") * lit(1e8) + lit(0.5))
        .cast("decimal(28,0)").alias("u"),
    )
    lp = comps.groupBy("label", "pos").agg(
        F.sum("u").cast("decimal(19,0)").alias("s"), F.count("*").alias("nl")
    )
    one_e16 = lit(10000000000000000).cast("decimal(19,0)")
    per_label = lp.groupBy("label").agg(
        F.max("nl").alias("nl"),
        F.sum(col("s") * col("s")).alias("t"),
    )
    intra = per_label.agg(
        F.sum(col("t") - col("nl").cast("decimal(19,0)") * one_e16)
        .alias("intra_int"),
        F.sum(col("nl") * (col("nl") - 1)).alias("intra_pairs"),
        F.sum(col("nl") * col("nl")).alias("sum_nl2"),
        F.count("*").alias("n_labels"),
    )
    gsum = lp.groupBy("pos").agg(
        F.sum("s").cast("decimal(19,0)").alias("sg"), F.sum("nl").alias("n")
    )
    allsum = gsum.agg(
        F.sum(col("sg") * col("sg")).alias("norm2_int"),
        F.max("n").alias("n"),
    )
    j = intra.crossJoin(broadcast(allsum))
    nd = col("n").cast("double")
    mean_intra = col("intra_int").cast("double") / lit(1e16) / col("intra_pairs")
    inter_num = (col("norm2_int") - col("n").cast("decimal(19,0)") * one_e16
                 - col("intra_int"))
    mean_inter = inter_num.cast("double") / lit(1e16) / (
        nd * col("n") - col("sum_nl2")
    )
    return j.select(
        col("n").cast("long").alias("n_vectors"),
        col("n_labels").cast("long").alias("n_labels"),
        (mean_intra).alias("mean_intra_cosine"),
        (mean_inter).alias("mean_inter_cosine"),
        (mean_intra - mean_inter).alias("separation"),
    )


@q(
    "q_knn_loo_eval",
    oracle="""
    WITH scored AS (
      SELECT a.vec_id, a.label AS true_label, b.label AS pred_label,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id) AS rnk
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) FILTER (WHERE pred_label = true_label) AS BIGINT)
             AS n_correct,
           (CAST(COUNT(*) FILTER (WHERE pred_label = true_label)
                      AS DOUBLE) / COUNT(*)) AS loo_accuracy
    FROM scored WHERE rnk = 1
    GROUP BY true_label ORDER BY true_label
    """,
    desc="Leave-one-out 1-NN accuracy per label: each vector is "
         "classified by its nearest OTHER vector's label (cosine, "
         "neighbor-id tie-break) — the classic nonparametric "
         "evaluation whose asymptotic error is at most twice Bayes "
         "error; per-label accuracy exposes the classes that "
         "q_centroid_confusion's single-centroid classifier "
         "misreads when a class is multi-modal. Spark side uses the "
         "grid-blocked BLAS kernel (operators/similarity.knn_all): "
         "single-block corpora broadcast the whole normalized index "
         "(zero shuffle); larger ones run ONE block-pair-bucket job "
         "(r8), bucket-local top-1 candidates, final per-row rank — "
         "never an N^2 pair shuffle; the "
         "oracle IS the O(N^2) definition. Accuracies are exact "
         "integer ratios.",
    tags=["similarity", "stats", "agg"],
)
def q_knn_loo_eval(spark, sf_dir):
    from ..operators import similarity as S

    emb = tables.load(spark, sf_dir, "embeddings")
    nn = S.knn_all(emb, k=1).select("qid", "nid")
    labels = emb.select("vec_id", "label")
    true_l = labels.select(
        col("vec_id").alias("qid"), col("label").alias("true_label")
    )
    pred_l = labels.select(
        col("vec_id").alias("nid"), col("label").alias("pred_label")
    )
    scored = nn.join(broadcast(true_l), "qid").join(broadcast(pred_l), "nid")
    return (
        scored.groupBy(col("true_label").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.count(F.when(col("pred_label") == col("true_label"), 1))
            .cast("long").alias("n_correct"),
            (F.count(F.when(col("pred_label") == col("true_label"), 1))
                .cast("double") / F.count("*")).alias("loo_accuracy"),
        )
        .orderBy("label")
    )
