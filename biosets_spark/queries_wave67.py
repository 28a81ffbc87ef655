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

Determinism discipline: unit components quantize ROUND(,8)->
DECIMAL(28,8) and all cross-row sums are decimal (per label-
component, then globally per component by summing the label
decimals); squared sums quantize again before the 64-term closing
sums; LOO predictions come from exact BLAS cosines with neighbor-id
tie-breaks and all accuracies are exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from . import tables
from .queries import q


@q(
    "q_label_separation",
    oracle="""
    WITH norms AS (
      SELECT label,
             list_transform(CAST(embedding AS DOUBLE[]), x -> ROUND(x, 6))
               AS vec,
             SQRT(CAST(list_sum(list_transform(
                    CAST(embedding AS DOUBLE[]),
                    x -> CAST(ROUND(ROUND(x, 6) * ROUND(x, 6), 12)
                              AS DECIMAL(38,12)))) AS DOUBLE)) AS l2
      FROM embeddings
    ), comps AS (
      SELECT label, generate_subscripts(vec, 1) AS pos,
             CAST(ROUND(unnest(vec) / l2, 8) AS DECIMAL(28,8)) AS u
      FROM norms
    ), lp AS (
      SELECT label, pos, SUM(u) AS s, COUNT(*) AS nl
      FROM comps GROUP BY label, pos
    ), per_label AS (
      SELECT label, MAX(nl) AS nl,
             CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 10)
                           AS DECIMAL(38,10))) AS DOUBLE) AS t
      FROM lp GROUP BY label
    ), intra AS (
      SELECT CAST(SUM(CAST(ROUND(t - nl, 8) AS DECIMAL(28,8))) AS DOUBLE)
               AS intra_sum,
             SUM(nl * (nl - 1)) AS intra_pairs,
             SUM(nl * nl) AS sum_nl2,
             COUNT(*) AS n_labels
      FROM per_label
    ), allsum AS (
      SELECT CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE), 10)
                           AS DECIMAL(38,10))) AS DOUBLE) AS norm2,
             MAX(n) AS n
      FROM (
        SELECT pos, SUM(s) AS sg, SUM(nl) AS n FROM lp GROUP BY pos
      )
    )
    SELECT CAST(a.n AS BIGINT) AS n_vectors,
           CAST(i.n_labels AS BIGINT) AS n_labels,
           ROUND(i.intra_sum / i.intra_pairs, 6) AS mean_intra_cosine,
           ROUND((a.norm2 - a.n - i.intra_sum)
                 / (CAST(a.n AS DOUBLE) * a.n - i.sum_nl2), 6)
             AS mean_inter_cosine,
           ROUND(i.intra_sum / i.intra_pairs
                 - (a.norm2 - a.n - i.intra_sum)
                   / (CAST(a.n AS DOUBLE) * a.n - i.sum_nl2), 6)
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
         "components quantize ROUND(,8)->DECIMAL(28,8); label sums "
         "add EXACTLY into the global component sums (decimal "
         "addition); both squarings quantize before their closing "
         "sums. Shuffles only (label, pos, decimal) partials.",
    tags=["vector", "stats", "agg", "cross"],
)
def q_label_separation(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(
            col("embedding"),
            lambda x: F.round(
                F.round(x.cast("double"), 6) * F.round(x.cast("double"), 6), 12
            ).cast("decimal(38,12)"),
        ),
        lit(0).cast("decimal(38,12)"),
        lambda acc, v: (acc + v).cast("decimal(38,12)"),
    )
    norms = emb.select(
        "label",
        F.transform(col("embedding"), lambda x: F.round(x.cast("double"), 6))
        .alias("vec"),
        F.sqrt(sq.cast("double")).alias("l2"),
    )
    comps = norms.select(
        "label", F.posexplode("vec").alias("pos0", "comp"), "l2"
    ).select(
        "label", (col("pos0") + 1).alias("pos"),
        F.round(col("comp") / col("l2"), 8).cast("decimal(28,8)").alias("u"),
    )
    lp = comps.groupBy("label", "pos").agg(
        F.sum("u").alias("s"), F.count("*").alias("nl")
    )
    sd = col("s").cast("double")
    per_label = lp.groupBy("label").agg(
        F.max("nl").alias("nl"),
        F.sum(F.round(sd * sd, 10).cast("decimal(38,10)")).cast("double")
        .alias("t"),
    )
    intra = per_label.agg(
        F.sum(F.round(col("t") - col("nl"), 8).cast("decimal(28,8)"))
        .cast("double").alias("intra_sum"),
        F.sum(col("nl") * (col("nl") - 1)).alias("intra_pairs"),
        F.sum(col("nl") * col("nl")).alias("sum_nl2"),
        F.count("*").alias("n_labels"),
    )
    gsum = lp.groupBy("pos").agg(
        F.sum("s").alias("sg"), F.sum("nl").alias("n")
    )
    sgd = col("sg").cast("double")
    allsum = gsum.agg(
        F.sum(F.round(sgd * sgd, 10).cast("decimal(38,10)")).cast("double")
        .alias("norm2"),
        F.max("n").alias("n"),
    )
    j = intra.crossJoin(broadcast(allsum))
    nd = col("n").cast("double")
    mean_intra = col("intra_sum") / col("intra_pairs")
    mean_inter = (col("norm2") - col("n") - col("intra_sum")) / (
        nd * col("n") - col("sum_nl2")
    )
    return j.select(
        col("n").cast("long").alias("n_vectors"),
        col("n_labels").cast("long").alias("n_labels"),
        F.round(mean_intra, 6).alias("mean_intra_cosine"),
        F.round(mean_inter, 6).alias("mean_inter_cosine"),
        F.round(mean_intra - mean_inter, 6).alias("separation"),
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
           ROUND(CAST(COUNT(*) FILTER (WHERE pred_label = true_label)
                      AS DOUBLE) / COUNT(*), 6) AS loo_accuracy
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
    from .operators import similarity as S

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
            F.round(
                F.count(F.when(col("pred_label") == col("true_label"), 1))
                .cast("double") / F.count("*"), 6
            ).alias("loo_accuracy"),
        )
        .orderBy("label")
    )
