"""Connected components over a pair list — dedup clustering.

Near-dup detectors (minhash/simhash/ngram/embedding, operators/
dedup.py) emit PAIRS; deduplication needs CLUSTERS (keep one doc per
connected component of the similarity graph). This is the standard
large-scale formulation: iterative min-label propagation
("hash-to-min") over DataFrames.

Each iteration joins the current labels across edges and keeps the
minimum — a pure shuffle-on-key plan, no driver-side union-find, so it
scales to edge lists that don't fit on one machine. Plain min-label
propagation converges in O(diameter) iterations (NOT O(log diameter)
— that requires large-star/small-star edge rewriting); near-dup
graphs are almost always star/clique shaped (diameter 1-2), so 2-3
iterations in practice. Long-chain graphs need ``max_iterations`` of
at least the graph diameter; the loop raises if the fixpoint is not
reached rather than silently returning wrong labels.

Not SQL-expressible in one statement (iterative) -> correctness is
pinned by pytest on planted clusters rather than the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the executor storage behind a localCheckpoint'ed
    DataFrame. ``df.unpersist()`` is a no-op for checkpoints (the RDD
    is persisted outside the CacheManager); the handle lives on the
    LogicalRDD plan node. Safe to call on anything — silently does
    nothing when the plan isn't a checkpoint."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 20,
    on_nonconvergence: str = "raise",
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Label every node in the pair graph with its component's min id.

    Returns (node, component). Iterates min-label propagation until a
    fixpoint (checked via a cheap count of label changes). If the
    fixpoint is not reached within ``max_iterations`` the labels are
    WRONG (some nodes still carry a non-minimal label); by default
    this raises — pass ``on_nonconvergence="warn"`` to get the
    partial labels with a warning instead.

    Strategy switch (the broadcast-join pattern applied to iteration):
    the symmetrized-distinct edge list is counted first; at or below
    ``small_graph_threshold`` edges (bounded: 100k edge tuples ≈ a few
    MB) the components are solved with one driver-side union-find pass
    over the collected edges — identical labels, none of the per-
    iteration join/checkpoint/fixpoint-count jobs. Above the threshold
    the distributed min-label loop below runs unchanged; at 100 TB a
    detector emitting MORE than 100k pairs is exactly the regime the
    iterative plan exists for, while a detector emitting a handful of
    pairs (the common converged-corpus case) no longer pays 2 rounds
    of shuffle for a graph that fits in one task. Pass
    ``small_graph_threshold=0`` to force the distributed path.

    Storage note: the returned frame is backed by the FINAL
    iteration's localCheckpoint, which stays pinned on the executors
    (intermediate rounds are freed as the loop runs). Long-running
    sessions that call this repeatedly should release it once the
    result is materialized/persisted:
    ``free_local_checkpoint(result)`` (as embedding_dup_pairs does).
    """
    if on_nonconvergence not in ("raise", "warn"):
        raise ValueError("on_nonconvergence must be 'raise' or 'warn'")
    edges = (
        pairs.select(col(a_col).alias("u"), col(b_col).alias("v"))
        .union(pairs.select(col(b_col).alias("u"), col(a_col).alias("v")))
        # a null endpoint carries no similarity information; dropping
        # it up front keeps the two strategies' outputs identical (a
        # null would TypeError in the union-find and produce an inert
        # orphan row in the join path — r6 review)
        .dropna()
        .distinct()
        .cache()
    )
    n_edges = edges.count()
    if n_edges <= small_graph_threshold:
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            u, v = r["u"], r["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict = {}
        for node in parent:
            root = find(node)
            cur = comp_min.get(root)
            if cur is None or node < cur:
                comp_min[root] = node
        out_schema = (
            edges.select(
                col("u").alias("node"), col("u").alias("component")
            ).schema
        )
        out = pairs.sparkSession.createDataFrame(
            [(n, comp_min[find(n)]) for n in parent], out_schema
        )
        edges.unpersist()
        return out

    labels = edges.select("u").distinct().withColumn("component", col("u")).cache()

    changed = 1
    for _ in range(max_iterations):
        # candidate labels: own label + min neighbor label (aliases
        # break the shared lineage of the edge-derived frames)
        neighbor_labels = (
            edges.alias("e")
            .join(labels.alias("l"), col("e.v") == col("l.u"))
            .select(col("e.u").alias("u"), col("l.component").alias("component"))
        )
        # localCheckpoint (not cache): materializes AND truncates the
        # logical plan, so planning cost stays constant per iteration
        # instead of growing with the accumulated iterative lineage —
        # at 50+ rounds the un-truncated plan is itself a bottleneck
        new_labels = (
            labels.select("u", "component")
            .union(neighbor_labels)
            .groupBy("u")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.select(col("u").alias("nu"), col("component").alias("nc"))
            .join(labels.select(col("u").alias("ou"), col("component").alias("oc")), col("nu") == col("ou"))
            .filter(col("nc") != col("oc"))
            .limit(1)
            .count()
        )
        # frees the cached round-0 labels AND each round's checkpoint
        # (unpersist() alone is a no-op for checkpointed frames)
        labels.unpersist()
        free_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iterations} "
            "iterations (plain min-label propagation needs O(graph "
            "diameter) rounds); raise max_iterations"
        )
        if on_nonconvergence == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(col("u").alias("node"), "component")


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Full dedup decision: every row of ``df`` labeled with its cluster
    representative (min id of its similarity component; singleton rows
    represent themselves) and a ``keep`` flag.

    Compose with any pair detector:
        pairs = minhash_lsh_pairs(docs, threshold=0.8)
        decided = dedup_clusters(docs, pairs)
        kept = decided.filter("keep")
    """
    comp = connected_components(pairs, a_col, b_col)
    out = (
        df.join(comp, df[id_col] == comp.node, "left")
        .withColumn("cluster_id", F.coalesce(col("component"), col(id_col)))
        .drop("node", "component")
    )
    return out.withColumn("keep", col(id_col) == col("cluster_id"))
