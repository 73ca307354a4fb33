"""Link analysis: PageRank and HITS as iterative DataFrame joins.

The reference builds DENSE numpy adjacency matrices — O(n²) memory
(/root/reference/utils/pagerank.py:16-31, utils/hits.py:16-35), which
caps out around ~10^4 pages.  Here the graph is an edge DataFrame and
each power iteration is one join + aggregation: O(edges) per step,
shuffle-partitioned, which is the standard web-scale formulation.

Semantics preserved from the reference:
* PageRank (utils/pagerank.py:33-44): column-stochastic transition with
  weight 1/outdegree, damping 0.85, init 1/n, update
  s' = (1-d)/n + d·(A s); NOTE the reference does NOT redistribute
  dangling-node mass — scores simply leak (matrix columns of dangling
  nodes are all-zero).  We replicate that exactly, including the final
  ×1000 scaling (pagerank.py:43) and the L1 convergence test.
* HITS (utils/hits.py:46-69): auth = Aᵀh then L1-normalize, hub = A·a
  then L1-normalize, ×10 scaling, elementwise convergence threshold.
* Only internal links (both endpoints in the corpus) form edges
  (J5, hits.py:30-33, pagerank.py:28-31).

Iterations are driver-orchestrated (a handful of scheduler round
trips); each step's data stays distributed.  For the in-sandbox tests
a numpy transcription of the reference verifies value parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def edges_from_pages(pages: DataFrame) -> DataFrame:
    """(url, outgoing_links) → internal edge list (src, dst), dedup —
    drops dangling targets (J5)."""
    vertices = pages.select(F.col("url").alias("dst")).distinct()
    edges = (
        pages.select(
            F.col("url").alias("src"), F.explode("outgoing_links").alias("dst")
        )
        .distinct()
        .join(vertices, "dst")  # internal links only
    )
    return edges.select("src", "dst")


def pagerank(
    spark: SparkSession,
    pages: DataFrame,
    damping: float = 0.85,
    max_iterations: int = 100,
    threshold: float = 0.0001,
) -> DataFrame:
    """→ (url, pagerank) with the reference's exact update rule and
    ×1000 output scale."""
    verts = pages.select("url").distinct().cache()
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "url string, pagerank double")
    edges = edges_from_pages(pages)
    # reference divides by the FULL outgoing-link count — external and
    # dangling links included (pagerank.py:25-31: outbound_count =
    # len(doc['outgoing_links']) before the in-corpus check)
    outdeg = pages.select(
        F.col("url").alias("src"), F.size("outgoing_links").alias("outdeg")
    ).filter(F.col("outdeg") > 0)
    trans = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).cache()
    trans.count()

    scores = verts.select("url", F.lit(1.0 / n).alias("score"))
    base = (1.0 - damping) / n
    for _ in range(max_iterations):
        contrib = (
            trans.join(
                scores.withColumnRenamed("url", "src"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("score")).alias("in_mass"))
        )
        new_scores = (
            verts.join(contrib.withColumnRenamed("dst", "url"), "url", "left")
            .select(
                "url",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                 ).alias("score"),
            )
        )
        # localCheckpoint truncates lineage — 100 chained iterations
        # otherwise blow up plan size/driver heap (on a cluster, use
        # checkpoint() with a reliable dir instead)
        new_scores = new_scores.localCheckpoint()
        delta = (
            new_scores.withColumnRenamed("score", "new")
            .join(scores, "url")
            .agg(F.sum(F.abs(F.col("new") - F.col("score"))).alias("d"))
            .collect()[0]["d"]
        )
        if delta is not None and delta < threshold:
            # reference keeps the PREVIOUS iterate on convergence
            # (pagerank.py:37-40: break before `scores = new_scores`)
            break
        scores = new_scores
    return scores.select("url", (F.col("score") * 1000.0).alias("pagerank"))


def hits(
    spark: SparkSession,
    pages: DataFrame,
    max_iterations: int = 20,
    threshold: float = 0.0001,
) -> DataFrame:
    """→ (url, authority, hub), reference semantics with ×10 scale."""
    verts = pages.select("url").distinct().cache()
    n = verts.count()
    if n == 0:
        return spark.createDataFrame(
            [], "url string, authority double, hub double"
        )
    edges = edges_from_pages(pages).cache()
    edges.count()

    hub = verts.select("url", F.lit(1.0 / n).alias("hub"))
    auth = verts.select("url", F.lit(1.0 / n).alias("auth"))

    for _ in range(max_iterations):
        # auth(v) = Σ hub(u) over edges u→v, then L1 normalize
        new_auth = (
            edges.join(hub.withColumnRenamed("url", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("raw"))
        )
        auth_norm = new_auth.agg(F.sum(F.abs(F.col("raw")))).collect()[0][0] or 1.0
        new_auth = (
            verts.join(new_auth.withColumnRenamed("dst", "url"), "url", "left")
            .select("url", (F.coalesce("raw", F.lit(0.0)) / auth_norm).alias("auth"))
            .localCheckpoint()
        )
        # hub(u) = Σ auth(v) over edges u→v, then L1 normalize
        new_hub = (
            edges.join(new_auth.withColumnRenamed("url", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("raw"))
        )
        hub_norm = new_hub.agg(F.sum(F.abs(F.col("raw")))).collect()[0][0] or 1.0
        new_hub = (
            verts.join(new_hub.withColumnRenamed("src", "url"), "url", "left")
            .select("url", (F.coalesce("raw", F.lit(0.0)) / hub_norm).alias("hub"))
            .localCheckpoint()
        )
        conv = (
            new_auth.withColumnRenamed("auth", "na")
            .join(auth, "url")
            .join(new_hub.withColumnRenamed("hub", "nh"), "url")
            .join(hub, "url")
            .agg(
                F.max(F.abs(F.col("na") - F.col("auth"))).alias("da"),
                F.max(F.abs(F.col("nh") - F.col("hub"))).alias("dh"),
            )
            .collect()[0]
        )
        if (conv["da"] or 0.0) < threshold and (conv["dh"] or 0.0) < threshold:
            # reference keeps the PREVIOUS iterate on convergence
            # (hits.py:60-66: break before the vector assignments)
            break
        auth, hub = new_auth, new_hub

    return (
        auth.join(hub, "url")
        .select(
            "url",
            (F.col("auth") * 10.0).alias("authority"),
            (F.col("hub") * 10.0).alias("hub"),
        )
    )
