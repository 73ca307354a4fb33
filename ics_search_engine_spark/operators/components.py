"""Distributed connected components for transitive duplicate groups.

Closes the one documented gap in operators/dedup.py: the reference's
near-dup rule (/root/reference/components/document_processor.py:72-79)
compares each new doc against the KEPT set, so A≈B, B≈C, A̸≈C drops
both B and C even though C never matched a kept doc — an
order-dependent, transitively-closed-by-accident behavior.  The
parallel-correct semantics is: build the near-dup GRAPH, take its
connected components, keep the minimum docID of each component.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014).  Each round is two aggregate+join dataflow
steps; convergence is O(log² n) rounds REGARDLESS of component
diameter — unlike plain min-label propagation, whose round count is
the graph diameter (a 10^6-long duplication chain would need 10^6
shuffles; large/small-star needs ~20).

Scale posture (the 100 TB question):

* no collect of graph data — the driver sees two scalars per round
  (edge count + order-insensitive checksum) for the convergence test;
* per-node work is ``groupBy(node).agg(min(...))`` + a shuffle join
  back to the edge list: map-side partial aggregation applies, and a
  high-degree node (a viral duplicate cluster) is ONE group row, not
  a collect_list blow-up;
* every round ends in ``localCheckpoint(eager=True)`` so lineage stays
  O(1) across iterations instead of O(rounds) — the standard Spark
  iterative-algorithm requirement (GraphX does the same internally);
* edges are deduplicated each round, so the working set shrinks
  toward one edge per non-root node (the final star graphs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ics_search_engine_spark.operators.index_build import DOC_KEY

__all__ = [
    "connected_components",
    "assign_components",
    "transitive_dedup_groups",
    "transitive_dedup",
]


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected canonical form: (u, v) with u > v, no self-loops,
    distinct.  The u > v invariant is what small-star expects."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: every node connects its LARGER neighbors to the
    minimum of its closed neighborhood.  edges: (u, v), u > v."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # m(x) = min over N(x) ∪ {x}; since sym holds both directions,
    # min(v) over the group is min(N(x)), and x itself caps it.
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select(F.col("u").alias("x"), F.least("mn", "u").alias("m"))
    # emit (bigger-neighbor, m(x)) for every neighbor bigger than x
    out = (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, F.col("u") == F.col("x"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: every node connects its SMALLER neighbors (and
    itself) to the minimum of that set.  edges: (u, v), u > v, so all
    v already sit below u."""
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    # (smaller-neighbor, m(u)) for each smaller neighbor, plus (u, m(u))
    relinked = (
        edges.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = m.select("u", F.col("m").alias("v"))
    out = relinked.unionByName(self_edge)
    return out.filter(F.col("u") != F.col("v")).distinct()


def _checksum(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: overflow-free under ANSI mode for any
        # realistic edge count (2^63 × 2^63-scale headroom)
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """→ (node, root) for every node that appears in ``edges``, where
    root is the MINIMUM node id of its connected component (roots map
    to themselves).  Node columns may be any orderable Spark type; the
    id order defines which member becomes the root.

    Raises RuntimeError if the alternation has not converged after
    ``max_iter`` rounds (the algorithm's bound is O(log² n); 50 rounds
    covers any realistic graph — non-convergence means a bug, and
    failing loudly beats silently returning a partial contraction).
    """
    universe = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    e = _canon(edges, src, dst).localCheckpoint(eager=True)
    prev = _checksum(e)
    for rounds in range(1, max_iter + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            if stats is not None:
                stats["rounds"] = rounds
                stats["final_edges"] = cur[0]
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds"
        )
    # fixpoint edge set is a star forest: (member, root) with
    # member > root.  Every non-root node appears exactly once as u.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("root"))
    # roots + nodes seen only in self-loops / isolated mentions map to
    # themselves: everything in the universe that isn't a member.
    selfroots = universe.join(members, "node", "left_anti").withColumn(
        "root", F.col("node")
    )
    return members.unionByName(selfroots)


def assign_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """``nodes`` (one column ``node_col``, unique) → nodes + ``root``
    column; nodes absent from the edge set are their own singleton
    component.  The join is a plain equi-join on the node id — at
    fixpoint the component map has at most one row per node, so this
    is a 1:1 shuffle join (broadcast when the dup graph is small
    relative to the corpus, which is the common case)."""
    cc = connected_components(edges, src=src, dst=dst, max_iter=max_iter)
    out = nodes.join(
        cc.withColumnRenamed("node", node_col), node_col, "left"
    )
    return out.withColumn("root", F.coalesce("root", F.col(node_col)))


def _pair_docids(pairs: DataFrame) -> DataFrame:
    """(a_conv_id, a_turn_idx, b_conv_id, b_turn_idx) near-dup pairs
    (the common output shape of operators/dedup generators) → string
    docid edges, matching dedup._docid_col()'s sortable encoding."""
    a = F.concat_ws(
        "#", F.col("a_conv_id"), F.format_string("%06d", F.col("a_turn_idx"))
    )
    b = F.concat_ws(
        "#", F.col("b_conv_id"), F.format_string("%06d", F.col("b_turn_idx"))
    )
    return pairs.select(a.alias("src"), b.alias("dst"))


def transitive_dedup_groups(
    transcripts: DataFrame, pairs: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Docs + near-dup pairs → (conv_id, turn_idx, group_id) where
    group_id is the minimum docid of the TRANSITIVE duplicate group
    (singleton docs group with themselves)."""
    docids = transcripts.select(
        *DOC_KEY,
        F.concat_ws(
            "#", F.col("conv_id"), F.format_string("%06d", F.col("turn_idx"))
        ).alias("node"),
    )
    assigned = assign_components(
        docids, _pair_docids(pairs), node_col="node", max_iter=max_iter
    )
    return assigned.select(*DOC_KEY, F.col("root").alias("group_id"))


def transitive_dedup(
    transcripts: DataFrame, pairs: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Keep exactly one doc — the minimum (conv_id, turn_idx) — per
    TRANSITIVE near-dup group.  The parallel-correct version of the
    reference's first-seen drop rule (see module docstring); compare
    dedup.simhash_dedup, which keeps min over DIRECT neighbors only."""
    groups = transitive_dedup_groups(transcripts, pairs, max_iter=max_iter)
    node = F.concat_ws(
        "#", F.col("conv_id"), F.format_string("%06d", F.col("turn_idx"))
    )
    return (
        transcripts.join(groups, list(DOC_KEY))
        .filter(node == F.col("group_id"))
        .drop("group_id")
    )
