"""Connected components (operators/components): fixpoint correctness
vs a driver-side union-find oracle, transitive-group semantics the
direct-neighbor rule cannot produce, and the no-graph-collect scale
contract."""

import random

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.components import (
    assign_components,
    connected_components,
    transitive_dedup,
    transitive_dedup_groups,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then root = min of component by construction
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    got = connected_components(df)
    return {r["node"]: r["root"] for r in got.collect()}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(6):
        n = rng.randint(2, 60)
        m = rng.randint(0, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        want = _union_find(nodes, edges)
        got = _cc_spark(spark, edges)
        assert got == want, f"trial {trial}: {sorted(got.items())[:8]}"


def test_long_chain_converges_in_log_rounds(spark):
    # a 200-node path: min-label propagation would need ~200 rounds;
    # large/small-star must close it well under the 50-round guard.
    edges = [(i, i + 1) for i in range(200)]
    got = _cc_spark(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_two_components_and_duplicate_edges(spark):
    edges = [(5, 1), (1, 5), (5, 5), (9, 7), (7, 9), (9, 7)]
    got = _cc_spark(spark, edges)
    assert got == {1: 1, 5: 1, 7: 7, 9: 7}


def test_empty_edges_all_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node: bigint")
    empty = spark.createDataFrame([], "src: bigint, dst: bigint")
    got = assign_components(nodes, empty)
    assert {(r["node"], r["root"]) for r in got.collect()} == {
        (i, i) for i in range(4)
    }


def test_string_node_ids(spark):
    edges = [("b#000002", "a#000001"), ("c#000003", "b#000002")]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {r["node"]: r["root"] for r in connected_components(df).collect()}
    assert got == {
        "a#000001": "a#000001",
        "b#000002": "a#000001",
        "c#000003": "a#000001",
    }


@pytest.fixture(scope="module")
def chain_docs(spark):
    # A ≈ B, B ≈ C, A ̸≈ C: the transitive group is {A,B,C} even
    # though A and C never pair directly.
    rows = [
        ("c0", 1, "alpha beta gamma delta epsilon zeta"),
        ("c0", 2, "alpha beta gamma delta epsilon eta"),
        ("c0", 3, "alpha beta gamma delta theta eta"),
        ("c9", 1, "totally unrelated text about spark"),
    ]
    return spark.createDataFrame(rows, "conv_id: string, turn_idx: int, text: string")


@pytest.fixture(scope="module")
def chain_pairs(spark):
    rows = [("c0", 1, "c0", 2), ("c0", 2, "c0", 3)]
    return spark.createDataFrame(
        rows,
        "a_conv_id: string, a_turn_idx: int, b_conv_id: string, b_turn_idx: int",
    )


def test_transitive_groups_close_the_chain(spark, chain_docs, chain_pairs):
    got = {
        (r["conv_id"], r["turn_idx"]): r["group_id"]
        for r in transitive_dedup_groups(chain_docs, chain_pairs).collect()
    }
    assert got[("c0", 1)] == got[("c0", 2)] == got[("c0", 3)] == "c0#000001"
    assert got[("c9", 1)] == "c9#000001"  # singleton groups with itself


def test_transitive_dedup_keeps_component_min(spark, chain_docs, chain_pairs):
    kept = {
        (r["conv_id"], r["turn_idx"])
        for r in transitive_dedup(chain_docs, chain_pairs).collect()
    }
    # C ("c0",3) must drop even though its only direct neighbor is B,
    # not the keeper A — the distinction vs dedup.simhash_dedup's
    # direct-neighbor rule.
    assert kept == {("c0", 1), ("c9", 1)}


def test_non_convergence_guard_raises(spark):
    df = spark.createDataFrame([(2, 1)], "src: bigint, dst: bigint")
    with pytest.raises(RuntimeError):
        # max_iter=0 means the loop body never runs → the guard fires
        connected_components(df, max_iter=0)


def test_driver_sees_only_scalars(spark):
    """Scale contract: the convergence test collects two scalars per
    round; the component map itself is never collected.  Proxy check:
    the returned DataFrame is lazy (no job ran to produce it beyond
    the checkpoint/agg rounds) and its plan joins checkpointed RDDs,
    not a parallelized local result."""
    edges = [(i, i + 1) for i in range(50)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = connected_components(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan  # built over checkpointed edges
    assert "LocalRelation" not in plan  # ... not a collected local table
