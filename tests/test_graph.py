"""Integer PageRank: hand-computed tiny graph + invariants on fixtures."""

from pyspark.sql import functions as F

from streamlit_projet_spark_streaming_spark.operators.graph import (
    SCALE,
    copurchase_edges,
    pagerank_integer,
)
from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _pagerank_reference(edges, iters):
    """Pure-Python replication of the exact integer recurrence."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    n = len(nodes)
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        insum = {v: 0 for v in nodes}
        for s, d, w in edges:
            insum[d] += (pr[s] * w) // outw[s]
        pr = {
            v: (15 * SCALE) // (100 * n) + (85 * insum[v]) // 100
            for v in nodes
        }
    return pr


def test_pagerank_matches_reference_on_tiny_graph(spark):
    # Directed triangle with asymmetric weights plus a spur; every node
    # has out-degree (the copurchase construction guarantees this).
    edges = [
        (1, 2, 3),
        (2, 1, 3),
        (1, 3, 1),
        (3, 1, 1),
        (2, 3, 2),
        (3, 2, 2),
        (3, 4, 1),
        (4, 3, 1),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r["part"]: r["pr_scaled"]
        for r in pagerank_integer(df, iters=3).collect()
    }
    assert got == _pagerank_reference(edges, 3)


def test_pagerank_ranks_sink_nodes(spark):
    """A directed graph with a sink (dst never a src): the sink is
    ranked (nodes = src ∪ dst), accumulates in-mass + teleport, and
    matches the pure-Python recurrence."""
    edges = [(1, 2, 1), (1, 3, 1), (3, 1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r["part"]: r["pr_scaled"]
        for r in pagerank_integer(df, iters=2).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got == _pagerank_reference(edges, 2)
    assert got[2] > (15 * SCALE) // (100 * 3)  # sink got in-mass too


def test_pagerank_fixture_invariants(spark):
    li = load_table(spark, "lineitem", SF_SMOKE)
    edges = copurchase_edges(li)
    pr = pagerank_integer(edges, iters=2)
    rows = pr.collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pr_scaled"] for r in rows)
    n_edges = edges.count()
    # Mass conservation up to floor loss: each of the 2 rounds drops
    # < 1 unit per edge (contribution floor) + 1 per node (damping
    # floors) + n for the teleport floor.
    loss_bound = 2 * (n_edges + 2 * n + n)
    assert SCALE - loss_bound <= total <= SCALE
    # Teleport floor is a hard per-node lower bound.
    floor = (15 * SCALE) // (100 * n)
    assert all(r["pr_scaled"] >= floor for r in rows)


def test_copurchase_edges_symmetric_and_selfloop_free(spark):
    li = load_table(spark, "lineitem", SF_SMOKE)
    edges = copurchase_edges(li)
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    a = {(r["src"], r["dst"], r["w"]) for r in edges.collect()}
    assert {(d, s, w) for s, d, w in a} == a
