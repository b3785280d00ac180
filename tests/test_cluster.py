"""Connected-components + cluster filter micro-tests
(tests/test_clustering.py:29-33 pattern in the reference)."""

from __future__ import annotations

from sparkclone.config import ClusterConfig


def _cc(spark, edges):
    from sparkclone.cluster import connected_components

    df = spark.createDataFrame(edges, ["unit_a", "unit_b"])
    rows = connected_components(df, ClusterConfig()).collect()
    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["unit_id"])
    return by_cluster


def test_chain_merges(spark):
    out = _cc(spark, [("a", "b"), ("b", "c")])
    assert len(out) == 1
    assert set().union(*out.values()) == {"a", "b", "c"}


def test_isolated_pairs_stay_separate(spark):
    out = _cc(spark, [("a", "b"), ("x", "y")])
    assert len(out) == 2
    assert {frozenset(m) for m in out.values()} == {
        frozenset({"a", "b"}),
        frozenset({"x", "y"}),
    }


def test_long_chain_converges(spark):
    n = 30
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    out = _cc(spark, edges)
    assert len(out) == 1
    assert len(next(iter(out.values()))) == n + 1


def test_self_edges_ignored(spark):
    out = _cc(spark, [("a", "a"), ("a", "b")])
    assert len(out) == 1


def test_dense_ids_deterministic(spark):
    """cluster_id ordering follows min member identity."""
    out = _cc(spark, [("m", "n"), ("a", "b")])
    # cluster containing 'a' must be id 1
    for cid, members in out.items():
        if "a" in members:
            assert cid == 1
        if "m" in members:
            assert cid == 2


def test_distributed_loop_matches_driver_union_find(spark):
    """Force the iterative min-label DataFrame loop (small_graph_edges=0)
    and check it produces the exact same membership as the driver-side
    union-find on a graph with chains, cliques, and singleton-free mix —
    the billion-edge path must agree with the exact small path."""
    from sparkclone.cluster import connected_components
    from sparkclone.config import ClusterConfig

    edges = [
        # chain of 5
        ("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c5"),
        # clique of 4
        ("k1", "k2"), ("k1", "k3"), ("k1", "k4"), ("k2", "k3"), ("k3", "k4"),
        # star
        ("s0", "s1"), ("s0", "s2"), ("s0", "s3"),
        # pair + self edge
        ("p1", "p2"), ("p1", "p1"),
    ]
    df = spark.createDataFrame(edges, "unit_a string, unit_b string")

    def membership(cfg):
        rows = connected_components(df, cfg).collect()
        comp: dict[int, set[str]] = {}
        for r in rows:
            comp.setdefault(r["cluster_id"], set()).add(r["unit_id"])
        # canonicalize with a TOTAL order: sorting frozensets directly
        # uses the subset partial order, which silently depends on
        # collect() row order
        return {cid: tuple(sorted(m)) for cid, m in comp.items()}

    small = membership(ClusterConfig())
    distributed = membership(ClusterConfig(small_graph_edges=0, max_iterations=25))
    assert small == distributed
    assert sorted(len(m) for m in distributed.values()) == [2, 4, 4, 5]


def test_filter_clusters_counts_findings(spark):
    """min-size filter counts FINDINGS per cluster (clustering.py:46-55):
    cluster with 1 finding dropped at min_size=2 even with 2 members."""
    from sparkclone.cluster import attach_clusters, connected_components, filter_clusters

    findings = spark.createDataFrame(
        [("a", "b"), ("x", "y"), ("y", "z"), ("x", "z")], ["unit_a", "unit_b"]
    )
    membership = connected_components(findings, ClusterConfig())
    fc = attach_clusters(findings, membership)
    kept = filter_clusters(fc, 2).collect()
    units = {r["unit_a"] for r in kept} | {r["unit_b"] for r in kept}
    assert units == {"x", "y", "z"}
