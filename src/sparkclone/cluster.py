"""Iterative connected components over the finding edge DataFrame.

Replaces the reference's in-memory path-compressed union-find
(``similarity/clustering.py:8-43``) with min-label propagation over a
DataFrame edge list: each round every node adopts the minimum label in its
closed neighborhood; convergence when no label changes. Clone graphs are
unions of near-cliques/stars (tiny diameter), so rounds stay in the low
single digits; ``max_iterations`` bounds pathological chains and
``localCheckpoint`` truncates lineage each round so plans don't grow.

Cluster ids are densified 1..K ordered by each cluster's minimum member
identity — deterministic, and equivalent to the reference's first-seen
numbering up to relabeling (the acceptance metric is pair-set based,
``benchmark/run_benchmark.py:659-678``).

Also provides ``filter_clusters`` semantics (``clustering.py:46-55``):
the min-size filter counts *findings* per cluster, not members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkclone.config import ClusterConfig


def connected_components(
    edges: DataFrame,
    cfg: ClusterConfig,
    src: str = "unit_a",
    dst: str = "unit_b",
) -> DataFrame:
    """edges(src, dst) -> (unit_id, cluster_id, cluster_root).

    Nodes are identity strings; internally hashed to int64 with xxhash64
    for compact shuffles (collision odds ~n^2/2^64 — negligible below
    ~10^8 finding endpoints, and any collision only ever merges clusters,
    never splits).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.xxhash64("a").alias("u"), F.xxhash64("b").alias("v"))
        .dropDuplicates()
    )
    nodes = (
        edges.select(F.col(src).alias("unit_id"))
        .unionByName(edges.select(F.col(dst).alias("unit_id")))
        .dropDuplicates()
        .withColumn("node", F.xxhash64("unit_id"))
    )
    # symmetric edge list (u -> v both directions)
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).dropDuplicates()
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(eager=True)
    for _ in range(cfg.max_iterations):
        # min label over closed neighborhood
        neigh = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neigh, labels["node"] == neigh["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("new_label"),
                F.col("label"),
            )
            .localCheckpoint(eager=True)  # one materialization per round
        )
        changed = updated.where(F.col("new_label") != F.col("label")).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break

    membership = nodes.join(labels, "node").select("unit_id", F.col("label"))
    # densify: cluster_root = min member identity; cluster_id = dense rank
    roots = membership.groupBy("label").agg(F.min("unit_id").alias("cluster_root"))
    dense = roots.withColumn(
        "cluster_id", F.dense_rank().over(Window.orderBy("cluster_root"))
    )
    return membership.join(dense, "label").select("unit_id", "cluster_id", "cluster_root")


def cluster_sizes(membership: DataFrame) -> DataFrame:
    return membership.groupBy("cluster_id").agg(
        F.count("*").alias("member_count"),
        F.min("cluster_root").alias("cluster_root"),
    )


def attach_clusters(findings: DataFrame, membership: DataFrame) -> DataFrame:
    """Stamp cluster_id on findings via side-a membership (both endpoints
    share a component by construction — clustering.py:33-40)."""
    m = membership.select(F.col("unit_id").alias("unit_a"), "cluster_id")
    return findings.join(m, "unit_a", "left")


def filter_clusters(findings_with_clusters: DataFrame, min_size: int) -> DataFrame:
    """clustering.py:46-55: keep findings whose cluster has >= min_size
    FINDINGS (not members)."""
    if min_size <= 1:
        return findings_with_clusters
    counts = findings_with_clusters.groupBy("cluster_id").agg(
        F.count("*").alias("__fcount")
    )
    return (
        findings_with_clusters.join(counts, "cluster_id")
        .where(F.col("__fcount") >= F.lit(min_size))
        .drop("__fcount")
    )
