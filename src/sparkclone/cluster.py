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
    dense_ids: bool = True,
) -> DataFrame:
    """edges(src, dst) -> (unit_id, cluster_id, cluster_root).

    Nodes are identity strings; internally hashed to int64 with xxhash64
    for compact shuffles (collision odds ~n^2/2^64 — negligible below
    ~10^8 finding endpoints, and any collision only ever merges clusters,
    never splits).
    """
    # FAST PATH (one-cascade CC): fetch the distinct (src, dst) STRING
    # pairs — self-pairs included, they carry otherwise-singleton nodes —
    # in ONE capped Arrow action and run the reference's path-compressed
    # union-find over the strings directly. This replaces the int64
    # route's separate cascades (hashed-edge dedupe + capped edge fetch +
    # capped node-table fetch) with one aggregation + one fetch + one
    # createDataFrame upload, and skips the xxhash64 relabeling
    # round-trip entirely (guide §2.4: remove whole passes). Strings are
    # heavier per row than int64 pairs, so the cap is lower (250k pairs,
    # tens of MB in Arrow); graphs above it fall through to the int64
    # route unchanged (which keeps its own small_graph_edges bound), and
    # small_graph_edges=0 — the distributed-loop force — bypasses both
    # driver routes.
    if cfg.small_graph_edges > 0:
        cap_pairs = min(cfg.small_graph_edges, 250_000)
        pairs_pdf = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .dropDuplicates()
            .limit(cap_pairs + 1)
            .toPandas()
        )
        if len(pairs_pdf) <= cap_pairs:
            return _driver_cc_strings(edges.sparkSession, pairs_pdf, dense_ids)

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.xxhash64("a").alias("u"), F.xxhash64("b").alias("v"))
        .dropDuplicates()
        .persist()
    )
    nodes = (
        edges.select(F.col(src).alias("unit_id"))
        .unionByName(edges.select(F.col(dst).alias("unit_id")))
        .dropDuplicates()
        .withColumn("node", F.xxhash64("unit_id"))
    )

    # Hybrid execution: finding graphs are usually tiny relative to the
    # corpus; below the threshold, collect the int64 edge list and run
    # the same path-compressed union-find the reference uses — exact,
    # deterministic, and a handful of ms instead of one Spark job round
    # per label-propagation iteration. The distributed loop below remains
    # the path for billion-edge graphs.
    #
    # ONE action decides the route AND fetches the edges:
    # limit(threshold+1).toPandas() — if the cap comes back full the graph
    # is big and we fall to the distributed loop (e stays persisted for
    # it). The former count()-then-collect() pair cost an extra full job
    # round per pipeline — a cluster-size-constant coordination cost,
    # exactly the kind the scaling protocol punishes. Arrow transfer, not
    # collect(): Python Row objects carry ~10x the raw 16 B/edge, so a
    # full 2M-row routing sample would transiently hold hundreds of MB of
    # driver heap as Rows vs ~32 MB as two int64 numpy columns.
    # toLocalIterator remains banned here (one sequential job per
    # partition).
    edge_pdf = e.limit(cfg.small_graph_edges + 1).toPandas()
    if len(edge_pdf) <= cfg.small_graph_edges:
        spark = edges.sparkSession
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return parent.get(x, x)

        e.unpersist()  # fully consumed; nothing downstream references it
        for u, v in zip(edge_pdf["u"].to_numpy(), edge_pdf["v"].to_numpy()):
            u, v = int(u), int(v)
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[rv] = ru

        # One-fetch finish: pull the (unit_id, node) table via Arrow and
        # assign labels + dense ids + roots entirely in the driver — the
        # remaining work is a dict pass over the node list, and doing it
        # here replaces three more job rounds (label broadcast join,
        # roots fetch, dense-id join) with a single createDataFrame.
        # Node count is NOT bounded by 2x edges (units appearing only in
        # self-edge findings are singleton components), hence the capped
        # fetch; past the cap fall through to the join-based finish.
        # The cap is deliberately far below 2x small_graph_edges: the
        # result upload is a driver-side createDataFrame, so the
        # all-driver finish only pays off while the node table is
        # hundreds-of-MB small; bigger graphs keep the distributed
        # broadcast-join finish below.
        if dense_ids:
            node_cap = min(2 * cfg.small_graph_edges, 500_000)
            node_pdf = nodes.limit(node_cap + 1).toPandas()
            if len(node_pdf) <= node_cap:
                import pandas as pd

                labs = [int(find(int(n))) for n in node_pdf["node"].to_numpy()]
                pdf = pd.DataFrame(
                    {"unit_id": node_pdf["unit_id"], "label": labs}
                )
                # pandas str min == Spark's UTF8String ordering for the
                # ascii unit ids (and for valid UTF-8 generally: byte
                # order == code-point order)
                root_of = pdf.groupby("label")["unit_id"].min()
                order = root_of.sort_values(kind="mergesort")
                cid = {lab: i + 1 for i, lab in enumerate(order.index)}
                out_pdf = pd.DataFrame(
                    {
                        "unit_id": pdf["unit_id"],
                        "cluster_id": pdf["label"].map(cid),
                        "cluster_root": pdf["label"].map(root_of),
                    }
                )
                # a pandas frame rides the Arrow upload path (the session
                # builders enable spark.sql.execution.arrow.pyspark);
                # tuple lists would be row-pickled
                return spark.createDataFrame(
                    out_pdf, "unit_id string, cluster_id int, cluster_root string"
                )

        import pandas as pd

        labels_df = spark.createDataFrame(
            pd.DataFrame(
                {"node": list(parent), "label": [find(n) for n in parent]}
            ),
            "node long, label long",
        ) if parent else spark.createDataFrame([], "node long, label long")
        # left join: nodes appearing only in self-edge findings keep
        # themselves as label (singleton clusters — clustering.py:27-31
        # registers both endpoints of every finding)
        membership = nodes.join(F.broadcast(labels_df), "node", "left").select(
            "unit_id", F.coalesce(F.col("label"), F.col("node")).alias("label")
        )
        if dense_ids and len(edge_pdf) <= 100_000:
            # Small graph: collect the per-component roots in ONE action
            # and assign dense ids in the driver, instead of _densify's
            # range-partition + eager localCheckpoint + counts-collect
            # round-trips — identical ids (1..K ordered by min member
            # identity), three fewer cluster-size-constant job rounds per
            # pipeline. Component count is NOT bounded by 2x edges —
            # units appearing only in self-edge findings are singleton
            # components via the coalesce above — so the fetch itself is
            # capped: a full cap+1 result means too many components for
            # the driver and we fall back to the distributed densify.
            cap = 200_000
            roots_pdf = (
                membership.groupBy("label")
                .agg(F.min("unit_id").alias("cluster_root"))
                .limit(cap + 1)
                .toPandas()
            )
            if len(roots_pdf) <= cap:
                roots_pdf = roots_pdf.sort_values(
                    "cluster_root", kind="mergesort"
                ).reset_index(drop=True)
                roots_pdf["cluster_id"] = roots_pdf.index + 1
                dense_df = spark.createDataFrame(
                    roots_pdf[["label", "cluster_id", "cluster_root"]],
                    "label long, cluster_id int, cluster_root string",
                )
                return membership.join(F.broadcast(dense_df), "label").select(
                    "unit_id", "cluster_id", "cluster_root"
                )
        return _densify(membership, dense_ids)
    # symmetric edge list (u -> v both directions)
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).dropDuplicates()
    sym = sym.localCheckpoint(eager=True)
    e.unpersist()  # sym's eager localCheckpoint cut the lineage to e

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
    return _densify(membership, dense_ids)


def _driver_cc_strings(spark, pairs_pdf, dense_ids: bool) -> DataFrame:
    """All-driver CC over a fetched distinct (a, b) string-pair frame:
    path-compressed union-find (the reference's own algorithm,
    clustering.py:8-43) + dense-id / root assignment, uploaded back in
    one Arrow createDataFrame. Self-pairs register their node and merge
    nothing. cluster_id is 1..K ordered by each component's minimum
    member identity (identical to the int64 route's dense ids); with
    dense_ids=False the same ordering is used as the long-typed label —
    labels are per-component-arbitrary by contract (consumers only group
    by them), and the int64 route's xxhash-derived labels were equally
    arbitrary."""
    import pandas as pd

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return parent.get(x, x)

    nodes: set[str] = set()
    for a, b in zip(pairs_pdf["a"], pairs_pdf["b"]):
        nodes.add(a)
        nodes.add(b)
        if a == b:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    node_list = sorted(nodes)
    pdf = pd.DataFrame(
        {"unit_id": node_list, "label": [find(n) for n in node_list]}
    )
    # pandas str min == Spark's UTF8String ordering for valid UTF-8
    # (byte order == code-point order)
    root_of = pdf.groupby("label")["unit_id"].min() if len(pdf) else pd.Series(dtype=object)
    order = root_of.sort_values(kind="mergesort")
    cid = {lab: i + 1 for i, lab in enumerate(order.index)}
    out = pd.DataFrame(
        {
            "unit_id": pdf["unit_id"],
            "cluster_id": pdf["label"].map(cid),
            "cluster_root": pdf["label"].map(root_of),
        }
    )
    id_type = "int" if dense_ids else "long"
    return spark.createDataFrame(
        out, f"unit_id string, cluster_id {id_type}, cluster_root string"
    )


def _densify(membership: DataFrame, dense_ids: bool) -> DataFrame:
    roots = membership.groupBy("label").agg(F.min("unit_id").alias("cluster_root"))
    if dense_ids:
        # Densify 1..K ordered by min member identity WITHOUT a global
        # single-task sort: range-partition the roots by cluster_root
        # (each task sorts only its range), rank within each partition,
        # then add per-partition offsets (one tiny collect of partition
        # counts). repartitionByRange orders ranges by partition id, so
        # offset + local rank == global rank. Distinct cluster_root per
        # label is guaranteed (components are disjoint member sets), so
        # row_number == dense_rank. For runs beyond ~2^31 clusters use
        # dense_ids=False and keep the stable 64-bit root label.
        spark = membership.sparkSession
        ranged = roots.repartitionByRange(F.col("cluster_root")).withColumn(
            "__pid", F.spark_partition_id()
        )
        w = Window.partitionBy("__pid").orderBy("cluster_root")
        # freeze the range-partition assignment (sampling-based) so the
        # counts pass and the join pass see identical __pid values
        local = ranged.withColumn("__rn", F.row_number().over(w)).localCheckpoint(
            eager=True
        )
        counts = sorted(
            (r["__pid"], r["n"])
            for r in local.groupBy("__pid").agg(F.count("*").alias("n")).collect()
        )
        offsets, acc = [], 0
        for pid, n in counts:
            offsets.append((pid, acc))
            acc += n
        if offsets:
            off_df = spark.createDataFrame(offsets, "__pid int, __off long")
            dense = (
                local.join(F.broadcast(off_df), "__pid")
                .withColumn("cluster_id", (F.col("__off") + F.col("__rn")).cast("int"))
                .drop("__pid", "__rn", "__off")
            )
        else:
            dense = local.withColumn("cluster_id", F.lit(None).cast("int")).drop(
                "__pid", "__rn"
            )
    else:
        dense = roots.withColumn("cluster_id", F.col("label"))
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
