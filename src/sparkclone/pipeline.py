"""End-to-end near-duplicate pipeline (the ``run_pipeline`` analogue).

Stage graph (each stage is a DataFrame transformation; Catalyst plans the
physical execution — contrast the reference's hard-coded 6-stage loop,
``core/pipeline.py:91-255``):

    corpus ──extract (mapInPandas, narrow)──> snippets
    snippets ──tokens/hashes (JVM codegen)──> tokenized
    tokenized ──exact collapse (1 shuffle on text_hash)──> reps + stars
    reps ──signatures (pandas UDF, narrow)──> signatures
    signatures ──LSH bucket join (shuffles on band key)──> candidate pairs
    pairs + reps ──verify (2 joins + JVM jaccard)──> verified edges
    verified ∪ stars ──rollup (1 shuffle on unit pair)──> findings
    findings ──iterative CC──> clusters

Scale notes: the only data-squared risk is pair generation, bounded by
exact collapse + bucket caps + salting (lsh.py). All other shuffles key on
high-cardinality hashes (text_hash, band key, unit pair) — uniform by
construction. AQE handles residual skew; every heavy Python kernel is
Arrow-batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from sparkclone.checkpoint import CheckpointManager
from sparkclone.config import PipelineConfig
from sparkclone.extract import extract_snippets
from sparkclone.lsh import candidate_pairs
from sparkclone.normalize import tokens_col
from sparkclone.signatures import token_hashes_col, with_signatures
from sparkclone.verify import verify_candidates, with_lcs_evidence

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read the corpus table (parquet stand-in for the Iceberg table of the
    input_hint) and stamp the per-row invariant ``content_sha256 =
    sha2(content, 256)`` — bit-identical to the reference's
    ``hashlib.sha256(text).hexdigest()`` (io/fingerprints.py:6-7)."""
    df = spark.read.parquet(path)
    return df.select(*CORPUS_COLUMNS).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )


def tokenize_snippets(snippets: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Append token hashes / text hash / tokenset hash columns (all
    JVM-side) and drop rows that can never match: empty token sets score
    Jaccard 0.0 in the reference (lexical.py:9-10) and pathologically
    long texts are dropped defensively with a metric (reference has no
    cap; windows are <= window_lines lines so only machine-generated
    whole-function blobs hit this).

    The string token array itself is DROPPED here: everything downstream
    (Jaccard verification, MinHash/SimHash, exact collapse) consumes the
    xxhash64 token-hash array or the tokenset hash — keeping the strings
    would fatten the collapse shuffle and every checkpoint by ~a third
    for no consumer."""
    toks = tokens_col(F.col("norm_text"))
    return (
        snippets.withColumn("tokens", toks)
        .withColumn("text_hash", F.sha2("norm_text", 256))
        .where(
            (F.size("tokens") > 0)
            & (F.length("norm_text") <= F.lit(cfg.lsh.max_text_chars))
        )
        .withColumn("token_hashes", token_hashes_col(F.col("tokens")))
        .withColumn("tokenset_hash", F.xxhash64(F.concat_ws(" ", F.col("tokens"))))
        .drop("tokens")
    )


def collapse_exact(
    tokenized: DataFrame, aux_registry: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate pre-collapse (SURVEY.md §4 mitigation (c)).

    Collapse key is the *distinct token set*, not the raw text: two
    snippets with identical token sets have exact Jaccard 1.0, which
    clears every reference threshold unconditionally
    (candidates.py:149-152), so replacing their O(n^2) pairwise matches
    with O(n) star edges to one representative preserves the cluster
    pair-set exactly. This strictly generalizes same-text collapse
    (same normalized text => same token set) and mirrors StubEmbedder
    semantics (cosine 1.0 <=> identical text, stub_embedder.py:19-27)
    while also absorbing reordered/reformatted boilerplate — the skew
    stressor of the north rule.

    Returns (reps, star_edges):
      reps — one representative per distinct token set (min snippet_id);
      star_edges — (rep, member) matches with jaccard 1.0, hamming 0
      (identical token sets give identical SimHash by construction);
      lcs_chars is text length when the raw texts are also identical,
      null otherwise (char-level LCS undefined without the texts).
    """
    keyed = tokenized
    if "tokenset_hash" not in keyed.columns:
        # tokenize_snippets normally precomputes this; recompute only for
        # callers feeding raw token arrays
        keyed = keyed.withColumn(
            "tokenset_hash", F.xxhash64(F.concat_ws(" ", F.col("tokens")))
        )
    # Rep assignment via one slim aggregation + slim join-back instead of
    # a window (guide §2.3 "shuffle fewer bytes" / §2.4 "remove shuffles
    # outright" / §8 "decide with small rows, move big rows once"). The
    # old window form shuffled AND sorted the full snippet rows
    # (norm_text + token_hashes included) on tokenset_hash, and
    # star_edges then re-ran that wide exchange once per side of a
    # rep⋈member self-join — three full-width exchanges total. Now:
    #   * min_by pulls the rep's snippet_id AND its star-edge side
    #     metadata into the aggregate in one pass (~200 B/group with
    #     map-side partial aggregation);
    #   * star_edges is built ENTIRELY from a slim projection (ids, side
    #     metadata, text_hash, text length — no norm_text / token_hashes /
    #     sketch arrays), so the heavy columns never enter any collapse
    #     exchange;
    #   * reps attach by key: a semi-join of the wide frame against the
    #     one-column rep-id set. AQE broadcasts rep_ids when it fits (no
    #     wide exchange at all); at corpus scale it degrades to ONE wide
    #     exchange — never worse than the previous single wide join, and
    #     the wide rows move zero times in the common case.
    # rep_map is persisted: reps' id set and star_edges both consume it.
    side_cols = [
        "unit_id", "path", "unit_start", "unit_end", "kind",
        "start_line", "end_line",
    ]
    slim = keyed.select(
        "tokenset_hash", "snippet_id", *side_cols, "text_hash",
        F.length("norm_text").alias("__text_len"),
    )
    rep_struct = F.struct(
        F.col("snippet_id"),
        *[F.col(c) for c in side_cols],
        F.col("text_hash"),
        F.col("__text_len"),
    )
    rep_map = slim.groupBy("tokenset_hash").agg(
        F.min_by(rep_struct, F.col("snippet_id")).alias("__rep")
    ).persist()
    if aux_registry is not None:
        aux_registry.append(rep_map)
    # snippet_id is content-addressed and globally unique (sha256 over
    # path/span/code recipes), so the semi-join keeps exactly the rows
    # picked as group minima. Column order restored explicitly: the
    # key-join moves snippet_id first and checkpointed stage schemas must
    # stay byte-stable across rounds.
    rep_ids = rep_map.select(F.col("__rep.snippet_id").alias("snippet_id"))
    reps = keyed.join(rep_ids, "snippet_id", "left_semi").select(*keyed.columns)

    members = slim.join(rep_map, "tokenset_hash").where(
        F.col("snippet_id") != F.col("__rep.snippet_id")
    )
    star_edges = members.select(
        F.col("__rep.snippet_id").alias("id_a"),
        F.col("snippet_id").alias("id_b"),
        *[F.col(f"__rep.{c}").alias(f"{c}_a") for c in side_cols],
        *[F.col(c).alias(f"{c}_b") for c in side_cols],
        F.lit(1.0).alias("jaccard"),
        F.lit(0).alias("hamming"),
        F.when(
            F.col("__rep.text_hash") == F.col("text_hash"),
            F.col("__rep.__text_len").cast("int"),
        ).alias("lcs_chars"),
        F.lit(True).alias("near_verbatim"),
    )
    return reps, star_edges


_EDGE_COLS = [
    "id_a", "id_b",
    "unit_id_a", "path_a", "unit_start_a", "unit_end_a", "kind_a", "start_line_a", "end_line_a",
    "unit_id_b", "path_b", "unit_start_b", "unit_end_b", "kind_b", "start_line_b", "end_line_b",
    "jaccard", "hamming", "lcs_chars", "near_verbatim",
]


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    cfg: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
    eager_metrics: bool | None = None,
    snapshot_id: str | None = None,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every stage as a DataFrame.

    With ``checkpoint_dir`` set, each stage is persisted under
    ``{dir}/{config_hash}/{stage}`` and a rerun resumes from the last
    completed stage (kill/resume test in tests/test_resume.py).

    ``eager_metrics`` controls the per-stage materializing count of
    in-memory runs (exact per-stage wall attribution at the cost of one
    job round per stage — a cluster-size-constant coordination floor).
    Default ``None`` = eager only when ``checkpoint_dir`` is set, where
    stages materialize to parquet anyway and per-stage walls are the
    point; pure in-memory throughput runs default to one lazy job
    cascade. Pass an explicit bool to override either way.
    """
    from sparkclone.cluster import (
        attach_clusters,
        cluster_sizes,
        connected_components,
        filter_clusters,
    )
    from sparkclone.rollup import rollup_findings

    from sparkclone.runtime import ensure_shipped

    ensure_shipped(spark)
    cfg = cfg or PipelineConfig()
    from sparkclone.checkpoint import corpus_fingerprint

    # checkpoint key = config hash + input snapshot: same config over a
    # DIFFERENT corpus snapshot must never resume the old snapshot's
    # stages (the Iceberg analogue keys on snapshot id).
    snap = snapshot_id or corpus_fingerprint(corpus)
    if eager_metrics is None:
        eager_metrics = checkpoint_dir is not None
    ck = CheckpointManager(
        spark, f"{cfg.config_hash()}-{snap}", checkpoint_dir, eager=eager_metrics
    )

    # The extraction stage is the Python-kernel-bound one (ast parsing in
    # mapInPandas): make sure it runs at full parallelism even when the
    # input arrives as a handful of parquet row groups. At cluster scale
    # the input already has many partitions and this is a no-op.
    #
    # The guard is `< 2*dp`, NOT `< dp`: partition COUNT lies for file
    # scans. Spark splits parquet by BYTE ranges but a reader only
    # produces rows for row groups that START in its range, so a
    # single-row-group file scanned at defaultParallelism=4 reports 4
    # partitions while every row sits in one of them — `< dp` skipped the
    # repartition and the entire Python extraction ran as ONE task
    # (measured: 175 s single-task vs 44 s repartitioned at local[4];
    # this silently poisoned the round-1/2 scaling baselines' N=4 level).
    # With `< 2*dp` any low-partition-count scan gets an explicit
    # round-robin spread; genuinely well-partitioned big inputs
    # (npart >= 2*dp) still skip the shuffle.
    dp = spark.sparkContext.defaultParallelism
    src = corpus
    if src.rdd.getNumPartitions() < 2 * dp:
        src = src.repartition(dp)

    # EXP call-graph facts AND resolved edges are checkpointed as their
    # own stages so incremental/probe runs can reuse them per-file /
    # per-caller (facts and edges for unchanged files stay valid across
    # snapshots — see incremental_scan_probe's diff-proportional merge).
    facts: DataFrame | None = None
    call_edge_df: DataFrame | None = None

    # file_manifest: (repo-qualified path, content_sha256) — the per-file
    # validity key for cross-snapshot snippet reuse below. Written under
    # the current key so FUTURE runs can reuse this run's snippets rows
    # per-file (the extraction analogue of the per-snippet signature
    # cache; round-3 verdict missing #4).
    if checkpoint_dir is not None:
        ck.load_or_compute(
            "file_manifest",
            lambda: src.select(
                F.concat_ws("/", "repo", "path").alias("path"), "content_sha256"
            ),
        )

    def _snippets() -> DataFrame:
        nonlocal facts, call_edge_df
        fresh_src = src
        reuse: DataFrame | None = None
        # Per-FILE resume (reference core/pipeline.py:50-88 cache
        # semantics, applied to the extraction stage): when a prior
        # snapshot under the same config completed snippets + manifest,
        # reuse its FUNC/WIN rows for every file whose content hash is
        # unchanged and run the Python AST kernel only over the rest.
        # EXP rows are excluded — their text depends on OTHER files
        # through the call graph, so per-file content identity is not a
        # validity key for them; they regenerate from the (checkpointed,
        # whole-stage-resumable) facts/edges stages.
        from sparkclone.extract import SNIPPET_SCHEMA

        expected_cols = set(SNIPPET_SCHEMA.fieldNames()) | {
            "text_hash", "token_hashes", "tokenset_hash"
        }
        priors = ck.find_prior_stages(["snippets", "file_manifest"])
        if (
            priors is not None
            and set(priors["snippets"].columns) == expected_cols
            and {"path", "content_sha256"}.issubset(priors["file_manifest"].columns)
        ):
            cur = src.select(
                F.concat_ws("/", "repo", "path").alias("path"), "content_sha256"
            )
            unchanged_fp = (
                priors["file_manifest"]
                .join(cur, ["path", "content_sha256"], "left_semi")
                .select("path")
                .dropDuplicates()
            )
            reuse = (
                priors["snippets"]
                .where(F.col("kind") != "EXP")
                .join(unchanged_fp, "path", "left_semi")
            )
            fresh_src = src.join(
                unchanged_fp.select(F.col("path").alias("__ufp")),
                F.concat_ws("/", "repo", "path") == F.col("__ufp"),
                "left_anti",
            )
            if ck.eager:
                ck.notes["snippet_files_reused"] = unchanged_fp.count()
                ck.notes["snippet_files_extracted"] = fresh_src.count()
        s = extract_snippets(fresh_src, cfg.windows, normalize=cfg.normalize_text)
        if cfg.expansion.enabled and cfg.expansion.depth > 0:
            from sparkclone.expansion import call_edges, expand_from_facts, file_facts

            facts = ck.load_or_compute(
                "call_facts", lambda: file_facts(src).localCheckpoint(eager=True)
            )
            call_edge_df = ck.load_or_compute(
                "call_edges", lambda: call_edges(facts).localCheckpoint(eager=True)
            )
            s = s.unionByName(
                expand_from_facts(facts, cfg.expansion, edges=call_edge_df)
            )
        tok = tokenize_snippets(s, cfg)
        return tok if reuse is None else reuse.unionByName(tok)

    snippets = ck.load_or_compute("snippets", _snippets)
    reps, star_edges = collapse_exact(snippets, aux_registry=ck.aux)

    # signatures drop the normalized text: every downstream consumer
    # (band table, verification sides) works on hashes/metadata, and the
    # LCS evidence join reads texts from the snippets stage for its tiny
    # SimHash-gated subset — keeping text here would fatten the widest
    # checkpoint and the verification joins for nothing.
    def _signatures() -> DataFrame:
        # the md5_portable scheme re-derives token strings from norm_text
        # (md5 needs strings); the fast path drops the text here so the
        # widest checkpoint carries only hashes
        if cfg.signature.scheme == "md5_portable":
            todo = reps.drop("text_hash")
        else:
            todo = reps.drop("norm_text", "text_hash")
        # Per-snippet resume (reference core/pipeline.py:50-88 embedding-
        # cache semantics): when this snapshot's signatures stage is
        # missing but an earlier snapshot completed one under the same
        # config, reuse its rows by content-addressed snippet_id and sign
        # only the misses — an interrupted/partial prior run re-signs
        # only what it never finished. Caveat (shared with the probe
        # path, incremental.py): snippet_id hashes (path, span, code
        # hash) but not the qualname, so a prior row may carry a stale
        # qualified_name if ONLY an enclosing class was renamed around
        # an otherwise-identical function at identical lines — accepted,
        # unit identity still differs via unit_id only in that row's
        # display fields, never in match topology at realistic odds.
        prior = ck.find_prior_stage("signatures")
        fresh_cols = [c for c in todo.columns if c != "norm_text"] + [
            "minhash", "simhash", "bands"
        ]
        if prior is None or not set(fresh_cols).issubset(prior.columns):
            return with_signatures(todo, cfg.signature)
        hits = prior.join(todo.select("snippet_id"), "snippet_id", "left_semi").select(
            *fresh_cols
        )
        misses = todo.join(prior.select("snippet_id"), "snippet_id", "left_anti")
        if ck.eager:
            # attribution counters only in eager runs: each count() is an
            # extra job round (prior scan + joins) — the same per-stage
            # coordination floor eager_metrics=False exists to remove
            ck.notes["signatures_reused"] = hits.count()
            ck.notes["signatures_computed"] = misses.count()
        return hits.unionByName(with_signatures(misses, cfg.signature))

    signatures = ck.load_or_compute("signatures", _signatures)

    # Single invocation of candidate_pairs feeds BOTH checkpointed stages:
    # bucket_stats derives from the (persisted) bucket-size aggregate the
    # pair routing itself uses, so the band table is computed once per run
    # — and zero times on resume, when both stages load from parquet.
    _cp: dict[str, tuple[DataFrame, DataFrame]] = {}

    def _pairs_and_stats() -> tuple[DataFrame, DataFrame]:
        if "r" not in _cp:
            _cp["r"] = candidate_pairs(signatures, cfg.lsh, aux_registry=ck.aux)
        return _cp["r"]

    pairs = ck.load_or_compute("candidate_pairs", lambda: _pairs_and_stats()[0])
    bucket_stats = ck.load_or_compute("bucket_stats", lambda: _pairs_and_stats()[1])

    def _verified() -> DataFrame:
        v = verify_candidates(pairs, signatures, cfg)
        v = with_lcs_evidence(v, cfg, snippets, aux_registry=ck.aux)
        return v.select(*_EDGE_COLS)

    verified = ck.load_or_compute("verified", _verified)
    edges = verified.unionByName(star_edges.select(*_EDGE_COLS))

    findings = ck.load_or_compute(
        "findings", lambda: rollup_findings(edges, cfg.thresholds)
    )
    membership = ck.load_or_compute(
        "clusters", lambda: connected_components(findings, cfg.cluster)
    )
    findings_clustered = filter_clusters(
        attach_clusters(findings, membership), cfg.cluster.min_size
    )
    ck.write_metrics_table()

    return {
        "snippets": snippets,
        "call_facts": facts,  # None unless expansion ran this session
        "call_edges": call_edge_df,  # None unless expansion ran this session
        "signatures": signatures,
        "candidate_pairs": pairs,
        "bucket_stats": bucket_stats,
        "star_edges": star_edges,
        "verified": verified,
        "findings": findings,
        "clusters": membership,
        "cluster_sizes": cluster_sizes(membership),
        "findings_clustered": findings_clustered,
        "metrics": ck,
    }


def cluster_pairs(membership: DataFrame) -> DataFrame:
    """All unordered unit pairs implied by cluster membership — the
    quantity the dup-pair recall metric compares (SURVEY.md §6). Pure SQL:
    a within-cluster self-join."""
    m = membership.select("cluster_id", F.col("unit_id"))
    a = m.select("cluster_id", F.col("unit_id").alias("ua"))
    b = m.select("cluster_id", F.col("unit_id").alias("ub"))
    return (
        a.join(b, "cluster_id")
        .where(F.col("ua") < F.col("ub"))
        .select("cluster_id", "ua", "ub")
    )
