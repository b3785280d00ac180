"""Incremental / diff scan (reference S3 + P10 + J5).

The reference's ``clonehunter diff --base REF`` collects the changed file
set from git (io/git.py:12-23), scans the FULL repo, and post-filters
findings to those touching a changed file (cli/commands/diff.py:60-68) —
changed-vs-ALL semantics, not changed-vs-changed.

Spark-native equivalents:
  - ``changed_files``: snapshot diff — the new corpus anti-joined against
    a previous snapshot on (repo, path, content_sha256); rows whose
    content hash changed or that are new. (The Iceberg production analogue
    is an incremental read between snapshots; this is the same relation.)
  - ``diff_filter_findings``: semi-join findings against the changed set
    on EITHER endpoint's path (P10/J5 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changed_files(corpus_new: DataFrame, corpus_old: DataFrame) -> DataFrame:
    """(repo, path) rows that are new or whose content changed vs the old
    snapshot. Both inputs need (repo, path, content_sha256)."""
    key = ["repo", "path", "content_sha256"]
    return (
        corpus_new.select(*key)
        .join(corpus_old.select(*key), key, "left_anti")
        .select("repo", "path", F.concat_ws("/", "repo", "path").alias("fpath"))
    )


def diff_filter_findings(findings: DataFrame, changed: DataFrame) -> DataFrame:
    """Keep findings touching at least one changed file — changed-vs-all
    (diff.py:62-68). findings carry repo-qualified `path_a`/`path_b`."""
    ch = changed.select(F.col("fpath")).dropDuplicates()
    hit_a = findings.join(ch, findings["path_a"] == ch["fpath"], "left_semi")
    hit_b = findings.join(ch, findings["path_b"] == ch["fpath"], "left_semi")
    return hit_a.unionByName(hit_b).dropDuplicates(["unit_a", "unit_b"])


def incremental_scan(
    spark,
    corpus_new: DataFrame,
    corpus_old: DataFrame,
    cfg=None,
    checkpoint_dir: str | None = None,
    snapshot_id: str | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline over the new corpus + diff-filtered findings
    (mirrors run_diff's full-scan-then-filter, diff.py:36-69). For rescan
    cost that scales with the diff instead of the corpus, see
    :func:`incremental_scan_probe`."""
    from sparkclone.pipeline import run_pipeline

    out = run_pipeline(
        spark, corpus_new, cfg, checkpoint_dir=checkpoint_dir, snapshot_id=snapshot_id
    )
    ch = changed_files(corpus_new, corpus_old)
    out["changed_files"] = ch
    out["diff_findings"] = diff_filter_findings(out["findings"], ch)
    return out


def incremental_scan_probe(
    spark,
    corpus_new: DataFrame,
    base_snippets: DataFrame,
    base_signatures: DataFrame,
    corpus_old: DataFrame,
    cfg=None,
    base_facts: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Probe-side LSH diff: identical diff_findings to
    ``incremental_scan`` (changed-vs-ALL), with per-stage cost scaling in
    the CHANGED set, not the corpus:

      - extraction (the Python-kernel stage) runs only over changed
        files; unchanged files' tokenized snippets load from the base
        run's ``snippets`` checkpoint (snippets of deleted/changed paths
        are anti-joined away);
      - MinHash/SimHash computation is per-snippet incremental: the base
        ``signatures`` checkpoint is reused via a left-anti join on
        snippet_id and only cache-miss snippets are signed — the
        left-anti-join analogue of the reference's content-addressed
        embedding cache (core/pipeline.py:50-88, SURVEY E3);
      - candidate generation probes ONLY the changed representatives'
        band rows against the full band table, so pair volume scales
        with the changed buckets (the north rule's probe-side reserve).

    Exact-dup collapse is recomputed ONLY for affected token-set groups
    (a group is affected when it gains a member from a changed file or
    loses one from a changed/deleted file). An unaffected group has
    identical membership in both corpus states, so its base
    representative, star edges, and signature remain valid and are kept
    via broadcast anti-joins — the full corpus is never shuffled.

    EXP snippets (``cfg.expansion.enabled``): supported when the base
    run's ``call_facts`` checkpoint is supplied as ``base_facts``. The
    per-file Python AST kernel (fact extraction) runs only over changed
    files; facts for unchanged files are reused from the base (rows at
    changed/deleted paths anti-joined away). Expansion itself — call
    resolution joins, BFS, text assembly — re-runs over the merged facts
    table, because a changed file can alter the expansion of an UNCHANGED
    origin (changed callee body, changed import resolution, changed
    factory/class tables); unchanged origins reproduce byte-identical EXP
    snippets (deterministic snippet_id), so their signatures still hit the
    per-snippet cache and the affected-group detection sees exactly the
    EXP rows whose content really changed (symmetric snippet_id diff).
    """
    from pyspark.sql import functions as F

    from sparkclone.config import PipelineConfig
    from sparkclone.extract import extract_snippets
    from sparkclone.lsh import band_table, probe_candidate_pairs
    from sparkclone.pipeline import collapse_exact, tokenize_snippets
    from sparkclone.rollup import rollup_findings
    from sparkclone.runtime import ensure_shipped
    from sparkclone.signatures import with_signatures
    from sparkclone.verify import attach_sides, verify_pairs, with_lcs_evidence

    ensure_shipped(spark)
    cfg = cfg or PipelineConfig()
    if cfg.expansion.enabled and cfg.expansion.depth > 0 and base_facts is None:
        raise ValueError(
            "probe-side incremental scan with EXP expansion needs the base "
            "run's call_facts checkpoint (pass base_facts)"
        )

    # localCheckpoint (not persist) throughout: the probe dataflow is a
    # DAG — signatures feeds four consumers, affected three — and an
    # uncut logical plan re-embeds the whole upstream tree per branch
    # until Catalyst spends minutes optimizing a ~MB plan (measured:
    # 105 s to verify 3 rows). Truncating lineage keeps planning O(stages).
    changed = changed_files(corpus_new, corpus_old).localCheckpoint(eager=True)
    changed_fp = changed.select(F.col("fpath").alias("__chfp"))
    new_paths = corpus_new.select(F.concat_ws("/", "repo", "path").alias("fpath"))
    old_paths = corpus_old.select(F.concat_ws("/", "repo", "path").alias("fpath"))
    # paths whose snippets leave the corpus state: changed (replaced) or
    # deleted (present in old only)
    gone_fp = (
        old_paths.join(new_paths, "fpath", "left_anti")
        .unionByName(changed.select("fpath"))
        .dropDuplicates()
        .select(F.col("fpath").alias("__gonefp"))
        .localCheckpoint(eager=True)
    )

    # 1. extract ONLY changed files; everything else stays parquet-side.
    # The explicit repartition spreads the Python extraction even when the
    # semi-joined scan collapses to one non-empty partition (single-row-
    # group parquet pathology — see run_pipeline's guard); the shuffle
    # moves only the changed files.
    changed_corpus = corpus_new.join(
        F.broadcast(changed.select("repo", "path")), ["repo", "path"], "left_semi"
    ).repartition(spark.sparkContext.defaultParallelism)
    new_snips = tokenize_snippets(
        extract_snippets(changed_corpus, cfg.windows, normalize=cfg.normalize_text), cfg
    ).localCheckpoint(eager=True)

    # 1b. EXP: re-extract call facts for changed files only, merge with the
    # base facts of surviving files, regenerate EXP snippets from the
    # merged graph. Unchanged origins reproduce identical snippet_ids, so
    # only genuinely changed expansions surface in the symmetric diff
    # below (and only those mark groups affected / miss the sig cache).
    base_exp = base_snippets.where(F.col("kind") == "EXP")
    base_nonexp = base_snippets.where(F.col("kind") != "EXP")
    exp_extra_affected = None
    if cfg.expansion.enabled and cfg.expansion.depth > 0:
        from sparkclone.expansion import expand_from_facts, file_facts

        kept_facts = base_facts.join(
            F.broadcast(gone_fp), base_facts["path"] == F.col("__gonefp"), "left_anti"
        )
        facts = (
            kept_facts.unionByName(file_facts(changed_corpus))
            .localCheckpoint(eager=True)
        )
        exp_snips = tokenize_snippets(
            expand_from_facts(facts, cfg.expansion), cfg
        ).localCheckpoint(eager=True)
        exp_new_only = exp_snips.join(
            base_exp.select("snippet_id"), "snippet_id", "left_anti"
        )
        exp_gone = base_exp.join(
            exp_snips.select("snippet_id"), "snippet_id", "left_anti"
        )
        exp_extra_affected = (
            exp_new_only.select("tokenset_hash")
            .unionByName(exp_gone.select("tokenset_hash"))
        )
    else:
        exp_snips = None

    # 2. AFFECTED token-set groups: any group that gains a member (new
    # snippets, changed EXP expansions) or loses one (base snippets at
    # changed/deleted paths, EXP rows whose expansion changed).
    # Unaffected groups have identical membership in old and new corpus
    # state, so their base representative AND its signature stay valid —
    # they are kept via broadcast anti-joins, never shuffled. Collapse +
    # signing then run over affected groups only: every stage below
    # scales with the diff, not the corpus.
    affected = new_snips.select("tokenset_hash").unionByName(
        base_snippets.join(
            F.broadcast(gone_fp), base_snippets["path"] == F.col("__gonefp"), "left_semi"
        ).select("tokenset_hash")
    )
    if exp_extra_affected is not None:
        affected = affected.unionByName(exp_extra_affected)
    affected = affected.dropDuplicates().localCheckpoint(eager=True)
    if exp_snips is not None:
        # base EXP rows are superseded wholesale by the regenerated set
        # (identical rows for unchanged origins, fresh rows otherwise)
        kept_base = base_nonexp.join(
            F.broadcast(gone_fp), base_nonexp["path"] == F.col("__gonefp"), "left_anti"
        )
        all_snips = kept_base.unionByName(new_snips).unionByName(exp_snips)
    else:
        kept_base = base_snippets.join(
            F.broadcast(gone_fp), base_snippets["path"] == F.col("__gonefp"), "left_anti"
        )
        all_snips = kept_base.unionByName(new_snips)
    aff_snips = all_snips.join(F.broadcast(affected), "tokenset_hash", "left_semi")
    reps_sub, star_edges = collapse_exact(aff_snips)
    reps_sub = reps_sub.localCheckpoint(eager=True)
    star_edges = star_edges.localCheckpoint(eager=True)

    # per-snippet signature cache for the affected reps (content-addressed
    # left-anti reuse — the reference's embedding-cache analogue); the
    # unaffected base signatures join in untouched
    cached_sub = base_signatures.join(
        F.broadcast(reps_sub.select("snippet_id")), "snippet_id", "left_semi"
    )
    misses = reps_sub.drop("norm_text", "text_hash").join(
        F.broadcast(cached_sub.select("snippet_id")), "snippet_id", "left_anti"
    )
    live_fp = new_paths.dropDuplicates().select(F.col("fpath").alias("__livefp"))
    keep_base_sigs = (
        base_signatures.join(F.broadcast(affected), "tokenset_hash", "left_anti")
        .join(F.broadcast(live_fp), base_signatures["path"] == F.col("__livefp"), "left_semi")
    )
    signatures = keep_base_sigs.unionByName(
        cached_sub.unionByName(with_signatures(misses, cfg.signature))
    ).localCheckpoint(eager=True)

    # 3. probe: changed reps' band rows vs the full band table (band rows
    # of the unaffected side are produced by a narrow explode and
    # filtered by broadcast bucket keys — see probe_candidate_pairs)
    bt_all = band_table(signatures)
    changed_rep_ids = reps_sub.join(
        F.broadcast(changed_fp), reps_sub["path"] == F.col("__chfp"), "left_semi"
    ).select(F.col("snippet_id").alias("id"))
    pairs = probe_candidate_pairs(bt_all, changed_rep_ids, cfg.lsh)

    aux: list = []
    verified = with_lcs_evidence(
        verify_pairs(attach_sides(pairs, signatures), cfg), cfg, all_snips,
        aux_registry=aux,
    )
    from sparkclone.pipeline import _EDGE_COLS

    # star edges are already diff-proportional (collapse ran over the
    # affected groups only); non-changed-touching ones among them are
    # dropped by the final filter
    edges = verified.select(*_EDGE_COLS).unionByName(star_edges.select(*_EDGE_COLS))
    findings = rollup_findings(edges, cfg.thresholds)
    diff_findings = diff_filter_findings(findings, changed)
    def _release() -> None:
        for df in aux:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass
        aux.clear()

    return {
        "changed_files": changed,
        "snippets": all_snips,
        "signatures": signatures,
        "candidate_pairs": pairs,
        "diff_findings": diff_findings,
        "release": _release,
    }
