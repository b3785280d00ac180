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
) -> dict[str, DataFrame]:
    """Full pipeline over the new corpus + diff-filtered findings
    (mirrors run_diff's full-scan-then-filter, diff.py:36-69). A future
    optimization is probe-side LSH (new files' band hashes against the
    checkpointed bucket table) — semantics preserved either way."""
    from sparkclone.pipeline import run_pipeline

    out = run_pipeline(spark, corpus_new, cfg, checkpoint_dir=checkpoint_dir)
    ch = changed_files(corpus_new, corpus_old)
    out["changed_files"] = ch
    out["diff_findings"] = diff_filter_findings(out["findings"], ch)
    return out
