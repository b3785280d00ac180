"""Physical/optimized-plan assertions: the properties that make the
pipeline 100TB-viable must hold in the PLAN, not just in intent —
column pruning at the scan, hash-only verification joins, broadcast
dimension joins. These are regression guards for the .explain-driven
tuning the engine was built with."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_parquet):
    from sparkclone.pipeline import load_corpus

    return load_corpus(spark, corpus_parquet)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_scan_prunes_columns(spark, corpus_df):
    """The parquet scan feeding extraction must read only the five input
    columns — a scan that drags extra columns into the mapInPandas batch
    wastes Arrow bandwidth on every file at 100 TB."""
    from sparkclone.config import benchmark_config
    from sparkclone.extract import extract_snippets

    snips = extract_snippets(corpus_df, benchmark_config().windows)
    plan = _executed(snips)
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        schema = ln.split("ReadSchema:")[1]
        for col in ("repo", "path", "commit", "lang", "content"):
            assert col in schema
        assert "content_sha256" not in schema  # derived, not scanned


def test_verification_join_carries_hashes_not_text(spark, corpus_df):
    """The pair-verification joins are the widest shuffle in the job;
    they must move xxhash64 token arrays, never the normalized text
    (texts join in later, only for the SimHash-gated LCS subset)."""
    from sparkclone.config import benchmark_config
    from sparkclone.extract import extract_snippets
    from sparkclone.lsh import candidate_pairs
    from sparkclone.pipeline import collapse_exact, tokenize_snippets
    from sparkclone.signatures import with_signatures
    from sparkclone.verify import attach_sides, verify_pairs

    cfg = benchmark_config()
    snips = tokenize_snippets(extract_snippets(corpus_df, cfg.windows), cfg)
    reps, _ = collapse_exact(snips)
    sigs = with_signatures(reps.drop("norm_text", "text_hash"), cfg.signature)
    pairs, _ = candidate_pairs(sigs, cfg.lsh)
    attached = attach_sides(pairs, sigs)
    verified = verify_pairs(attached, cfg)
    # the rows flowing through the pair join carry hash arrays, not text
    # (norm_text may appear in the plan only inside the narrow token-
    # derivation expressions upstream of the collapse shuffle)
    assert "token_hashes_a" in attached.columns and "token_hashes_b" in attached.columns
    assert not any("norm_text" in c or c == "tokens" for c in attached.columns)
    assert not any("norm_text" in c for c in verified.columns)


def test_dim_joins_are_broadcast(spark):
    """revenue_by_nation: region/nation/supplier must broadcast; only
    the fact-fact join and the aggregation may shuffle."""
    import __spark_entry__ as entry

    df = entry._q_revenue_by_nation(spark, "/root/testdata/sf0.001")
    plan = _executed(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_candidate_generation_has_no_cartesian(spark, corpus_df):
    """No CartesianProduct / BroadcastNestedLoopJoin anywhere in the
    candidate-pair plan — the LSH design exists precisely to avoid
    all-pairs comparison."""
    from sparkclone.config import benchmark_config
    from sparkclone.extract import extract_snippets
    from sparkclone.lsh import candidate_pairs
    from sparkclone.pipeline import collapse_exact, tokenize_snippets
    from sparkclone.signatures import with_signatures

    cfg = benchmark_config()
    snips = tokenize_snippets(extract_snippets(corpus_df, cfg.windows), cfg)
    reps, _ = collapse_exact(snips)
    sigs = with_signatures(reps.drop("norm_text", "text_hash"), cfg.signature)
    pairs, _ = candidate_pairs(sigs, cfg.lsh)
    plan = _executed(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_single_row_group_corpus_extracts_in_parallel(spark, corpus_rows, tmp_path):
    """Parquet byte-range splits only yield rows for row groups STARTING in
    the range: a single-row-group file reports N scan partitions with every
    row in one of them. run_pipeline must detect this shape and spread the
    Python extraction anyway (round-3 discovery: the old `< dp` guard left
    the whole extraction in ONE task and poisoned the N=4 scaling level)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparkclone.config import benchmark_config
    from sparkclone.pipeline import load_corpus, run_pipeline

    path = str(tmp_path / "one_group.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": [r.repo for r in corpus_rows],
                "path": [r.path for r in corpus_rows],
                "commit": [r.commit for r in corpus_rows],
                "lang": [r.lang for r in corpus_rows],
                "content": [r.content for r in corpus_rows],
            }
        ),
        path,
        row_group_size=10**6,  # force the pathological single-group layout
    )
    corpus = load_corpus(spark, path)
    # the pathology this guards against: >1 scan partitions, all rows in one
    dist = corpus.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert len([r for r in dist if r["count"] > 0]) == 1

    out = run_pipeline(spark, corpus, benchmark_config(), eager_metrics=False)
    sdist = (
        out["snippets"].groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    nonempty = [r for r in sdist if r["count"] > 0]
    assert len(nonempty) >= spark.sparkContext.defaultParallelism // 2, (
        f"extraction not spread: {sdist}"
    )
    out["metrics"].release()
