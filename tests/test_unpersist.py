"""Unpersist hygiene: a pipeline run must not leak cached blocks into the
session once its outputs are consumed and release() is called (round-2
verdict "What's wrong" #4).

localCheckpoint()ed frames are exempt by design — their cached blocks ARE
the truncated lineage — so the assertion distinguishes them via
RDD.isLocallyCheckpointed().
"""

from __future__ import annotations


def _cached_rdd_ids(spark) -> dict[int, bool]:
    """id -> is_locally_checkpointed for every currently persisted RDD."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    out = {}
    for entry in jmap.entrySet().toArray():
        jrdd = entry.getValue()
        out[entry.getKey()] = bool(jrdd.rdd().isLocallyCheckpointed())
    return out


def test_run_pipeline_release_frees_all_caches(spark, corpus_parquet):
    from sparkclone.config import benchmark_config
    from sparkclone.pipeline import load_corpus, run_pipeline

    before = set(_cached_rdd_ids(spark))
    out = run_pipeline(spark, load_corpus(spark, corpus_parquet), benchmark_config())
    # consume the outputs fully (findings + clusters + stats)
    out["findings"].count()
    out["cluster_sizes"].count()
    out["bucket_stats"].count()

    during = _cached_rdd_ids(spark)
    new_plain = [i for i, is_lc in during.items() if i not in before and not is_lc]
    assert new_plain, "expected the run to cache stages while alive"

    out["metrics"].release()
    after = _cached_rdd_ids(spark)
    leaked = [i for i, is_lc in after.items() if i not in before and not is_lc]
    assert leaked == [], f"non-localCheckpoint caches leaked after release(): {leaked}"


def test_probe_release_frees_verify_cache(spark, corpus_parquet):
    import tempfile

    from sparkclone.config import benchmark_config
    from sparkclone.incremental import incremental_scan_probe
    from sparkclone.pipeline import load_corpus, run_pipeline

    corpus = load_corpus(spark, corpus_parquet)
    old = corpus.where("path not like '%util0%'")
    ck = tempfile.mkdtemp(prefix="probe-release-ck-")
    base = run_pipeline(spark, old, benchmark_config(), checkpoint_dir=ck)

    before = set(_cached_rdd_ids(spark))
    probe = incremental_scan_probe(
        spark, corpus, base["snippets"], base["signatures"], old, benchmark_config()
    )
    probe["diff_findings"].count()
    probe["release"]()
    base["metrics"].release()
    after = _cached_rdd_ids(spark)
    leaked = [i for i, is_lc in after.items() if i not in before and not is_lc]
    assert leaked == [], f"probe leaked non-localCheckpoint caches: {leaked}"
