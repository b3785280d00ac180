"""Degenerate inputs must not crash and must drop junk: empty corpus,
null content, whitespace-only files, broken Python, oversized texts,
unicode (verify-skill flow list; reference analogues in
tests/test_error_paths.py and parsing/text_units.py:15-16)."""

from __future__ import annotations

import pytest

from sparkclone.config import benchmark_config
from sparkclone.pipeline import run_pipeline

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _corpus(spark, rows):
    import pyspark.sql.functions as F

    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "content_sha256", F.sha2("content", 256)
    )


def test_empty_corpus(spark):
    out = run_pipeline(spark, _corpus(spark, []), benchmark_config())
    assert out["findings"].count() == 0
    assert out["clusters"].count() == 0
    assert out["cluster_sizes"].count() == 0


def test_null_and_whitespace_content(spark):
    rows = [
        ("r/a", "null.py", "0" * 40, "python", None),
        ("r/a", "blank.py", "0" * 40, "python", "   \n\n\t\n"),
        ("r/a", "blank.txt", "0" * 40, "text", " \n "),
    ]
    out = run_pipeline(spark, _corpus(spark, rows), benchmark_config())
    assert out["snippets"].count() == 0
    assert out["findings"].count() == 0


def test_broken_python_only(spark):
    rows = [
        ("r/a", f"bad_{i}.py", "0" * 40, "python", "def broken(:\n    pass\n")
        for i in range(3)
    ]
    out = run_pipeline(spark, _corpus(spark, rows), benchmark_config())
    # unparsable python yields no units (python_ast.py:26-28 semantics)
    assert out["snippets"].count() == 0


def test_identical_broken_text_files_still_cluster(spark):
    """Non-Python files skip the AST path: identical junk .txt files are
    whole-file units and exact-collapse into one cluster."""
    text = "not python ( but [ identical } content\nacross several lines\nwith tokens\nand more\n"
    rows = [("r/a", f"junk_{i}.txt", "0" * 40, "text", text) for i in range(4)]
    out = run_pipeline(spark, _corpus(spark, rows), benchmark_config())
    sizes = out["cluster_sizes"].collect()
    assert len(sizes) == 1 and sizes[0]["member_count"] == 4


def test_oversized_text_dropped_with_no_crash(spark):
    from dataclasses import replace

    from sparkclone.config import LshConfig

    cfg = replace(benchmark_config(), lsh=LshConfig(max_text_chars=100))
    big = "tok%d " * 1 % 0 + ("x" * 5000) + "\n"
    rows = [
        ("r/a", "big.txt", "0" * 40, "text", big),
        ("r/a", "small.txt", "0" * 40, "text", "small tokens here\n"),
    ]
    out = run_pipeline(spark, _corpus(spark, rows), cfg)
    paths = {r["path"] for r in out["snippets"].select("path").distinct().collect()}
    assert not any(p.endswith("big.txt") for p in paths)


def test_unicode_content(spark):
    src = "def grüße(への):\n    return への + 'δ'\n"
    rows = [
        ("r/a", "u1.py", "0" * 40, "python", src),
        ("r/b", "u2.py", "0" * 40, "python", src),
    ]
    out = run_pipeline(spark, _corpus(spark, rows), benchmark_config())
    assert out["findings"].count() >= 1


def test_single_file_corpus(spark):
    rows = [("r/a", "only.py", "0" * 40, "python", "def f(x):\n    return x + 1\n")]
    out = run_pipeline(spark, _corpus(spark, rows), benchmark_config())
    assert out["findings"].count() == 0
    assert out["candidate_pairs"].count() == 0
