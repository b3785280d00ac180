"""Shared fixtures: one SparkSession per test session, one synthetic corpus."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pytest

SRC = str(Path(__file__).parent.parent / "src")
if SRC not in sys.path:
    sys.path.insert(0, SRC)
TESTS = str(Path(__file__).parent)
if TESTS not in sys.path:
    sys.path.insert(0, TESTS)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("sparkclone-tests")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        # the hybrid-CC one-fetch finish and report rendering route
        # through toPandas; without this conf PySpark falls back to the
        # plain collect path (Row objects + pandas conversion)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    from sparkclone.runtime import ensure_shipped

    ensure_shipped(s)
    yield s


@pytest.fixture(scope="session")
def corpus_rows():
    from sparkclone.corpus import generate_corpus_rows

    return generate_corpus_rows()


@pytest.fixture(scope="session")
def corpus_parquet(corpus_rows):
    from sparkclone.corpus import rows_to_parquet

    d = tempfile.mkdtemp(prefix="sparkclone-corpus-")
    path = f"{d}/corpus.parquet"
    rows_to_parquet(corpus_rows, path)
    return path


@pytest.fixture(scope="session")
def corpus_dir(corpus_rows):
    """Corpus rendered as real files for the reference oracle."""
    from sparkclone.corpus import render_to_dir

    d = tempfile.mkdtemp(prefix="sparkclone-render-")
    return render_to_dir(corpus_rows, d)


@pytest.fixture(scope="session")
def pipeline_output(spark, corpus_parquet):
    """Full pipeline run at benchmark config, shared across tests."""
    from sparkclone.config import benchmark_config
    from sparkclone.pipeline import load_corpus, run_pipeline

    corpus = load_corpus(spark, corpus_parquet)
    return run_pipeline(spark, corpus, benchmark_config())
