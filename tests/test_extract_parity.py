"""Extraction/windowing parity vs the reference over the whole synthetic
corpus: same units, same snippet spans, same normalized texts.

snippet hashes differ by design (the reference hashes absolute scan paths;
we hash repo-qualified corpus paths), so the comparison key is
(repo-relative path, kind, start_line, end_line, norm_text)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/reference/src")


@pytest.fixture(scope="module")
def ref_snippets(corpus_dir):
    from oracle_util import _install_tqdm_stub

    _install_tqdm_stub()
    from clonehunter.io.fs import collect_files
    from clonehunter.parsing.python_ast import extract_functions
    from clonehunter.parsing.text_units import extract_file_unit
    from clonehunter.snippets.generators import (
        WindowParams,
        generate_function_snippets,
        generate_window_snippets,
    )

    files = collect_files(
        [corpus_dir], ["**/*.py", "**/*.ts", "**/*.js", "**/*.txt"], []
    )
    pyfn, wunits = [], []
    for f in files:
        if f.language == "python":
            ex = extract_functions(f)
            pyfn.extend(ex)
            wunits.extend(ex)
        else:
            wunits.extend(extract_file_unit(f))
    snippets = generate_function_snippets(pyfn)
    snippets += generate_window_snippets(wunits, WindowParams(12, 6, 4))
    prefix = corpus_dir.rstrip("/") + "/"
    return {
        (
            s.function.file.path.replace(prefix, "", 1),
            s.kind,
            s.start_line,
            s.end_line,
            s.text,
        )
        for s in snippets
    }


def test_snippet_universe_parity(ref_snippets, spark, corpus_parquet):
    """Every (path, kind, span, normalized text) tuple matches the
    reference exactly BEFORE our empty-token/length filters."""
    from sparkclone.config import benchmark_config
    from sparkclone.extract import extract_snippets
    from sparkclone.pipeline import load_corpus

    cfg = benchmark_config()
    ours_df = extract_snippets(load_corpus(spark, corpus_parquet), cfg.windows)
    ours = {
        (r["path"], r["kind"], r["start_line"], r["end_line"], r["norm_text"])
        for r in ours_df.collect()
    }
    assert ours == ref_snippets


def test_window_spans_match_reference_generator():
    """Micro-check of the stepping rule (generators.py:63-74):
    10-line unit, window 3 / stride 2 -> starts 1,3,5,7,9."""
    from sparkclone.config import WindowConfig
    from sparkclone.extract import _window_spans

    spans = list(_window_spans(10, WindowConfig(3, 2, 0)))
    assert spans == [(1, 3), (3, 5), (5, 7), (7, 9), (9, 10)]


def test_stride_zero_raises():
    from sparkclone.config import WindowConfig
    from sparkclone.extract import _window_spans

    with pytest.raises(ValueError):
        list(_window_spans(5, WindowConfig(3, 0, 0)))
