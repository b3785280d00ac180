"""Unit extraction + snippet generation as vectorized Arrow UDF stages.

Reference semantics being re-expressed (not ported):
  - Python function extraction: ``parsing/python_ast.py:24-67`` — an
    ``ast.NodeVisitor`` keeping a qualname stack over FunctionDef /
    AsyncFunctionDef / ClassDef; every (nested) function becomes a unit
    with its line span and source slice; syntax errors yield no units.
  - whole-file unit for non-Python files: ``parsing/text_units.py:9-27``;
    whitespace-only files dropped (``text_units.py:15-16``).
  - FUNC snippets: ``snippets/generators.py:34-50``.
  - WIN sliding windows: ``snippets/generators.py:53-74`` — windows of
    ``window_lines`` stepping ``stride_lines`` over the unit's code lines,
    kept only with >= ``min_nonempty`` non-blank lines; snippet line
    numbers are absolute (unit start + offset).
  - unit identity: ``core/types.py:26-29`` (path:qname:start:end);
    snippet hash recipes: ``generators.py:21-23,37-39``.

Execution model: ONE ``mapInPandas`` pass per corpus partition turns file
rows into snippet rows (corpus -> snippets is a pure flatMap, so no
shuffle); everything downstream (token sets, hashes) is JVM-side column
work. Arrow batches bound memory; per-file Python cost is the ``ast``
parse, which is the irreducible Python kernel here.
"""

from __future__ import annotations

import ast
import hashlib
from collections.abc import Iterator
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from sparkclone.config import WindowConfig
from sparkclone.normalize import normalize_source

# Languages routed through the Python AST extractor; everything else is a
# whole-file unit (the reference's binary python/text split, io/fs.py:11-14,
# generalized to a real `lang` column).
PYTHON_LANGS = frozenset({"python", "py"})

SNIPPET_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("unit_id", StringType()),  # path:qualname:start:end
        StructField("qualified_name", StringType()),
        StructField("unit_start", IntegerType()),
        StructField("unit_end", IntegerType()),
        StructField("kind", StringType()),  # FUNC | WIN
        StructField("start_line", IntegerType()),  # absolute, inclusive
        StructField("end_line", IntegerType()),
        StructField("snippet_id", StringType()),  # sha256 recipe (deterministic)
        StructField("norm_text", StringType()),
    ]
)


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


class _Unit(NamedTuple):
    qualified_name: str
    start_line: int
    end_line: int
    code: str
    code_hash: str


def _extract_python_units(content: str) -> list[_Unit]:
    """Every (nested) function in the file, qualname-stacked; [] on any
    parse failure (python_ast.py:26-28)."""
    try:
        tree = ast.parse(content)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return []
    lines = content.splitlines()
    units: list[_Unit] = []
    stack: list[str] = []

    def visit(node: ast.AST) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                start = child.lineno
                end = child.end_lineno or start
                code = "\n".join(lines[start - 1 : end])
                qualname = ".".join([*stack, child.name])
                units.append(_Unit(qualname, start, end, code, _sha256(code)))
                stack.append(child.name)
                visit(child)
                stack.pop()
            elif isinstance(child, ast.ClassDef):
                stack.append(child.name)
                visit(child)
                stack.pop()
            else:
                visit(child)

    visit(tree)
    return units


def _file_unit(path: str, content: str) -> list[_Unit]:
    """Whole-file unit named by filename; whitespace-only files dropped
    (text_units.py:15-27)."""
    if not content.strip():
        return []
    end_line = max(1, len(content.splitlines()))
    name = path.rsplit("/", 1)[-1]
    return [_Unit(name, 1, end_line, content, _sha256(content))]


# --- extractor registry (reference model/registry.py seam) -----------------
# lang (lowercased) -> (path, content) -> list[_Unit]. Unregistered langs
# fall back to the whole-file "text" extractor. A registered extractor with
# ``emits_func = True`` also produces FUNC snippets for its units.


def _python_extractor(path: str, content: str) -> list[_Unit]:
    return _extract_python_units(content)


_python_extractor.emits_func = True  # type: ignore[attr-defined]

from sparkclone import registry as _registry  # noqa: E402

for _lang in PYTHON_LANGS:
    _registry.register("extractor", _lang, _python_extractor)
_registry.register("extractor", "text", _file_unit)


def _window_spans(n_lines: int, w: WindowConfig) -> Iterator[tuple[int, int]]:
    """1-based inclusive (start, end) spans, mirroring generators.py:63-74."""
    if w.window_lines <= 0:
        raise ValueError("window_lines must be > 0")
    if w.stride_lines <= 0:
        raise ValueError("stride_lines must be > 0")
    idx = 0
    while idx < n_lines:
        yield idx + 1, min(idx + w.window_lines, n_lines)
        idx += w.stride_lines


def _snippet_rows_for_file(
    repo: str,
    path: str,
    commit: str,
    lang: str,
    content: str,
    windows: WindowConfig,
    normalize: bool = True,
    extractors: dict | None = None,
) -> Iterator[tuple]:
    # The reference's identity/hash recipes key on the file *path*
    # (core/types.py:26-29, generators.py:21-23,37-39) — unique within its
    # single scanned tree. Our corpus key is (repo, path), so we qualify
    # the path with the repo; this equals the relative path the oracle
    # sees when the corpus is rendered to {root}/{repo}/{path}.
    fpath = f"{repo}/{path}"
    table = extractors if extractors is not None else _registry.snapshot("extractor")
    extractor = table.get((lang or "").lower(), table["text"])
    emits_func = bool(getattr(extractor, "emits_func", False))
    units = extractor(path, content)
    for u in units:
        unit_id = f"{fpath}:{u.qualified_name}:{u.start_line}:{u.end_line}"
        if emits_func:
            # FUNC snippets exist only for Python functions — non-Python
            # whole-file units get WIN windows only (core/pipeline.py:
            # 143-152: generate_function_snippets(python_functions) while
            # window_units carries both). Hash recipe: generators.py:37-39.
            func_hash = _sha256(f"FUNC:{fpath}:{u.start_line}:{u.end_line}:{u.code_hash}")
            yield (
                repo, fpath, commit, lang, unit_id, u.qualified_name,
                u.start_line, u.end_line, "FUNC", u.start_line, u.end_line,
                func_hash, normalize_source(u.code) if normalize else u.code,
            )
        # WIN snippets (generators.py:53-74 + _make_snippet :17-31).
        lines = u.code.splitlines()
        if not lines:
            continue
        for start, end in _window_spans(len(lines), windows):
            window_lines = lines[start - 1 : end]
            nonempty = sum(1 for ln in window_lines if ln.strip())
            if nonempty < windows.min_nonempty:
                continue
            raw = "\n".join(window_lines)
            text = normalize_source(raw) if normalize else raw
            win_hash = _sha256(
                f"WIN:{fpath}:{u.start_line}:{u.end_line}:{u.code_hash}:{start}:{end}:{text}"
            )
            yield (
                repo, fpath, commit, lang, unit_id, u.qualified_name,
                u.start_line, u.end_line, "WIN",
                u.start_line + start - 1, u.start_line + end - 1,
                win_hash, text,
            )


def extract_snippets(
    corpus: DataFrame, windows: WindowConfig, normalize: bool = True
) -> DataFrame:
    """corpus(repo, path, commit, lang, content) -> snippets DataFrame.

    Single narrow ``mapInPandas`` pass (no shuffle); the returned frame has
    SNIPPET_SCHEMA. Column pruning still works upstream: we select only the
    five input columns before the UDF so a parquet/Iceberg scan reads just
    those.

    ``normalize=False`` skips normalize_source and keeps raw snippet text
    (PipelineConfig.normalize_text — raw mode for non-code corpora).
    """
    cols = ["repo", "path", "commit", "lang", "content"]
    src = corpus.select(*cols)
    names = list(SNIPPET_SCHEMA.fieldNames())
    # snapshot the extractor registry at plan-build time so executors use
    # exactly the components registered on the driver (custom extractors
    # must be importable worker-side — ship via --py-files)
    extractors = _registry.snapshot("extractor")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [
                row
                for repo, path, commit, lang, content in batch[cols].itertuples(index=False)
                for row in _snippet_rows_for_file(
                    repo, path, commit, lang, content or "", windows, normalize,
                    extractors,
                )
            ]
            yield pd.DataFrame(rows, columns=names)

    return src.mapInPandas(gen, schema=SNIPPET_SCHEMA)
