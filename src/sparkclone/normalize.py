"""Language-aware normalization + tokenization.

Pure-Python kernels used inside batched pandas/Arrow UDFs, plus the
JVM-side column expression for tokenization so exact-Jaccard verification
stays inside whole-stage codegen.

Behavioral parity targets in the reference:
  - tokenizer: ``similarity/lexical.py:18-19`` — ``[A-Za-z0-9_]+`` over
    lowercased text, treated as a *set*.
  - python normalization: ``snippets/normalization.py:6-37`` — parse,
    replace a leading string-constant statement of Module/FunctionDef/
    AsyncFunctionDef bodies with ``pass``, unparse (canonical whitespace);
    unparsable source is returned unchanged.
  - non-Python files are used verbatim (reference ``parsing/text_units.py``
    takes raw file text; no normalization pass exists for text).
"""

from __future__ import annotations

import ast
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9_]+"
_TOKEN_RE = re.compile("[A-Za-z0-9_]+")


def tokenize(text: str) -> set[str]:
    """Token *set* of lowercased alnum/underscore runs — identical to the
    reference's ``_tokenize`` (similarity/lexical.py:18-19)."""
    return set(_TOKEN_RE.findall(text.lower()))


def jaccard(text_a: str, text_b: str) -> float:
    """Exact token-set Jaccard (similarity/lexical.py:6-16 semantics)."""
    a, b = tokenize(text_a), tokenize(text_b)
    if not a or not b:
        return 0.0
    union = len(a | b)
    return len(a & b) / union if union else 0.0


def tokens_col(text: Column) -> Column:
    """JVM-side token-set column: sorted distinct tokens of the lowercased
    text. ``lower()`` then ``[a-z0-9_]+`` is equivalent to the reference's
    ``[A-Za-z0-9_]+`` over lowered text. Sorted so the array is a canonical
    set representation (array_intersect/array_union don't need order, but
    deterministic output does)."""
    return F.array_sort(
        F.array_distinct(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0))
    )


def jaccard_col(tokens_a: Column, tokens_b: Column) -> Column:
    """Exact Jaccard over two token-set columns, fully JVM-side.
    Empty-side pairs score 0.0 like the reference (lexical.py:9-10)."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b))
    union = F.size(F.array_union(tokens_a, tokens_b))
    return F.when(
        (F.size(tokens_a) == 0) | (F.size(tokens_b) == 0) | (union == 0), F.lit(0.0)
    ).otherwise(inter.cast("double") / union.cast("double"))


class _LeadingDocstringStripper(ast.NodeTransformer):
    """Replace a leading string-constant expression statement in
    Module / FunctionDef / AsyncFunctionDef bodies with ``pass``.

    Note the reference intentionally does NOT strip ClassDef docstrings
    (normalization.py:28-30 registers only FunctionDef/AsyncFunctionDef/
    Module visitors) — we preserve that quirk for parity.
    """

    def _strip_leading(self, node: ast.AST) -> ast.AST:
        self.generic_visit(node)
        body = getattr(node, "body", None)
        if body:
            first = body[0]
            if (
                isinstance(first, ast.Expr)
                and isinstance(first.value, ast.Constant)
                and isinstance(first.value.value, str)
            ):
                body[0] = ast.Pass()
        return node

    visit_FunctionDef = _strip_leading
    visit_AsyncFunctionDef = _strip_leading
    visit_Module = _strip_leading


def normalize_python(source: str) -> str:
    """Docstring-strip + canonical unparse; broken source passes through
    unchanged (normalization.py:8-10)."""
    try:
        tree = ast.parse(source)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return source
    stripped = _LeadingDocstringStripper().visit(tree)
    ast.fix_missing_locations(stripped)
    return ast.unparse(stripped)


def normalize_source(source: str, lang: str | None = None) -> str:
    """Snippet-text normalization entry point.

    The reference applies ``strip_docstrings`` to EVERY snippet text
    regardless of language (``snippets/generators.py:20,46`` call
    ``normalize_source`` unconditionally; non-parsing text passes through
    via the SyntaxError branch, ``normalization.py:8-10``). The observable
    consequences we must preserve for oracle parity:

      * mid-function / indented window fragments fail ``ast.parse`` and
        stay verbatim;
      * windows starting at a top-level ``def`` line DO parse and come
        back docstring-stripped + canonically unparsed;
      * non-Python content that happens to parse as Python is also
        canonicalized.

    So parity demands attempt-parse-on-everything, which is what we do.
    ``lang`` is accepted for future fast-path gating but intentionally
    unused: an ``ast.parse`` attempt on non-Python text fails on the first
    few tokens and costs little even at scale.
    """
    return normalize_python(source)
