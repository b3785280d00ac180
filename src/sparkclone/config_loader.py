"""TOML config loading + repotype glob presets (reference parity).

Mirrors the reference's entire config surface
(``core/config_loader.py:19-31,168-299`` and
``cli/commands/scan.py:15-74,188-271``):

  - ``load_settings(root, overrides)`` reads ``pyproject.toml`` at
    ``root``, takes the ``[tool.sparkclone]`` table (falling back to
    ``[tool.clonehunter]`` so a reference user's existing config loads
    unchanged), applies typed coercion with the reference's error paths,
    applies programmatic overrides on top (override-wins), and validates.
  - ``REPO_TYPE_PRESETS`` / ``resolve_repotype_globs`` /
    ``effective_repotypes`` reproduce the repotype glob presets with the
    ``monorepo`` alias = union of every preset (the default when no
    repotype is given).
  - ``merge_globs`` implements the CLI-wins conflict rule: a CLI include
    pattern removes the identical pyproject exclude pattern and vice
    versa (scan.py:188-202).
  - ``resolve_config_root`` / ``find_nearest_pyproject_root`` discover
    the nearest enclosing pyproject.toml (scan.py:240-271).

Coercion semantics match the reference exactly (config_loader.py:219-299):
strings parse into ints/floats/bools ("1"/"true"/"yes"/"on" and the
false twins), bool is NOT an int, integral floats are ints, a scalar
glob becomes a singleton list, and every error names the offending
field (mirrored by tests/test_config_loader.py, modeled on the
reference's own test file).

Engine-mapping notes: the reference's ``embedder``/``index``/``cache``
tables configure components this engine replaced by design (MinHash/
SimHash signatures + LSH + stage checkpoints). Their settings map onto
``[tool.sparkclone.signature]`` / ``[tool.sparkclone.lsh]`` /
``checkpoint_dir``; ``thresholds.lexical_weight`` is accepted and
range-validated for compatibility but has no effect — the engine's score
IS the exact token-set Jaccard (the lexical_weight=1.0 oracle
equivalence, SURVEY.md §7.1).
"""

from __future__ import annotations

import os
import tomllib
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import Any

from sparkclone.config import (
    ClusterConfig,
    ExpansionConfig,
    LshConfig,
    PipelineConfig,
    SignatureConfig,
    Thresholds,
    WindowConfig,
)


class ConfigError(ValueError):
    """Invalid configuration value (reference core/errors.py)."""


def _valid_engines() -> frozenset[str]:
    """Engine names come from the extension registry (model/registry.py
    seam) so a deployment-registered engine passes config validation."""
    from sparkclone import engines  # noqa: F401 — registers built-ins
    from sparkclone import registry

    return frozenset(registry.available("engine"))
_TRUE_TOKENS = frozenset(("1", "true", "yes", "on"))
_FALSE_TOKENS = frozenset(("0", "false", "no", "off"))


@dataclass(frozen=True)
class ScanSettings:
    """Everything a scan run needs: the pipeline config plus the scan-
    scoping knobs that live outside PipelineConfig."""

    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    engine: str = "semantic"
    include_globs: tuple[str, ...] = ()
    exclude_globs: tuple[str, ...] = ()
    cluster_findings: bool = True
    checkpoint_dir: str | None = None


# --------------------------------------------------------------------------
# Typed coercion (reference config_loader.py:219-299)
# --------------------------------------------------------------------------


def _coerce_mapping(name: str, value: Any) -> Mapping[str, Any]:
    if not isinstance(value, Mapping):
        raise ConfigError(f"{name} must be a table/object")
    return value


def _coerce_str(name: str, value: Any) -> str:
    if not isinstance(value, str):
        raise ConfigError(f"{name} must be a string")
    return value


def _coerce_bool(name: str, value: Any) -> bool:
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        token = value.strip().lower()
        if token in _TRUE_TOKENS:
            return True
        if token in _FALSE_TOKENS:
            return False
    raise ConfigError(
        f"{name} must be a boolean or one of: "
        f"{', '.join(sorted(_TRUE_TOKENS | _FALSE_TOKENS))}"
    )


def _coerce_int(name: str, value: Any) -> int:
    if isinstance(value, bool):
        raise ConfigError(f"{name} must be an integer")
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        if value.is_integer():
            return int(value)
        raise ConfigError(f"{name} must be an integer")
    if isinstance(value, str):
        try:
            return int(value.strip())
        except ValueError as exc:
            raise ConfigError(f"{name} must be an integer") from exc
    raise ConfigError(f"{name} must be an integer")


def _coerce_float(name: str, value: Any) -> float:
    if isinstance(value, bool):
        raise ConfigError(f"{name} must be a number")
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str):
        try:
            return float(value.strip())
        except ValueError as exc:
            raise ConfigError(f"{name} must be a number") from exc
    raise ConfigError(f"{name} must be a number")


def _coerce_globs(name: str, value: Any) -> tuple[str, ...]:
    if isinstance(value, str):
        return (value,)
    if isinstance(value, Sequence) and not isinstance(value, (bytes, bytearray)):
        out: list[str] = []
        for i, item in enumerate(value):
            if not isinstance(item, str):
                raise ConfigError(f"{name}[{i}] must be a string")
            out.append(item)
        return tuple(out)
    raise ConfigError(f"{name} must be a string or list of strings")


def _coerce_choice(name: str, value: Any, choices: frozenset[str]) -> str:
    s = _coerce_str(name, value)
    if s not in choices:
        raise ConfigError(
            f"{name} must be one of: {', '.join(sorted(choices))} (got {s!r})"
        )
    return s


# --------------------------------------------------------------------------
# Loading + validation
# --------------------------------------------------------------------------


def load_settings(root: Path | str, overrides: Mapping[str, Any] | None = None) -> ScanSettings:
    """Defaults <- pyproject [tool.sparkclone] (or [tool.clonehunter])
    <- overrides, then validate (reference load_config, :19-31)."""
    root = Path(root)
    settings = ScanSettings()
    pyproject = root / "pyproject.toml"
    if pyproject.exists():
        data = tomllib.loads(pyproject.read_text(encoding="utf-8"))
        tool = data.get("tool", {})
        table = tool.get("sparkclone", tool.get("clonehunter", {}))
        if not isinstance(table, Mapping):
            raise ConfigError("[tool.sparkclone] must be a TOML table")
        settings = _apply(settings, table)
    settings = _apply(settings, overrides or {})
    validate_settings(settings)
    return settings


def _apply(settings: ScanSettings, cfg: Mapping[str, Any]) -> ScanSettings:
    if not cfg:
        return settings
    pipe = settings.pipeline
    if "engine" in cfg:
        settings = replace(
            settings, engine=_coerce_choice("engine", cfg["engine"], _valid_engines())
        )
    if "include_globs" in cfg:
        settings = replace(
            settings, include_globs=_coerce_globs("include_globs", cfg["include_globs"])
        )
    if "exclude_globs" in cfg:
        settings = replace(
            settings, exclude_globs=_coerce_globs("exclude_globs", cfg["exclude_globs"])
        )
    if "cluster_findings" in cfg:
        settings = replace(
            settings,
            cluster_findings=_coerce_bool("cluster_findings", cfg["cluster_findings"]),
        )
    if "checkpoint_dir" in cfg:
        settings = replace(
            settings, checkpoint_dir=_coerce_str("checkpoint_dir", cfg["checkpoint_dir"])
        )
    if "cluster_min_size" in cfg:
        pipe = replace(
            pipe,
            cluster=replace(
                pipe.cluster,
                min_size=_coerce_int("cluster_min_size", cfg["cluster_min_size"]),
            ),
        )
    if "windows" in cfg:
        w = _coerce_mapping("windows", cfg["windows"])
        cur = pipe.windows
        pipe = replace(
            pipe,
            windows=WindowConfig(
                window_lines=_coerce_int(
                    "windows.window_lines", w.get("window_lines", cur.window_lines)
                ),
                stride_lines=_coerce_int(
                    "windows.stride_lines", w.get("stride_lines", cur.stride_lines)
                ),
                min_nonempty=_coerce_int(
                    "windows.min_nonempty", w.get("min_nonempty", cur.min_nonempty)
                ),
            ),
        )
    if "thresholds" in cfg:
        t = _coerce_mapping("thresholds", cfg["thresholds"])
        cur_t = pipe.thresholds
        # lexical_weight: validated for reference-TOML compatibility,
        # discarded (module docstring).
        if "lexical_weight" in t:
            lw = _coerce_float("thresholds.lexical_weight", t["lexical_weight"])
            if not 0.0 <= lw <= 1.0:
                raise ConfigError("thresholds.lexical_weight must be between 0 and 1")
        pipe = replace(
            pipe,
            thresholds=Thresholds(
                func=_coerce_float("thresholds.func", t.get("func", cur_t.func)),
                win=_coerce_float("thresholds.win", t.get("win", cur_t.win)),
                exp=_coerce_float("thresholds.exp", t.get("exp", cur_t.exp)),
                min_window_hits=_coerce_int(
                    "thresholds.min_window_hits",
                    t.get("min_window_hits", cur_t.min_window_hits),
                ),
                lexical_min_ratio=_coerce_float(
                    "thresholds.lexical_min_ratio",
                    t.get("lexical_min_ratio", cur_t.lexical_min_ratio),
                ),
            ),
        )
    if "expansion" in cfg:
        e = _coerce_mapping("expansion", cfg["expansion"])
        cur_e = pipe.expansion
        pipe = replace(
            pipe,
            expansion=ExpansionConfig(
                enabled=_coerce_bool("expansion.enabled", e.get("enabled", cur_e.enabled)),
                depth=_coerce_int("expansion.depth", e.get("depth", cur_e.depth)),
                max_chars=_coerce_int(
                    "expansion.max_chars", e.get("max_chars", cur_e.max_chars)
                ),
            ),
        )
    if "signature" in cfg:
        s = _coerce_mapping("signature", cfg["signature"])
        cur_s = pipe.signature
        try:
            sig = SignatureConfig(
                num_perms=_coerce_int("signature.num_perms", s.get("num_perms", cur_s.num_perms)),
                bands=_coerce_int("signature.bands", s.get("bands", cur_s.bands)),
                rows_per_band=_coerce_int(
                    "signature.rows_per_band", s.get("rows_per_band", cur_s.rows_per_band)
                ),
                seed=_coerce_int("signature.seed", s.get("seed", cur_s.seed)),
                simhash_near_radius=_coerce_int(
                    "signature.simhash_near_radius",
                    s.get("simhash_near_radius", cur_s.simhash_near_radius),
                ),
            )
        except ValueError as exc:  # bands*rows != perms from __post_init__
            raise ConfigError(str(exc)) from exc
        pipe = replace(pipe, signature=sig)
    if "lsh" in cfg:
        l = _coerce_mapping("lsh", cfg["lsh"])
        cur_l = pipe.lsh
        pipe = replace(
            pipe,
            lsh=LshConfig(
                max_bucket_size=_coerce_int(
                    "lsh.max_bucket_size", l.get("max_bucket_size", cur_l.max_bucket_size)
                ),
                max_text_chars=_coerce_int(
                    "lsh.max_text_chars", l.get("max_text_chars", cur_l.max_text_chars)
                ),
            ),
        )
    return replace(settings, pipeline=pipe)


def validate_settings(settings: ScanSettings) -> None:
    """Reference validate_config (:168-213) adapted to our knob set —
    every check that survives the embedder/index replacement, plus the
    signature/LSH equivalents."""
    p = settings.pipeline
    if settings.engine not in _valid_engines():
        raise ConfigError(
            f"engine must be one of: {', '.join(sorted(_valid_engines()))} "
            f"(got {settings.engine!r})"
        )
    if p.windows.window_lines <= 0:
        raise ConfigError("windows.window_lines must be > 0")
    if p.windows.stride_lines <= 0:
        raise ConfigError("windows.stride_lines must be > 0")
    if p.windows.min_nonempty < 0:
        raise ConfigError("windows.min_nonempty must be >= 0")
    for name, value in (
        ("thresholds.func", p.thresholds.func),
        ("thresholds.win", p.thresholds.win),
        ("thresholds.exp", p.thresholds.exp),
        ("thresholds.lexical_min_ratio", p.thresholds.lexical_min_ratio),
    ):
        if not 0.0 <= value <= 1.0:
            raise ConfigError(f"{name} must be between 0 and 1")
    if p.thresholds.min_window_hits < 1:
        raise ConfigError("thresholds.min_window_hits must be >= 1")
    if p.cluster.min_size < 1:
        raise ConfigError("cluster_min_size must be >= 1")
    if p.expansion.depth < 0:
        raise ConfigError("expansion.depth must be >= 0")
    if p.expansion.max_chars <= 0:
        raise ConfigError("expansion.max_chars must be > 0")
    if p.signature.num_perms <= 0:
        raise ConfigError("signature.num_perms must be > 0")
    if p.lsh.max_bucket_size < 0:
        raise ConfigError("lsh.max_bucket_size must be >= 0")
    if p.lsh.max_text_chars <= 0:
        raise ConfigError("lsh.max_text_chars must be > 0")


# --------------------------------------------------------------------------
# Repotype presets + glob merging (reference scan.py:15-74, 188-226)
# --------------------------------------------------------------------------

REPO_TYPE_PRESETS: dict[str, tuple[list[str], list[str]]] = {
    "dotnet": (
        ["**/*.cs", "**/*.vb", "**/*.fs"],
        ["**/bin/**", "**/obj/**", "**/packages/**", "**/.vs/**"],
    ),
    "go": (
        ["**/*.go"],
        ["**/vendor/**", "**/bin/**", "**/dist/**", "**/.git/**"],
    ),
    "java": (
        ["**/*.java"],
        ["**/target/**", "**/build/**", "**/.gradle/**", "**/out/**"],
    ),
    "kotlin": (
        ["**/*.kt", "**/*.kts"],
        ["**/build/**", "**/.gradle/**", "**/out/**"],
    ),
    # Aliases resolved in resolve_repotype_globs: monorepo = union of all.
    "monorepo": ([], []),
    "none": ([], []),
    "node": (
        ["**/*.js", "**/*.mjs", "**/*.cjs", "**/*.ts"],
        [
            "**/node_modules/**",
            "**/dist/**",
            "**/build/**",
            "**/.next/**",
            "**/.turbo/**",
            "**/coverage/**",
        ],
    ),
    "php": (
        ["**/*.php"],
        ["**/vendor/**", "**/node_modules/**", "**/storage/**", "**/bootstrap/cache/**"],
    ),
    "python": (
        ["**/*.py"],
        ["**/.venv/**", "**/venv/**", "**/__pycache__/**", "**/site-packages/**"],
    ),
    "react": (
        ["**/*.js", "**/*.jsx", "**/*.ts", "**/*.tsx"],
        ["**/node_modules/**", "**/.next/**", "**/dist/**", "**/build/**", "**/coverage/**"],
    ),
    "ruby": (
        ["**/*.rb", "**/*.rake"],
        ["**/vendor/**", "**/tmp/**", "**/log/**", "**/coverage/**"],
    ),
    "rust": (
        ["**/*.rs"],
        ["**/target/**"],
    ),
    "swift": (
        ["**/*.swift"],
        ["**/.build/**", "**/DerivedData/**", "**/build/**"],
    ),
    "cpp": (
        ["**/*.c", "**/*.cc", "**/*.cpp", "**/*.cxx", "**/*.h", "**/*.hh", "**/*.hpp", "**/*.hxx"],
        ["**/build/**", "**/out/**", "**/bin/**", "**/obj/**", "**/cmake-build-*/**"],
    ),
}


def _dedupe(values: list[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def effective_repotypes(repotypes: list[str] | None) -> list[str]:
    """No repotypes -> the monorepo alias; 'none' entries are dropped
    (scan.py:222-226)."""
    if repotypes:
        return [r for r in repotypes if r != "none"]
    return ["monorepo"]


def resolve_repotype_globs(repotypes: list[str]) -> tuple[list[str], list[str]]:
    include: list[str] = []
    exclude: list[str] = []
    for rt in repotypes:
        if rt == "monorepo":
            for key, (inc, exc) in REPO_TYPE_PRESETS.items():
                if key == "monorepo":
                    continue
                include.extend(inc)
                exclude.extend(exc)
            continue
        if rt not in REPO_TYPE_PRESETS:
            raise ConfigError(
                f"repotype must be one of: {', '.join(sorted(REPO_TYPE_PRESETS))} "
                f"(got {rt!r})"
            )
        inc, exc = REPO_TYPE_PRESETS[rt]
        include.extend(inc)
        exclude.extend(exc)
    return _dedupe(include), _dedupe(exclude)


def merge_globs(
    base_include: Sequence[str],
    base_exclude: Sequence[str],
    cli_include: Sequence[str],
    cli_exclude: Sequence[str],
) -> tuple[list[str], list[str]]:
    """Union with CLI-wins conflict resolution: a CLI include deletes the
    identical base exclude pattern, and vice versa (scan.py:188-202)."""
    include = _dedupe(list(base_include) + list(cli_include))
    exclude = _dedupe(list(base_exclude) + list(cli_exclude))
    for pattern in cli_include:
        exclude = [v for v in exclude if v != pattern]
    for pattern in cli_exclude:
        include = [v for v in include if v != pattern]
    return include, exclude


# --------------------------------------------------------------------------
# Config-root discovery (reference scan.py:240-271)
# --------------------------------------------------------------------------


def find_nearest_pyproject_root(start: Path) -> Path | None:
    cur = start
    while True:
        if (cur / "pyproject.toml").is_file():
            return cur
        if cur.parent == cur:
            return None
        cur = cur.parent


def resolve_config_root(paths: Sequence[str]) -> Path:
    """Nearest pyproject.toml enclosing the scanned paths: unique nearest
    root wins; otherwise the nearest root above the common ancestor;
    otherwise the common ancestor itself."""
    if not paths:
        cwd = Path.cwd()
        return find_nearest_pyproject_root(cwd) or cwd
    roots: list[Path] = []
    for raw in paths:
        cand = Path(raw)
        if not cand.is_absolute():
            cand = Path.cwd() / cand
        resolved = cand.resolve(strict=False)
        roots.append(resolved.parent if resolved.is_file() else resolved)
    common = Path(os.path.commonpath([str(p) for p in roots]))
    found = {r for p in roots if (r := find_nearest_pyproject_root(p)) is not None}
    if len(found) == 1:
        return next(iter(found))
    return find_nearest_pyproject_root(common) or common
