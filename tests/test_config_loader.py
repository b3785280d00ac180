"""TOML config loading, coercion error paths, repotype presets, and the
CLI-wins glob merge — modeled on the reference's own test coverage
(tests/test_config_loader.py, scan.py preset/merge semantics)."""

from __future__ import annotations

from pathlib import Path

import pytest

from sparkclone.config_loader import (
    REPO_TYPE_PRESETS,
    ConfigError,
    effective_repotypes,
    find_nearest_pyproject_root,
    load_settings,
    merge_globs,
    resolve_config_root,
    resolve_repotype_globs,
)


def _err(tmp_path: Path, overrides: dict, expected: str) -> None:
    with pytest.raises(ConfigError) as ei:
        load_settings(tmp_path, overrides)
    assert expected in str(ei.value)


def test_load_from_pyproject(tmp_path: Path):
    (tmp_path / "pyproject.toml").write_text(
        """
[tool.sparkclone]
include_globs = ["src/**/*.py"]
cluster_min_size = 3

[tool.sparkclone.thresholds]
func = 0.8
min_window_hits = 3

[tool.sparkclone.windows]
window_lines = 12
""",
        encoding="utf-8",
    )
    s = load_settings(tmp_path)
    assert s.include_globs == ("src/**/*.py",)
    assert s.pipeline.thresholds.func == 0.8
    assert s.pipeline.thresholds.min_window_hits == 3
    assert s.pipeline.windows.window_lines == 12
    assert s.pipeline.cluster.min_size == 3


def test_reference_table_name_still_loads(tmp_path: Path):
    """[tool.clonehunter] keeps working so a reference user's pyproject
    configures this engine unchanged."""
    (tmp_path / "pyproject.toml").write_text(
        "[tool.clonehunter.thresholds]\nwin = 0.85\n", encoding="utf-8"
    )
    s = load_settings(tmp_path)
    assert s.pipeline.thresholds.win == 0.85


def test_overrides_win_over_pyproject(tmp_path: Path):
    (tmp_path / "pyproject.toml").write_text(
        "[tool.sparkclone.thresholds]\nfunc = 0.8\n", encoding="utf-8"
    )
    s = load_settings(tmp_path, {"thresholds": {"func": 0.95}})
    assert s.pipeline.thresholds.func == 0.95


def test_scalar_glob_coerced_to_singleton(tmp_path: Path):
    s = load_settings(tmp_path, {"include_globs": "**/*.py", "exclude_globs": "**/dist/**"})
    assert s.include_globs == ("**/*.py",)
    assert s.exclude_globs == ("**/dist/**",)


def test_glob_lists_reject_non_strings(tmp_path: Path):
    for field in ("include_globs", "exclude_globs"):
        _err(tmp_path, {field: ["**/*.py", 7]}, field)


def test_bool_tokens_parse_strictly(tmp_path: Path):
    assert load_settings(tmp_path, {"cluster_findings": "false"}).cluster_findings is False
    assert load_settings(tmp_path, {"cluster_findings": "on"}).cluster_findings is True
    _err(tmp_path, {"cluster_findings": "maybe"}, "cluster_findings")


def test_int_coercion_rules(tmp_path: Path):
    # string and integral float parse; bool and fractional float reject
    assert load_settings(tmp_path, {"cluster_min_size": "4"}).pipeline.cluster.min_size == 4
    assert load_settings(tmp_path, {"cluster_min_size": 4.0}).pipeline.cluster.min_size == 4
    _err(tmp_path, {"cluster_min_size": 4.5}, "cluster_min_size")
    _err(tmp_path, {"cluster_min_size": True}, "cluster_min_size")


def test_invalid_engine_choice(tmp_path: Path):
    _err(tmp_path, {"engine": "unknown"}, "engine")


def test_numeric_validation_runs_at_load(tmp_path: Path):
    cases = [
        ({"thresholds": {"func": 1.1}}, "thresholds.func"),
        ({"thresholds": {"win": -0.1}}, "thresholds.win"),
        ({"thresholds": {"exp": 1.1}}, "thresholds.exp"),
        ({"thresholds": {"min_window_hits": 0}}, "thresholds.min_window_hits"),
        ({"thresholds": {"lexical_min_ratio": 2.0}}, "thresholds.lexical_min_ratio"),
        ({"thresholds": {"lexical_weight": 1.5}}, "thresholds.lexical_weight"),
        ({"windows": {"window_lines": 0}}, "windows.window_lines"),
        ({"windows": {"stride_lines": 0}}, "windows.stride_lines"),
        ({"cluster_min_size": 0}, "cluster_min_size"),
        ({"expansion": {"depth": -1}}, "expansion.depth"),
        ({"expansion": {"max_chars": 0}}, "expansion.max_chars"),
    ]
    for overrides, field in cases:
        _err(tmp_path, overrides, field)


def test_signature_band_geometry_checked(tmp_path: Path):
    _err(tmp_path, {"signature": {"bands": 7}}, "bands")
    s = load_settings(tmp_path, {"signature": {"bands": 32, "rows_per_band": 4}})
    assert s.pipeline.signature.bands == 32


def test_tables_must_be_mappings(tmp_path: Path):
    _err(tmp_path, {"windows": 12}, "windows")
    _err(tmp_path, {"thresholds": [1, 2]}, "thresholds")


# ---- repotype presets + merge (scan.py:188-226 semantics) ----------------


def test_monorepo_is_union_of_all_presets():
    inc, exc = resolve_repotype_globs(["monorepo"])
    for key, (pinc, pexc) in REPO_TYPE_PRESETS.items():
        for g in pinc:
            assert g in inc
        for g in pexc:
            assert g in exc


def test_effective_repotypes_defaults_and_none():
    assert effective_repotypes(None) == ["monorepo"]
    assert effective_repotypes([]) == ["monorepo"]
    assert effective_repotypes(["python", "none"]) == ["python"]


def test_unknown_repotype_raises():
    with pytest.raises(ConfigError):
        resolve_repotype_globs(["fortran"])


def test_merge_globs_cli_wins_conflicts():
    # a CLI include removes the same pattern from base excludes, and
    # vice versa; order-preserving dedupe otherwise
    inc, exc = merge_globs(
        ["**/*.py"], ["**/vendor/**", "**/gen/**"],
        ["**/gen/**"], ["**/*.py"],
    )
    assert "**/gen/**" in inc and "**/gen/**" not in exc
    assert "**/*.py" in exc and "**/*.py" not in inc


def test_merge_globs_dedupes_preserving_order():
    inc, exc = merge_globs(["a", "b"], [], ["b", "c"], [])
    assert inc == ["a", "b", "c"]


# ---- config root discovery (scan.py:240-271) ------------------------------


def test_nearest_pyproject_discovery(tmp_path: Path):
    (tmp_path / "pyproject.toml").write_text("", encoding="utf-8")
    nested = tmp_path / "a" / "b"
    nested.mkdir(parents=True)
    assert find_nearest_pyproject_root(nested) == tmp_path
    assert resolve_config_root([str(nested)]) == tmp_path


def test_resolve_config_root_common_ancestor(tmp_path: Path):
    (tmp_path / "pyproject.toml").write_text("", encoding="utf-8")
    d1 = tmp_path / "x" / "p1"
    d2 = tmp_path / "y" / "p2"
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)
    assert resolve_config_root([str(d1), str(d2)]) == tmp_path
