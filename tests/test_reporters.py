"""Golden-structure checks for the HTML and SARIF reporters (modeled on
the reference's tests/test_reporters_html_sarif.py)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def tiny_findings(spark):
    rows = [
        ("r/a.py:fa:1:2", "r/b.py:fb:1:2", "r/a.py", "r/b.py", 0.97, 2, ["func_threshold"]),
        ("r/c.py:fc:1:50", "r/d.py:fd:1:50", "r/c.py", "r/d.py", 0.95, 50, ["min_window_hits"]),
    ]
    return spark.createDataFrame(
        rows,
        "unit_a string, unit_b string, path_a string, path_b string, "
        "score double, duplicated_lines int, reasons array<string>",
    )


@pytest.fixture()
def tiny_snippets(spark):
    common = "\n".join(f"shared_line_{i} = {i}" for i in range(30))
    text_a = f"def fa():\n{common}\nreturn 1"
    text_b = f"def fb():\n{common}\nreturn 2"
    rows = [
        ("r/a.py:fa:1:2", "FUNC", 1, "s1", text_a),
        ("r/b.py:fb:1:2", "FUNC", 1, "s2", text_b),
        # unit with both WIN and FUNC: FUNC must win the display rank
        ("r/c.py:fc:1:50", "WIN", 1, "s3", "win text"),
        ("r/c.py:fc:1:50", "FUNC", 1, "s4", "func text"),
        ("r/d.py:fd:1:50", "WIN", 1, "s5", "win text d"),
    ]
    return spark.createDataFrame(
        rows, "unit_id string, kind string, start_line int, snippet_id string, norm_text string"
    )


def test_html_report_structure(spark, tmp_path, tiny_findings, tiny_snippets):
    from sparkclone.report import write_html_report

    out = tmp_path / "report.html"
    write_html_report(tiny_findings, str(out), snippets=tiny_snippets)
    text = out.read_text()
    assert "sparkclone Report" in text
    assert "Schema:" in text
    assert "2 duplicated lines" in text
    assert "r/a.py:1-2" in text and "r/b.py:1-2" in text
    assert "sort-findings" in text  # sortable control
    assert 'class="diff_chg"' in text  # changed lines highlighted
    # 30 equal lines with context 3 -> 24 hidden, marker in both columns
    assert text.count("&lt;24 lines not shown&gt;") == 2


def test_html_best_display_text_prefers_func(spark, tiny_findings, tiny_snippets):
    from sparkclone.report import best_display_texts, collect_findings

    rows = collect_findings(tiny_findings)
    texts = best_display_texts(rows, tiny_snippets)
    assert texts["r/c.py:fc:1:50"] == "func text"
    assert texts["r/d.py:fd:1:50"] == "win text d"


def test_html_report_without_snippets(spark, tmp_path, tiny_findings):
    from sparkclone.report import write_html_report

    out = tmp_path / "plain.html"
    write_html_report(tiny_findings, str(out))
    assert "No diff available." in out.read_text()


def test_sarif_report_properties(spark, tmp_path, tiny_findings):
    from sparkclone.report import write_sarif_report

    out = tmp_path / "report.sarif"
    write_sarif_report(tiny_findings, str(out))
    payload = json.loads(out.read_text())
    assert payload["version"] == "2.1.0"
    result = payload["runs"][0]["results"][0]
    assert result["properties"]["duplicated_lines"] == 2
    assert result["locations"][0]["physicalLocation"]["region"]["startLine"] == 1
