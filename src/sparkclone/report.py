"""Report sinks: JSON / HTML / SARIF (reference S5-S7).

Reports are driver-side renderings of the (small) top-N findings — the
distributed outputs are the findings/clusters tables themselves; these
sinks exist for CLI/parity completeness:
  - JSON: findings + stats + config snapshot + timing with per-finding
    unified diff truncated at 80 lines / 4000 chars
    (reporting/json_reporter.py:12-22, diff :72-88)
  - HTML: static page with a sortable findings table
    (reporting/html_reporter.py:12-360 — ours is intentionally minimal)
  - SARIF 2.1.0: one result per finding with two locations
    (reporting/sarif_reporter.py:9-59)
"""

from __future__ import annotations

import difflib
import html as html_mod
import json
from typing import Any

from pyspark.sql import DataFrame

MAX_DIFF_LINES = 80
MAX_DIFF_CHARS = 4000


def _truncate_diff(diff_lines: list[str]) -> str:
    lines = diff_lines[:MAX_DIFF_LINES]
    text = "\n".join(lines)
    if len(text) > MAX_DIFF_CHARS:
        text = text[:MAX_DIFF_CHARS] + "\n…truncated…"
    elif len(diff_lines) > MAX_DIFF_LINES:
        text += "\n…truncated…"
    return text


def unified_diff(text_a: str, text_b: str, label_a: str, label_b: str) -> str:
    """difflib.unified_diff with the reference's truncation limits
    (json_reporter.py:72-88)."""
    raw = list(
        difflib.unified_diff(
            text_a.splitlines(), text_b.splitlines(), fromfile=label_a, tofile=label_b, lineterm=""
        )
    )
    return _truncate_diff(raw)


def collect_findings(findings: DataFrame, top_n: int = 1000) -> list[dict[str, Any]]:
    """Deterministic driver-side extraction: top-N by (score desc,
    unit_a, unit_b)."""
    from pyspark.sql import functions as F

    rows = (
        findings.orderBy(F.col("score").desc(), "unit_a", "unit_b")
        .limit(top_n)
        .collect()
    )
    return [r.asDict(recursive=True) for r in rows]


def write_json_report(
    findings: DataFrame,
    stats: dict[str, Any],
    config_snapshot: dict[str, Any],
    timing: dict[str, float],
    out_path: str,
    top_n: int = 1000,
) -> None:
    payload = {
        "findings": collect_findings(findings, top_n),
        "stats": stats,
        "config": config_snapshot,
        "timing": timing,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2, default=str)


def write_html_report(findings: DataFrame, out_path: str, top_n: int = 1000) -> None:
    rows = collect_findings(findings, top_n)
    cells = "".join(
        "<tr><td>{a}</td><td>{b}</td><td>{s:.4f}</td><td>{d}</td><td>{r}</td></tr>".format(
            a=html_mod.escape(str(r["unit_a"])),
            b=html_mod.escape(str(r["unit_b"])),
            s=r["score"],
            d=r["duplicated_lines"],
            r=html_mod.escape(",".join(r["reasons"])),
        )
        for r in rows
    )
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>sparkclone findings</title>"
        "<style>table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:4px 8px;font:13px monospace}</style></head><body>"
        f"<h1>sparkclone findings ({len(rows)})</h1>"
        "<table><tr><th>unit_a</th><th>unit_b</th><th>score</th>"
        "<th>dup_lines</th><th>reasons</th></tr>"
        f"{cells}</table></body></html>"
    )
    with open(out_path, "w") as f:
        f.write(doc)


def _unit_location(unit_id: str) -> dict[str, Any]:
    # unit_id = path:qualname:start:end
    path, _qual, start, end = unit_id.rsplit(":", 3)
    return {
        "physicalLocation": {
            "artifactLocation": {"uri": path},
            "region": {"startLine": int(start), "endLine": int(end)},
        }
    }


def write_sarif_report(findings: DataFrame, out_path: str, top_n: int = 1000) -> None:
    """SARIF 2.1.0 with two locations per result (sarif_reporter.py:9-59)."""
    rows = collect_findings(findings, top_n)
    results = [
        {
            "ruleId": "duplicate-code",
            "level": "note",
            "message": {
                "text": (
                    f"Duplicate code (score {r['score']:.4f}, "
                    f"{r['duplicated_lines']} lines): {r['unit_a']} ~ {r['unit_b']}"
                )
            },
            "locations": [
                _unit_location(r["unit_a"]),
                _unit_location(r["unit_b"]),
            ],
        }
        for r in rows
    ]
    sarif = {
        "$schema": "https://raw.githubusercontent.com/oasis-tcs/sarif-spec/master/Schemata/sarif-schema-2.1.0.json",
        "version": "2.1.0",
        "runs": [
            {
                "tool": {
                    "driver": {
                        "name": "sparkclone",
                        "informationUri": "https://example.invalid/sparkclone",
                        "rules": [{"id": "duplicate-code"}],
                    }
                },
                "results": results,
            }
        ],
    }
    with open(out_path, "w") as f:
        json.dump(sarif, f, indent=2)
