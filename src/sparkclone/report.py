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


# --------------------------------------------------------------------------
# HTML report (reference reporting/html_reporter.py:12-360 feature parity:
# sortable findings list, per-finding summary grid, side-by-side diff with
# add/chg/sub highlighting and long-equal-run hiding, best-match compare
# view from reporting/compare.py:20-32 — here the compared texts are the
# units' best display snippets joined back for just the top-N findings).
# --------------------------------------------------------------------------

_HTML_STYLE = """
  body { font: 14px/1.4 -apple-system, sans-serif; margin: 24px; }
  .finding { border: 1px solid #ccc; border-radius: 6px; margin: 14px 0;
             padding: 10px 14px; }
  .summary-grid { display: grid; grid-template-columns: 1fr 1fr; gap: 8px; }
  .path { font-family: monospace; font-size: 13px; }
  .meta { color: #555; font-size: 13px; }
  .diff-wrap { overflow-x: auto; max-width: 100%; }
  table.diff { width: 100%; border-collapse: collapse; font-family: monospace;
               font-size: 12px; }
  table.diff th, table.diff td { padding: 3px 6px; vertical-align: top;
                                 border-bottom: 1px solid #eee;
                                 white-space: pre; }
  table.diff th { background: #f3f3f3; text-align: left; }
  .line-no { color: #999; text-align: right; }
  .diff_add { background: #e6ffed; }
  .diff_chg { background: #fff5b1; }
  .diff_sub { background: #ffeef0; }
  .hidden-note { color: #888; font-style: italic; text-align: center; }
"""

_HTML_SORT_JS = """
  document.addEventListener("DOMContentLoaded", () => {
    const list = document.getElementById("findings");
    const sel = document.getElementById("sort-findings");
    if (!list || !sel) return;
    const sortFindings = () => {
      const items = Array.from(list.children);
      items.sort((a, b) => {
        const mode = sel.value;
        if (mode === "lines")
          return (+b.dataset.lines) - (+a.dataset.lines);
        if (mode === "path")
          return a.dataset.path.localeCompare(b.dataset.path);
        return (+b.dataset.score) - (+a.dataset.score);
      });
      items.forEach(i => list.appendChild(i));
    };
    sel.addEventListener("change", sortFindings);
    sortFindings();
  });
"""

_DIFF_CONTEXT = 3


def _diff_row(no_a, line_a, no_b, line_b, css: str) -> str:
    esc = html_mod.escape
    return (
        f'<tr class="{css}"><td class="line-no">{no_a}</td><td>{esc(str(line_a))}</td>'
        f'<td class="line-no">{no_b}</td><td>{esc(str(line_b))}</td></tr>'
    )


def render_side_by_side(text_a: str, text_b: str) -> str:
    """difflib.SequenceMatcher side-by-side table with the reference's
    long-equal-run hiding (html_reporter.py:195-235): equal blocks show
    up to _DIFF_CONTEXT lines at each edge with a '<N lines not shown>'
    marker in between."""
    lines_a = text_a.splitlines()
    lines_b = text_b.splitlines()
    rows: list[str] = []
    matcher = difflib.SequenceMatcher(a=lines_a, b=lines_b, autojunk=False)
    for tag, a0, a1, b0, b1 in matcher.get_opcodes():
        if tag == "equal":
            n = a1 - a0
            if n > 2 * _DIFF_CONTEXT + 1:
                for k in range(_DIFF_CONTEXT):
                    rows.append(_diff_row(a0 + k + 1, lines_a[a0 + k], b0 + k + 1, lines_b[b0 + k], ""))
                hidden = n - 2 * _DIFF_CONTEXT
                note = html_mod.escape(f"<{hidden} lines not shown>")
                rows.append(f'<tr><td class="line-no"></td><td class="hidden-note">{note}</td>'
                            f'<td class="line-no"></td><td class="hidden-note">{note}</td></tr>')
                for k in range(n - _DIFF_CONTEXT, n):
                    rows.append(_diff_row(a0 + k + 1, lines_a[a0 + k], b0 + k + 1, lines_b[b0 + k], ""))
            else:
                for k in range(n):
                    rows.append(_diff_row(a0 + k + 1, lines_a[a0 + k], b0 + k + 1, lines_b[b0 + k], ""))
        elif tag == "replace":
            for k in range(max(a1 - a0, b1 - b0)):
                la = lines_a[a0 + k] if a0 + k < a1 else ""
                lb = lines_b[b0 + k] if b0 + k < b1 else ""
                na = a0 + k + 1 if a0 + k < a1 else ""
                nb = b0 + k + 1 if b0 + k < b1 else ""
                rows.append(_diff_row(na, la, nb, lb, "diff_chg"))
        elif tag == "delete":
            for k in range(a1 - a0):
                rows.append(_diff_row(a0 + k + 1, lines_a[a0 + k], "", "", "diff_sub"))
        elif tag == "insert":
            for k in range(b1 - b0):
                rows.append(_diff_row("", "", b0 + k + 1, lines_b[b0 + k], "diff_add"))
    return (
        '<div class="diff-wrap"><table class="diff">'
        '<thead><tr><th class="line-no"></th><th>Unit A</th>'
        '<th class="line-no"></th><th>Unit B</th></tr></thead>'
        f"<tbody>{''.join(rows)}</tbody></table></div>"
    )


def best_display_texts(findings_rows: list[dict], snippets: DataFrame | None):
    """unit_id -> display text for every unit in the top-N findings: the
    unit's best snippet by kind rank FUNC > EXP > WIN (the reference's
    best-match kind ranking, similarity/ranking.py:10-19), earliest span
    first. One bounded join — texts are fetched for the report's N pairs
    only, never for the full findings table."""
    if snippets is None:
        return {}
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    unit_ids = sorted({r["unit_a"] for r in findings_rows} | {r["unit_b"] for r in findings_rows})
    if not unit_ids:
        return {}
    spark = snippets.sparkSession
    wanted = spark.createDataFrame([(u,) for u in unit_ids], "unit_id string")
    rank = (
        F.when(F.col("kind") == "FUNC", 3)
        .when(F.col("kind") == "EXP", 2)
        .otherwise(1)
    )
    w = Window.partitionBy("unit_id").orderBy(
        rank.desc(), F.col("start_line").asc(), F.col("snippet_id")
    )
    best = (
        snippets.join(F.broadcast(wanted), "unit_id", "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("unit_id", "norm_text")
    )
    return {r["unit_id"]: r["norm_text"] for r in best.collect()}


def _render_finding(r: dict, texts: dict) -> str:
    esc = html_mod.escape

    def span(unit_id: str) -> str:
        parts = str(unit_id).rsplit(":", 3)
        if len(parts) == 4:
            path, _q, s, e = parts
            return f"{path}:{s}-{e}"
        return str(unit_id)  # foreign id shape (e.g. imported findings)

    ta, tb = texts.get(r["unit_a"]), texts.get(r["unit_b"])
    if ta is not None and tb is not None:
        diff_html = render_side_by_side(ta, tb)
    else:
        diff_html = '<div class="code-box">No diff available.</div>'
    cluster = r.get("cluster_id")
    return (
        f'<div class="finding" data-score="{r["score"]}" '
        f'data-lines="{r["duplicated_lines"]}" data-path="{esc(span(r["unit_a"]))}">'
        '<div class="summary-grid">'
        f'<div class="path">{esc(span(r["unit_a"]))}</div>'
        f'<div class="path">{esc(span(r["unit_b"]))}</div>'
        "</div>"
        f'<div class="meta">score {r["score"]:.4f} · {r["duplicated_lines"]} duplicated lines'
        f' · reasons: {esc(",".join(r["reasons"]))}'
        + (f" · cluster {cluster}" if cluster is not None else "")
        + "</div>"
        f"{diff_html}</div>"
    )


def write_html_report(
    findings: DataFrame,
    out_path: str,
    top_n: int = 1000,
    snippets: DataFrame | None = None,
) -> None:
    rows = collect_findings(findings, top_n)
    texts = best_display_texts(rows, snippets)
    body = "".join(_render_finding(r, texts) for r in rows)
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>sparkclone Report</title>"
        f"<style>{_HTML_STYLE}</style></head><body>"
        f"<h1>sparkclone Report</h1>"
        f'<div class="meta">Schema: unit pair · score · duplicated lines · reasons '
        f"({len(rows)} findings)</div>"
        '<div class="controls"><label for="sort-findings">Sort findings:</label> '
        '<select id="sort-findings">'
        '<option value="score">score</option>'
        '<option value="lines">duplicated lines</option>'
        '<option value="path">path</option>'
        "</select></div>"
        f'<div class="list" id="findings">{body}</div>'
        f"<script>{_HTML_SORT_JS}</script></body></html>"
    )
    with open(out_path, "w") as f:
        f.write(doc)


def _unit_location(unit_id: str) -> dict[str, Any]:
    # unit_id = path:qualname:start:end; tolerate foreign id shapes
    parts = str(unit_id).rsplit(":", 3)
    if len(parts) != 4:
        return {"physicalLocation": {"artifactLocation": {"uri": str(unit_id)}}}
    path, _qual, start, end = parts
    try:
        region = {"startLine": int(start), "endLine": int(end)}
    except ValueError:
        return {"physicalLocation": {"artifactLocation": {"uri": str(unit_id)}}}
    return {
        "physicalLocation": {
            "artifactLocation": {"uri": path},
            "region": region,
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
            "properties": {
                "duplicated_lines": r["duplicated_lines"],
                "reasons": list(r["reasons"]),
            },
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


# --- reporter registry (reference model/registry.py Reporter seam) ---------
# Uniform protocol: reporter(findings, out_path, *, top_n, stats,
# config_snapshot, timing, snippets) — adapters close over the concrete
# writers so a deployment can register a new --format without touching the
# CLI (which resolves formats through registry.get("reporter", name)).

from sparkclone import registry as _registry  # noqa: E402


@_registry.register("reporter", "json")
def _json_reporter(findings, out_path, *, top_n=1000, stats=None,
                   config_snapshot=None, timing=None, snippets=None):
    write_json_report(findings, stats or {}, config_snapshot or {},
                      timing or {}, out_path, top_n=top_n)


@_registry.register("reporter", "html")
def _html_reporter(findings, out_path, *, top_n=1000, stats=None,
                   config_snapshot=None, timing=None, snippets=None):
    write_html_report(findings, out_path, top_n=top_n, snippets=snippets)


@_registry.register("reporter", "sarif")
def _sarif_reporter(findings, out_path, *, top_n=1000, stats=None,
                    config_snapshot=None, timing=None, snippets=None):
    write_sarif_report(findings, out_path, top_n=top_n)
