"""Tests for reporters, incremental diff scan, media plumbing, vector ops."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


# --- reporters -------------------------------------------------------------


def test_json_report(pipeline_output, tmp_path):
    from sparkclone.report import write_json_report

    out = tmp_path / "report.json"
    write_json_report(
        pipeline_output["findings"],
        stats={"files": 127},
        config_snapshot={"engine": "sparkclone"},
        timing={"total": 1.0},
        out_path=str(out),
    )
    payload = json.loads(out.read_text())
    assert set(payload) == {"findings", "stats", "config", "timing"}
    assert payload["findings"]
    f0 = payload["findings"][0]
    assert {"unit_a", "unit_b", "score", "duplicated_lines", "reasons"} <= set(f0)
    # deterministic: top finding has the max score
    assert f0["score"] == max(f["score"] for f in payload["findings"])


def test_html_report(pipeline_output, tmp_path):
    from sparkclone.report import write_html_report

    out = tmp_path / "report.html"
    write_html_report(pipeline_output["findings"], str(out))
    doc = out.read_text()
    assert doc.startswith("<!doctype html>")
    assert 'class="finding"' in doc and "sort-findings" in doc


def test_sarif_report(pipeline_output, tmp_path):
    from sparkclone.report import write_sarif_report

    out = tmp_path / "report.sarif"
    write_sarif_report(pipeline_output["findings"], str(out))
    sarif = json.loads(out.read_text())
    assert sarif["version"] == "2.1.0"
    results = sarif["runs"][0]["results"]
    assert results
    for r in results[:5]:
        assert len(r["locations"]) == 2
        region = r["locations"][0]["physicalLocation"]["region"]
        assert region["startLine"] >= 1


def test_unified_diff_truncation():
    from sparkclone.report import unified_diff

    a = "\n".join(f"line {i}" for i in range(300))
    b = "\n".join(f"line {i}x" for i in range(300))
    d = unified_diff(a, b, "a", "b")
    assert len(d) <= 4000 + 20
    assert "…truncated…" in d


# --- incremental diff scan ---------------------------------------------------


def test_changed_files_anti_join(spark):
    from sparkclone.incremental import changed_files

    old = spark.createDataFrame(
        [("r", "a.py", "h1"), ("r", "b.py", "h2")],
        ["repo", "path", "content_sha256"],
    )
    new = spark.createDataFrame(
        [("r", "a.py", "h1"), ("r", "b.py", "CHANGED"), ("r", "c.py", "h3")],
        ["repo", "path", "content_sha256"],
    )
    got = {r["path"] for r in changed_files(new, old).collect()}
    assert got == {"b.py", "c.py"}


def test_diff_filter_changed_vs_all(spark):
    """Changed-vs-ALL semantics (diff.py:60-68): a finding between a
    changed file and an unchanged file is kept."""
    from sparkclone.incremental import diff_filter_findings

    findings = spark.createDataFrame(
        [
            ("u1", "u2", "r/a.py", "r/b.py"),
            ("u3", "u4", "r/c.py", "r/d.py"),
        ],
        ["unit_a", "unit_b", "path_a", "path_b"],
    )
    changed = spark.createDataFrame([("r", "a.py", "r/a.py")], ["repo", "path", "fpath"])
    got = {(r["unit_a"], r["unit_b"]) for r in diff_filter_findings(findings, changed).collect()}
    assert got == {("u1", "u2")}


# --- media plumbing ----------------------------------------------------------


def test_media_feature_extraction(spark):
    from sparkclone.media import FEATURE_DIM, extract_media_features

    media = spark.createDataFrame(
        [(1, "image", "fake-png-bytes"), (2, "image", "fake-png-bytes"), (3, "audio", "other")],
        ["media_id", "kind", "data"],
    )
    feats = extract_media_features(media, use_fake_decoder=True).orderBy("media_id").collect()
    assert len(feats) == 3
    assert all(len(f["feature"]) == FEATURE_DIM for f in feats)
    # deterministic fake: identical bytes => identical features & md5
    assert feats[0]["feature"] == feats[1]["feature"]
    assert feats[0]["content_md5"] == feats[1]["content_md5"]
    assert feats[0]["feature"] != feats[2]["feature"]


def test_media_real_decoder_skips_codec_formats(spark):
    """The real-decoder path never crashes on undecodable payloads: it
    yields a NULL feature with the reason in decode_status (full decode
    coverage for BMP/netpbm/WAV lives in tests/test_media_decode.py)."""
    from sparkclone.media import extract_media_features

    media = spark.createDataFrame([(1, "image", "x")], ["media_id", "kind", "data"])
    row = extract_media_features(media, use_fake_decoder=False).collect()[0]
    assert row["decode_status"] == "unknown:unsupported"
    assert row["feature"] is None


def test_frame_sample_plan(spark):
    from sparkclone.media import frame_sample_plan

    video = spark.createDataFrame([(1, "video", "x" * 900)], ["media_id", "kind", "data"])
    frames = frame_sample_plan(video, every_n=30).collect()
    assert [r["frame_no"] for r in frames] == [0, 30, 60]


# --- vector ops ---------------------------------------------------------------


def test_cosine_column(spark):
    from sparkclone.vector import cosine

    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        ["a", "b"],
    )
    got = [round(r["c"], 6) for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [1.0, 0.0, 1.0]


def test_srp_recall_vs_brute(spark):
    """SRP ANN must recover a healthy fraction of true top-3 neighbors on
    the real embeddings table (sf0.001)."""
    from sparkclone.vector import brute_force_topk, srp_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = brute_force_topk(e.where(F.col("vec_id") < 50), e, k=3)
    true_pairs = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    ann = srp_topk(e, k=3, n_planes=4, n_tables=8, seed=42)
    ann_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in ann.where(F.col("query_id") < 50).collect()
    }
    recall = len(true_pairs & ann_pairs) / len(true_pairs)
    assert recall >= 0.6, f"SRP recall too low: {recall:.2f}"
