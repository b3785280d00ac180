"""Pluggable extension registry (reference model/interfaces.py:15-52 +
model/registry.py:16-27): custom extractors / reporters / signature
schemes / engines plug in without editing core code."""

from __future__ import annotations

import json

import pytest


def test_unknown_component_lists_available():
    from sparkclone import registry

    with pytest.raises(KeyError, match="available"):
        registry.get("reporter", "no-such-format")


def test_builtins_registered():
    import sparkclone.engines  # noqa: F401
    import sparkclone.report  # noqa: F401
    import sparkclone.signatures  # noqa: F401
    from sparkclone import registry

    assert set(registry.available("reporter")) >= {"json", "html", "sarif"}
    assert set(registry.available("signature_scheme")) >= {"xxhash64", "md5_portable"}
    assert set(registry.available("engine")) >= {"semantic", "sonarqube"}
    assert "python" in registry.available("extractor") or True  # registered on import
    import sparkclone.extract  # noqa: F401

    assert {"python", "py", "text"} <= set(registry.available("extractor"))


def test_custom_extractor_used_for_new_lang(spark):
    """A lang registered after import routes through the custom unit
    extractor (here: per-paragraph units for 'prose')."""
    from sparkclone import registry
    from sparkclone.config import WindowConfig
    from sparkclone.extract import _sha256, _Unit, extract_snippets

    def prose_extractor(path, content):
        units = []
        line = 1
        for i, para in enumerate(content.split("\n\n")):
            n = len(para.splitlines()) or 1
            if para.strip():
                units.append(_Unit(f"para{i}", line, line + n - 1, para, _sha256(para)))
            line += n + 1
        return units

    registry.register("extractor", "prose", prose_extractor)
    try:
        df = spark.createDataFrame(
            [("r", "a.txt", "0", "prose", "first para line\n\nsecond para line")],
            "repo string, path string, commit string, lang string, content string",
        )
        rows = extract_snippets(df, WindowConfig(12, 6, 1)).collect()
        qnames = {r["qualified_name"] for r in rows}
        assert qnames == {"para0", "para1"}
        assert all(r["kind"] == "WIN" for r in rows)  # no emits_func flag
    finally:
        del registry._REGISTRY["extractor"]["prose"]


def test_custom_reporter_via_cli_format(spark, tmp_path, monkeypatch):
    """The CLI resolves --format through the reporter registry."""
    import sparkclone.report  # noqa: F401
    from sparkclone import registry
    from sparkclone.cli import _write_report

    written = {}

    @registry.register("reporter", "csvtest")
    def _csv(findings, out_path, *, top_n=1000, **kw):
        written["path"] = out_path
        written["n"] = findings.count()

    try:
        import argparse

        df = spark.createDataFrame([(1,)], "x int")
        args = argparse.Namespace(format="csvtest", top_n=10)
        _write_report(args, df, {}, {}, {}, str(tmp_path / "o.csv"))
        assert written == {"path": str(tmp_path / "o.csv"), "n": 1}
    finally:
        del registry._REGISTRY["reporter"]["csvtest"]


def test_unknown_engine_fails_listing_registry(spark, tmp_path):
    """Config validation resolves engine names through the registry: an
    unknown engine fails naming the registered ones; a newly registered
    engine name passes validation."""
    from sparkclone import registry
    from sparkclone.cli import main
    from sparkclone.config_loader import ConfigError

    with pytest.raises(ConfigError, match="semantic"):
        main([
            "scan", "--corpus", "unused.parquet", "--engine", "nope",
            "--config-root", str(tmp_path),
        ])

    registry.register("engine", "customimp", lambda spark, p: None)
    try:
        # passes engine validation, then exits on the missing report config
        with pytest.raises(SystemExit, match="customimp engine is not configured"):
            main([
                "scan", "--corpus", "unused.parquet", "--engine", "customimp",
                "--config-root", str(tmp_path),
            ])
    finally:
        del registry._REGISTRY["engine"]["customimp"]


def test_custom_signature_scheme_dispatch(spark):
    from pyspark.sql import functions as F

    from sparkclone import registry
    from sparkclone.config import SignatureConfig
    from sparkclone.signatures import with_signatures

    @registry.register("signature_scheme", "toy")
    def _toy(df, cfg):
        return (
            df.withColumn("minhash", F.array(F.lit(1)))
            .withColumn("simhash", F.lit(0).cast("long"))
            .withColumn("bands", F.array(F.lit(7)))
        )

    try:
        df = spark.createDataFrame([(1,)], "snippet_id long")
        out = with_signatures(df, SignatureConfig(scheme="toy")).collect()[0]
        assert list(out["bands"]) == [7]
    finally:
        del registry._REGISTRY["signature_scheme"]["toy"]
