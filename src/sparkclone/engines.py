"""Engine registry entries (reference ``model/registry.py`` Engine seam).

``semantic`` is the native Spark near-duplicate pipeline (run_pipeline);
report-importer engines register a callable ``(spark, report_path) ->
findings DataFrame`` — the CLI routes any non-semantic engine through it
(``--sonar-report`` / SPARKCLONE_SONAR_REPORT supplies the report path).
A deployment adds an engine with::

    from sparkclone import registry
    registry.register("engine", "myimporter", my_import_fn)
"""

from __future__ import annotations

from sparkclone import registry

ENGINE_SEMANTIC = "semantic"


def _semantic_marker(*_a, **_kw):  # resolved specially by the CLI
    raise RuntimeError("the semantic engine runs through run_pipeline, not an importer")


registry.register("engine", ENGINE_SEMANTIC, _semantic_marker)


def _sonarqube(spark, report_path: str):
    from sparkclone.sonarqube import import_sonarqube_report

    return import_sonarqube_report(spark, report_path)


registry.register("engine", "sonarqube", _sonarqube)
