"""SonarQube duplications report import (SURVEY S4).

The reference's SonarQubeEngine (engines/sonarqube_engine.py:22-67) parses
an external JSON report's ``duplications`` list into Findings with score
1.0, reasons ["sonarqube"], and duplicated_lines = min of the two span
lengths; sides with missing/empty payloads are skipped, and start/end
default to 1 / start when absent or unparseable.

Spark-native shape: ``spark.read.json`` with an explicit schema (strings
for the numerics so malformed values degrade to the defaults instead of
failing schema inference), exploded and reshaped with pure column ops to
the engine's findings schema — at scale a directory of report files
becomes one distributed scan, no driver-side JSON parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIDE = "struct<path:string,name:string,start:string,end:string,code:string>"
REPORT_SCHEMA = f"duplications array<struct<a:{_SIDE},b:{_SIDE}>>"


def _side_cols(side: str) -> list:
    s = F.col(f"d.{side}")
    start = F.coalesce(s["start"].try_cast("int"), F.lit(1))
    end = F.coalesce(s["end"].try_cast("int"), start)
    # empty-string defaults keep the unit id 4-part (path:name:start:end)
    # even when fields are null — concat_ws would silently DROP nulls and
    # emit a short id the reporters can't parse (the reference's
    # _to_function defaults path/name to "" the same way)
    path = F.coalesce(s["path"], F.lit(""))
    name = F.coalesce(s["name"], path)
    return [
        F.concat_ws(
            ":", path, name, start.cast("string"), end.cast("string")
        ).alias(f"unit_{side}"),
        path.alias(f"path_{side}"),
        start.alias(f"start_{side}"),
        end.alias(f"end_{side}"),
    ]


def import_sonarqube_report(spark: SparkSession, report_path: str) -> DataFrame:
    """Findings DataFrame from a SonarQube duplications JSON report
    (same core columns as rollup_findings: unit/path per side, score,
    duplicated_lines, reasons)."""
    raw = spark.read.option("multiLine", "true").schema(REPORT_SCHEMA).json(report_path)
    dups = raw.select(F.explode(F.coalesce("duplications", F.array())).alias("d"))
    # the reference skips a side whose payload is missing or empty
    # (`_to_function` returns None for falsy data): a NULL struct or one
    # with every field NULL is the Spark image of both cases
    present = lambda side: F.col(f"d.{side}").isNotNull() & F.coalesce(  # noqa: E731
        F.col(f"d.{side}.path").isNotNull()
        | F.col(f"d.{side}.name").isNotNull()
        | F.col(f"d.{side}.start").isNotNull()
        | F.col(f"d.{side}.end").isNotNull()
        | F.col(f"d.{side}.code").isNotNull(),
        F.lit(False),
    )
    span = lambda p: F.greatest(  # noqa: E731
        F.col(f"end_{p}") - F.col(f"start_{p}") + 1, F.lit(0)
    )
    return (
        dups.where(present("a") & present("b"))
        .select(*_side_cols("a"), *_side_cols("b"))
        .select(
            "unit_a",
            "unit_b",
            "path_a",
            "path_b",
            F.lit(1.0).alias("score"),
            F.least(span("a"), span("b")).alias("duplicated_lines"),
            F.array(F.lit("sonarqube")).alias("reasons"),
        )
    )
