"""spark-submit entry point (the ``clonehunter scan`` analogue).

Reference CLI surface (cli/main.py:50-134, cli/commands/scan.py:77-185):
paths + config flags -> scan -> report in json/html/sarif. Ours takes the
corpus table path instead of filesystem paths (the engine's input is the
Iceberg-shaped table, input_hint), plus the same knobs: window geometry,
thresholds, cluster min-size, include/exclude globs, report format.

Usage:
    spark-submit --py-files sparkclone.zip -m ... src/sparkclone/cli.py \
        --corpus /data/corpus.parquet --out findings.json --format json \
        --window-lines 12 --stride-lines 6 --min-nonempty 4 \
        --checkpoint-dir /tmp/ck --output-tables /tmp/out
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sparkclone", description="PySpark near-duplicate code scanner")
    p.add_argument("--corpus", required=True, help="corpus parquet/Iceberg path")
    p.add_argument("--out", default="findings.json", help="report output path")
    p.add_argument("--format", choices=["json", "html", "sarif"], default="json")
    p.add_argument("--include", action="append", default=[], help="include glob (repeatable)")
    p.add_argument("--exclude", action="append", default=[], help="exclude glob (repeatable)")
    p.add_argument("--window-lines", type=int, default=40)
    p.add_argument("--stride-lines", type=int, default=6)
    p.add_argument("--min-nonempty", type=int, default=4)
    p.add_argument("--func-threshold", type=float, default=0.92)
    p.add_argument("--win-threshold", type=float, default=0.90)
    p.add_argument("--min-window-hits", type=int, default=1)
    p.add_argument("--lexical-min-ratio", type=float, default=0.5)
    p.add_argument("--cluster-min-size", type=int, default=2)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--output-tables", default=None, help="directory for findings/clusters parquet")
    p.add_argument("--top-n", type=int, default=1000, help="findings in the report")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("sparkclone-scan").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from sparkclone.config import (
        ClusterConfig,
        PipelineConfig,
        Thresholds,
        WindowConfig,
    )
    from sparkclone.globs import filter_corpus
    from sparkclone.pipeline import load_corpus, run_pipeline
    from sparkclone.report import write_html_report, write_json_report, write_sarif_report

    cfg = PipelineConfig(
        windows=WindowConfig(args.window_lines, args.stride_lines, args.min_nonempty),
        thresholds=Thresholds(
            func=args.func_threshold,
            win=args.win_threshold,
            min_window_hits=args.min_window_hits,
            lexical_min_ratio=args.lexical_min_ratio,
        ),
        cluster=ClusterConfig(min_size=args.cluster_min_size),
    )

    t0 = time.perf_counter()
    corpus = load_corpus(spark, args.corpus)
    if args.include or args.exclude:
        corpus = filter_corpus(corpus, args.include, args.exclude)
    out = run_pipeline(spark, corpus, cfg, checkpoint_dir=args.checkpoint_dir)

    findings = out["findings_clustered"]
    stats = {
        "file_count": corpus.count(),
        "snippet_count": out["snippets"].count(),
        "candidate_count": out["candidate_pairs"].count(),
        "finding_count": findings.count(),
        "cluster_count": out["clusters"].select("cluster_id").distinct().count(),
    }
    timing = {"total": round(time.perf_counter() - t0, 3)}

    if args.output_tables:
        findings.write.mode("overwrite").parquet(f"{args.output_tables}/findings")
        out["clusters"].write.mode("overwrite").parquet(f"{args.output_tables}/clusters")

    if args.format == "json":
        write_json_report(
            findings,
            stats=stats,
            config_snapshot={"config_hash": cfg.config_hash()},
            timing=timing,
            out_path=args.out,
            top_n=args.top_n,
        )
    elif args.format == "html":
        write_html_report(findings, args.out, top_n=args.top_n)
    else:
        write_sarif_report(findings, args.out, top_n=args.top_n)

    print(json.dumps({"stats": stats, "timing": timing, "report": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
