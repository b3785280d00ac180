"""Round-6 optimization measurement harness (NOT the driver contract —
bench.py stays frozen; this file exists so optimization claims in
OPTIMIZATION_r06.md cite reproducible numbers).

Modes (first CLI arg):
  stages   — eager per-stage wall split of pipeline_corpus and clone_docs
  queries  — noop-sink isolation of each headline query (guide §1.4),
             N repeats, fresh timings per repeat
  plans    — write .explain("formatted") for the headline queries to
             plans/r06/<query>_<tag>.txt  (tag = 2nd CLI arg)
  probe    — time the incremental probe + hop2 sections alone

Env contract mirrors bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "src"))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def _session(cpus: int, eventlog_dir: str | None = None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkclone-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    if eventlog_dir:
        os.makedirs(eventlog_dir, exist_ok=True)
        b = (
            b.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", eventlog_dir)
            .config("spark.eventLog.compress", "false")
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm_pool(spark, cpus: int) -> None:
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v):
        return v * 1.0

    (
        spark.range(cpus * 4)
        .repartition(cpus)
        .select(_warm(F.col("id").cast("double")))
        .write.format("noop").mode("overwrite").save()
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _corpus(spark, sf: float):
    from sparkclone.corpus import generate_corpus_rows, rows_to_parquet

    n_repos = max(20, int(4000 * sf))
    rows = generate_corpus_rows(seed=42, n_repos=n_repos, files_per_repo=10)
    tmp = tempfile.mkdtemp(prefix="bx-corpus-")
    corpus_path = f"{tmp}/corpus.parquet"
    rows_to_parquet(rows, corpus_path)
    return rows, tmp, corpus_path


def mode_stages(spark, sf_dir: str, sf: float, cpus: int) -> None:
    from sparkclone.config import benchmark_config
    from sparkclone.pipeline import load_corpus, run_pipeline

    _warm_pool(spark, cpus)
    out: dict = {"mode": "stages"}

    rows, tmp, corpus_path = _corpus(spark, sf)
    t0 = time.perf_counter()
    r = run_pipeline(
        spark, load_corpus(spark, corpus_path), benchmark_config(), eager_metrics=True
    )
    r["clusters"].select("cluster_id").distinct().count()
    r["findings"].count()
    out["pipeline_corpus_eager_total"] = round(time.perf_counter() - t0, 3)
    out["pipeline_corpus_stages"] = {
        m.stage: round(m.wall_s, 3) for m in r["metrics"].metrics
    }
    r["metrics"].release()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from sparkclone.pipeline import run_pipeline as rp

    from __spark_entry__ import _doc_pipeline_config, documents_as_corpus, _docs

    t0 = time.perf_counter()
    doc_out = rp(
        spark,
        documents_as_corpus(_docs(spark, sf_dir)),
        _doc_pipeline_config(),
        eager_metrics=True,
    )
    doc_out["cluster_sizes"].select("cluster_id", "member_count", "cluster_root").count()
    out["clone_docs_eager_total"] = round(time.perf_counter() - t0, 3)
    out["clone_docs_stages"] = {
        m.stage: round(m.wall_s, 3) for m in doc_out["metrics"].metrics
    }
    doc_out["metrics"].release()
    print(json.dumps(out))


def mode_queries(spark, sf_dir: str, sf: float, cpus: int, repeats: int = 2) -> None:
    import __spark_entry__ as entrymod

    _warm_pool(spark, cpus)
    qs = entrymod.queries()
    names = [
        "pricing_summary",
        "top_customers",
        "user_sessions",
        "exact_dup_groups",
        "doc_minhash",
        "cosine_top3",
        "srp_ann_top3",
    ]
    out: dict = {"mode": "queries", "timings": {}}
    for rep in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bx:{name}:{rep}")
            t0 = time.perf_counter()
            _noop(qs[name](spark, sf_dir))
            out["timings"].setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    # clone_docs once (minute-scale)
    t0 = time.perf_counter()
    df = entrymod._q_clone_pipeline_cluster_sizes(spark, sf_dir)
    n = df.count()
    out["timings"]["clone_docs"] = [round(time.perf_counter() - t0, 3)]
    out["doc_clusters"] = n
    print(json.dumps(out))


def mode_probe(spark, sf_dir: str, sf: float, cpus: int) -> None:
    import dataclasses

    from sparkclone.config import benchmark_config
    from sparkclone.incremental import (
        incremental_scan_probe,
        load_probe_stages,
        persist_probe_artifacts,
    )
    from sparkclone.pipeline import load_corpus, run_pipeline
    from sparkclone.corpus import rows_to_parquet

    _warm_pool(spark, cpus)
    out: dict = {"mode": "probe"}
    rows, tmp, corpus_path = _corpus(spark, sf)
    changed_keys = {(r.repo, r.path) for i, r in enumerate(rows) if i % 100 == 0}
    old_rows = [r for r in rows if (r.repo, r.path) not in changed_keys]
    old_path = f"{tmp}/corpus_old.parquet"
    rows_to_parquet(old_rows, old_path)
    base = run_pipeline(
        spark, load_corpus(spark, old_path), benchmark_config(),
        checkpoint_dir=f"{tmp}/ck", eager_metrics=False,
    )
    base["findings"].count()
    t0 = time.perf_counter()
    probe = incremental_scan_probe(
        spark, load_corpus(spark, corpus_path), base["snippets"],
        base["signatures"], load_corpus(spark, old_path), benchmark_config(),
    )
    out["probe_build_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["diff_findings"] = probe["diff_findings"].count()
    out["probe_count_sec"] = round(time.perf_counter() - t0, 3)
    base_key = f"{tmp}/ck/{base['metrics'].config_hash}"
    chain_key = f"{tmp}/ck/chain-v2"
    t0 = time.perf_counter()
    persist_probe_artifacts(probe, chain_key, spark=spark, base_key_dir=base_key)
    out["refresh_sec"] = round(time.perf_counter() - t0, 3)
    v3_rows = [
        dataclasses.replace(r, content=r.content + "\n# rev3 touch\n")
        if i % 100 == 50 else r
        for i, r in enumerate(rows)
    ]
    first_exact = next(r for r in rows if r.family == "exact")
    v3_rows.append(
        dataclasses.replace(first_exact, path=first_exact.path + ".rev3_copy.py")
    )
    v3_path = f"{tmp}/corpus_v3.parquet"
    rows_to_parquet(v3_rows, v3_path)
    t0 = time.perf_counter()
    chain_stages = load_probe_stages(spark, chain_key, ["snippets", "signatures"])
    probe2 = incremental_scan_probe(
        spark, load_corpus(spark, v3_path),
        chain_stages["snippets"], chain_stages["signatures"],
        load_corpus(spark, corpus_path), benchmark_config(),
    )
    out["hop2_findings"] = probe2["diff_findings"].count()
    out["hop2_sec"] = round(time.perf_counter() - t0, 3)
    probe2["release"]()
    print(json.dumps(out))


def mode_plans(spark, sf_dir: str, sf: float, cpus: int, tag: str) -> None:
    import __spark_entry__ as entrymod

    dest = Path(__file__).resolve().parent / "plans" / "r06"
    dest.mkdir(parents=True, exist_ok=True)
    qs = entrymod.queries()
    names = [
        "pricing_summary",
        "top_customers",
        "user_sessions",
        "exact_dup_groups",
        "doc_minhash",
        "cosine_top3",
        "srp_ann_top3",
        "near_dup_pairs",
        "clone_pipeline_cluster_sizes",
    ]
    import io
    from contextlib import redirect_stdout

    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (dest / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")


def mode_lazy(spark, sf_dir: str, sf: float, cpus: int) -> None:
    """Lazy-cascade timing of the two minute-scale pipelines, mirroring
    bench.py's timed regions exactly (eager_metrics=False + the same
    count actions), with per-job walls via job-group bookkeeping."""
    from sparkclone.config import benchmark_config
    from sparkclone.pipeline import load_corpus, run_pipeline

    _warm_pool(spark, cpus)
    out: dict = {"mode": "lazy"}
    rows, tmp, corpus_path = _corpus(spark, sf)
    spark.sparkContext.setJobDescription("pipeline_corpus")
    t0 = time.perf_counter()
    r = run_pipeline(
        spark, load_corpus(spark, corpus_path), benchmark_config(), eager_metrics=False
    )
    t_build = time.perf_counter() - t0
    n_clusters = r["clusters"].select("cluster_id").distinct().count()
    t_clusters = time.perf_counter() - t0 - t_build
    r["findings"].count()
    t_findings = time.perf_counter() - t0 - t_build - t_clusters
    out["pipeline_corpus"] = {
        "build_sec": round(t_build, 3),
        "clusters_count_sec": round(t_clusters, 3),
        "findings_count_sec": round(t_findings, 3),
        "total_sec": round(time.perf_counter() - t0, 3),
        "n_clusters": n_clusters,
    }
    r["metrics"].release()

    from __spark_entry__ import _doc_pipeline_config, _docs, documents_as_corpus
    from sparkclone.pipeline import run_pipeline as rp

    spark.sparkContext.setJobDescription("clone_docs")
    t0 = time.perf_counter()
    doc_out = rp(
        spark,
        documents_as_corpus(_docs(spark, sf_dir)),
        _doc_pipeline_config(),
        eager_metrics=False,
    )
    t_build = time.perf_counter() - t0
    n = doc_out["cluster_sizes"].select(
        "cluster_id", "member_count", "cluster_root"
    ).count()
    out["clone_docs"] = {
        "build_sec": round(t_build, 3),
        "count_sec": round(time.perf_counter() - t0 - t_build, 3),
        "total_sec": round(time.perf_counter() - t0, 3),
        "doc_clusters": n,
    }
    doc_out["metrics"].release()
    print(json.dumps(out))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    spark = _session(cpus, eventlog_dir=os.environ.get("BX_EVENTLOG_DIR"))
    if mode == "lazy":
        mode_lazy(spark, sf_dir, sf, cpus)
    elif mode == "stages":
        mode_stages(spark, sf_dir, sf, cpus)
    elif mode == "queries":
        mode_queries(spark, sf_dir, sf, cpus)
    elif mode == "probe":
        mode_probe(spark, sf_dir, sf, cpus)
    elif mode == "plans":
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        mode_plans(spark, sf_dir, sf, cpus, tag)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
