"""Attribute the srp_ann_top3 round-4 regression (round-4 verdict wrong #2).

Hypotheses, in order of prior:
  H1 suite position/memory state: round 4 added the incremental hop-2
     section BEFORE srp in bench.py; its eager localCheckpoint blocks
     stay resident until GC, shrinking execution memory for srp's
     candidate-join shuffle.
  H2 the r4 code change itself (count() job removed, n_rows from the
     parquet footer) — implausible: strictly less work, identical
     n_planes either way.

Protocol: each measurement is a FRESH JVM (in-session repeats reuse
scan listings/JIT state); modes run interleaved A/B/A/B by the caller
(tools/attr_srp.sh loop) to decorrelate host burst-credit drift.

Modes:
  solo      — srp query alone, 3 back-to-back runs (run1 includes JVM +
              Arrow UDF warm-up; runs 2-3 are steady state)
  r3code    — same, but n_planes resolved via df.count() exactly like
              round-3 code (H2 check)
  afterload — run the bench suite's preceding sections' memory shape
              first (pipeline_corpus + probe + hop2), then srp 3x (H1)
  afterload_dropped — afterload, but unpersist every pinned RDD
              (localCheckpoint blocks included) before srp — validates
              the bench.py hygiene fix: expected ≈ solo if H1 holds
  warmudf   — run one trivial pandas-UDF job first, then srp 3x: if
              run1 drops to steady state, the cold cost is Python/Arrow
              worker-pool spin-up (H3), not the srp plan itself
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("attr-srp")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "solo"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    if mode.startswith("afterload"):
        # reproduce the bench suite's pre-srp memory shape (corpus
        # pipeline + probe + hop2 + clone_docs would take minutes; the
        # candidate for leftover-resident blocks is the probe/hop2
        # localCheckpoint storage, so run those)
        import dataclasses
        import tempfile

        from sparkclone.config import benchmark_config
        from sparkclone.corpus import generate_corpus_rows, rows_to_parquet
        from sparkclone.incremental import incremental_scan_probe
        from sparkclone.pipeline import load_corpus, run_pipeline

        sf = 0.1
        rows = generate_corpus_rows(seed=42, n_repos=max(20, int(4000 * sf)), files_per_repo=10)
        tmp = tempfile.mkdtemp(prefix="attr-srp-")
        corpus_path = f"{tmp}/corpus.parquet"
        rows_to_parquet(rows, corpus_path)
        changed_keys = {(r.repo, r.path) for i, r in enumerate(rows) if i % 100 == 0}
        old_rows = [r for r in rows if (r.repo, r.path) not in changed_keys]
        old_path = f"{tmp}/corpus_old.parquet"
        rows_to_parquet(old_rows, old_path)
        out = run_pipeline(spark, load_corpus(spark, corpus_path), benchmark_config(), eager_metrics=False)
        out["findings"].count()
        base = run_pipeline(
            spark, load_corpus(spark, old_path), benchmark_config(),
            checkpoint_dir=f"{tmp}/ck", eager_metrics=False,
        )
        base["findings"].count()
        probe = incremental_scan_probe(
            spark, load_corpus(spark, corpus_path), base["snippets"],
            base["signatures"], load_corpus(spark, old_path), benchmark_config(),
        )
        probe["diff_findings"].count()
        out["metrics"].release()
        base["metrics"].release()
        probe["release"]()
        if mode == "afterload_dropped":
            # the bench.py hygiene fix: localCheckpoint blocks survive
            # release() by design; none of these frames is used again
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()  # noqa: SLF001
            ):
                jrdd.unpersist(True)

    if mode == "warmudf":
        from pyspark.sql import functions as F

        # exec-scoped so `from __future__ import annotations` above does
        # not stringify the type hints pandas_udf infers its type from
        ns: dict = {}
        exec(  # noqa: S102 — fixed literal, test tool only
            "import pandas as pd\n"
            "from pyspark.sql.functions import pandas_udf\n"
            "@pandas_udf('double')\n"
            "def _warm(v: pd.Series) -> pd.Series:\n"
            "    return v * 1.0\n",
            ns,
        )
        (
            spark.range(cpus * 4)
            .repartition(cpus)
            .select(ns["_warm"](F.col("id").cast("double")))
            .write.format("noop").mode("overwrite").save()
        )

    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        if mode == "r3code":
            from sparkclone.vector import srp_topk

            e = entrymod._tbl(spark, sf_dir, "embeddings")
            df = srp_topk(e, k=3, n_planes=None, n_tables=12, seed=42, dim=64)
        else:
            df = entrymod._q_srp_ann_top3(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"mode": mode, "cpus": cpus, "sf_dir": sf_dir, "walls": walls}))


if __name__ == "__main__":
    main()
