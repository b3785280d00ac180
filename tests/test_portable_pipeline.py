"""Full-pipeline DuckDB oracle via the portable config (round-2 verdict
item 9): clone_pipeline_portable_sizes runs the REAL run_pipeline code
path (extract -> collapse -> signatures -> LSH -> verify -> rollup -> CC)
with the md5_portable sketch scheme and raw-text mode, and must
hash-match the recursive-closure SQL oracle."""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _oracle_rows(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_portable_pipeline_matches_duckdb_oracle(spark):
    import __spark_entry__ as entry

    got = sorted(
        tuple(r)
        for r in entry._q_clone_pipeline_portable_sizes(spark, SF_DIR).collect()
    )
    want = _oracle_rows(SF_DIR, entry.oracle_sql()["clone_pipeline_portable_sizes"])
    assert got == want
    assert got, "portable pipeline produced no clusters — fixture broken"


def test_normalize_identity_on_documents(spark):
    """The portable config uses normalize_text=False; this asserts the
    oracle's implicit assumption that normalize_source is the identity on
    the synthetic document corpus (plain word sequences never parse as
    Python), so raw mode == reference-normalized mode there."""
    import duckdb as _d

    from sparkclone.normalize import normalize_source

    texts = [
        t
        for (t,) in _d.sql(
            f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    assert all(normalize_source(t) == t for t in texts)


def test_md5_scheme_rejects_missing_norm_text(spark):
    from sparkclone.config import SignatureConfig
    from sparkclone.signatures import with_signatures

    df = spark.createDataFrame([(1,)], "snippet_id long")
    with pytest.raises(ValueError, match="norm_text"):
        with_signatures(df, SignatureConfig(scheme="md5_portable"))
