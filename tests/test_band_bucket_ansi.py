"""ANSI-safety regression: empty-token documents must produce a NULL LSH
band bucket (matching the DuckDB oracle), not an
INVALID_ARRAY_INDEX_IN_ELEMENT_AT crash under Spark 4's default ANSI mode
(round-2 verdict "What's wrong" #1)."""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def docs_with_empty(tmp_path_factory):
    """documents.parquet containing blank / symbol-only docs (empty token
    sets) alongside normal ones."""
    d = tmp_path_factory.mktemp("docs-empty")
    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["s"] * 5,
        "text": [
            "the quick brown fox",
            "",  # blank file
            "!!! ??? ***",  # symbol-only: tokenizes to nothing
            "the quick brown fox",  # dup of 1: same bucket
            "another document entirely",
        ],
    }
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def _oracle_rows(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def _canon(rows):
    def key(r):
        return tuple("\0" if v is None else str(v) for v in r)

    return sorted((tuple(r) for r in rows), key=lambda r: key(r))


def test_lsh_band_buckets_with_empty_docs_matches_oracle(spark, docs_with_empty):
    import __spark_entry__ as entry

    got = _canon(
        [tuple(r) for r in entry._q_lsh_band_buckets(spark, docs_with_empty).collect()]
    )
    want = _canon(_oracle_rows(docs_with_empty, entry.oracle_sql()["lsh_band_buckets"]))
    assert got == want
    # the two empty-token docs share the NULL bucket
    null_groups = [r for r in got if r[0] is None]
    assert len(null_groups) == 1 and null_groups[0][1] == 2


def test_band_bucket_null_for_empty_sketch(spark):
    from pyspark.sql import functions as F

    from sparkclone.textops import band_bucket, distinct_tokens, minhash_md5

    df = spark.createDataFrame([("",), ("real words here",)], "text string")
    out = df.select(
        band_bucket(minhash_md5(distinct_tokens(F.col("text")), 4), 1).alias("b")
    ).collect()
    assert out[0]["b"] is None
    assert isinstance(out[1]["b"], str) and len(out[1]["b"]) == 8


def test_near_dup_queries_survive_empty_docs(spark, docs_with_empty):
    """The pair queries that join on mh1 must not crash either; empty-token
    docs drop out of pair generation (NULL join keys never match)."""
    import __spark_entry__ as entry

    for q in ("near_dup_pairs", "simhash_hamming_pairs", "kmv_jaccard_pairs"):
        rows = entry.queries()[q](spark, docs_with_empty).collect()
        ids = {r[0] for r in rows} | {r[1] for r in rows}
        assert 2 not in ids and 3 not in ids
        assert not any(v is None or (isinstance(v, float) and math.isnan(v)) for r in rows for v in r)
