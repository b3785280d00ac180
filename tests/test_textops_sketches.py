"""simhash16 / KMV-estimator unit tests (the oracle-portable sketch twins
of signatures.py — see textops.py docstring)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _py_simhash16(tokens: set[str]) -> int:
    """Independent reimplementation: majority vote over the first 16 bits
    (big-endian hex) of md5(token); ties -> bit clear."""
    votes = [0] * 16
    for t in tokens:
        v = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
        for j in range(16):
            votes[j] += 1 if (v >> j) & 1 else -1
    return sum((1 << j) for j in range(16) if votes[j] > 0)


def test_simhash16_matches_reference_formula(spark):
    from sparkclone.textops import simhash16

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox leaps"),
        (3, ""),  # empty token set -> 0
        (4, "completely different words here entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["simhash16"] for r in simhash16(df, "doc_id", "text").collect()}
    for doc_id, text in rows:
        toks = set(__import__("re").findall(r"[a-z0-9_]+", text.lower()))
        assert got[doc_id] == _py_simhash16(toks), doc_id
    assert got[3] == 0


def test_simhash16_near_texts_have_small_hamming(spark):
    from sparkclone.textops import simhash16

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok7", "tokx")  # 1 of 60 tokens changed
    far = " ".join(f"other{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id int, text string"
    )
    s = {r["doc_id"]: r["simhash16"] for r in simhash16(df, "doc_id", "text").collect()}
    ham_near = bin(s[1] ^ s[2]).count("1")
    ham_far = bin(s[1] ^ s[3]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 4


def test_kmv_estimate_tracks_exact_jaccard(spark):
    from sparkclone.textops import distinct_tokens, jaccard_sets, kmv_jaccard_est, minhash_md5

    # overlapping token universes with known exact Jaccard
    a = " ".join(f"w{i}" for i in range(0, 100))
    b = " ".join(f"w{i}" for i in range(25, 125))  # |I|=75, |U|=125 -> 0.6
    df = spark.createDataFrame([(a, b)], "ta_text string, tb_text string").select(
        distinct_tokens(F.col("ta_text")).alias("ta"),
        distinct_tokens(F.col("tb_text")).alias("tb"),
    )
    row = df.select(
        jaccard_sets(F.col("ta"), F.col("tb")).alias("exact"),
        kmv_jaccard_est(
            minhash_md5(F.col("ta"), 32), minhash_md5(F.col("tb"), 32), 32
        ).alias("est"),
    ).collect()[0]
    assert abs(row["exact"] - 0.6) < 1e-9
    # KMV with k=32 over 125-element union: tolerance ~2/sqrt(k)
    assert abs(row["est"] - row["exact"]) < 0.35


def test_kmv_identical_sets_estimate_one(spark):
    from sparkclone.textops import kmv_jaccard_est, minhash_md5, distinct_tokens

    df = spark.createDataFrame([("alpha beta gamma",)], "text string").select(
        distinct_tokens(F.col("text")).alias("t")
    )
    row = df.select(
        kmv_jaccard_est(minhash_md5(F.col("t"), 8), minhash_md5(F.col("t"), 8), 8).alias("est")
    ).collect()[0]
    assert row["est"] == 1.0
