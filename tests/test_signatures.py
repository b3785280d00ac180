"""MinHash/SimHash/LSH statistical + determinism tests."""

from __future__ import annotations

import numpy as np
import pytest

from sparkclone.config import SignatureConfig
from sparkclone.signatures import band_hashes, minhash_matrix, simhash_vector


def _hashes(tokens: set[int]) -> np.ndarray:
    return np.array(sorted(tokens), dtype=np.uint64)


def _batch(rows: list[set[int]]):
    concat = np.concatenate([_hashes(r) for r in rows])
    offsets = np.cumsum([0] + [len(r) for r in rows[:-1]]).astype(np.int64)
    return concat, offsets


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(7)
    universe = rng.integers(0, 1 << 62, size=2000, dtype=np.uint64)
    a = set(universe[:1000].tolist())
    b = set(universe[400:1400].tolist())  # |A∩B|=600, |A∪B|=1400 => J≈0.4286
    true_j = len(a & b) / len(a | b)
    cfg = SignatureConfig()
    concat, offsets = _batch([a, b])
    mh = minhash_matrix(concat, offsets, cfg)
    est = (mh[0] == mh[1]).mean()
    assert abs(est - true_j) < 0.12  # 128 perms => se ~ 0.044


def test_minhash_identical_sets_identical_signatures():
    s = set(range(100, 400))
    cfg = SignatureConfig()
    concat, offsets = _batch([s, s])
    mh = minhash_matrix(concat, offsets, cfg)
    assert (mh[0] == mh[1]).all()
    bh = band_hashes(mh, cfg)
    assert (bh[0] == bh[1]).all()


def test_minhash_deterministic_across_calls():
    s1 = set(range(1, 500, 3))
    cfg = SignatureConfig()
    concat, offsets = _batch([s1])
    a = minhash_matrix(concat, offsets, cfg)
    b = minhash_matrix(concat.copy(), offsets.copy(), cfg)
    assert (a == b).all()


def test_seed_changes_signatures():
    s1 = set(range(1, 500, 3))
    concat, offsets = _batch([s1])
    a = minhash_matrix(concat, offsets, SignatureConfig(seed=1))
    b = minhash_matrix(concat, offsets, SignatureConfig(seed=2))
    assert not (a == b).all()


def test_simhash_similar_sets_close_hamming():
    rng = np.random.default_rng(11)
    base = set(rng.integers(0, 1 << 62, size=500, dtype=np.uint64).tolist())
    # 95% overlap variant
    drop = set(list(base)[:25])
    add = set(rng.integers(0, 1 << 62, size=25, dtype=np.uint64).tolist())
    near = (base - drop) | add
    far = set(rng.integers(0, 1 << 62, size=500, dtype=np.uint64).tolist())
    concat, offsets = _batch([base, near, far])
    sh = simhash_vector(concat, offsets)
    ham_near = bin(int(sh[0]) ^ int(sh[1])).count("1")
    ham_far = bin(int(sh[0]) ^ int(sh[2])).count("1")
    assert ham_near < ham_far
    assert ham_near <= 12
    assert ham_far >= 20


def test_band_rows_config_validation():
    with pytest.raises(ValueError):
        SignatureConfig(num_perms=128, bands=10, rows_per_band=10)


def test_chunked_reduceat_matches_unchunked(monkeypatch):
    """Many rows crossing the chunk boundary produce the same result."""
    import sparkclone.signatures as S

    rng = np.random.default_rng(3)
    rows = [set(rng.integers(0, 1 << 60, size=rng.integers(5, 60)).tolist()) for _ in range(200)]
    cfg = SignatureConfig()
    concat, offsets = _batch(rows)
    full = minhash_matrix(concat, offsets, cfg)
    monkeypatch.setattr(S, "_CHUNK_TOKENS", 64)
    chunked = S.minhash_matrix(concat, offsets, cfg)
    assert (full == chunked).all()
    sh_full = simhash_vector(concat, offsets)
    sh_chunked = S.simhash_vector(concat, offsets)
    assert (sh_full == sh_chunked).all()


def test_spark_signature_udf_roundtrip(spark):
    """with_signatures over a small df: identical token arrays get
    identical signatures; arrays sized 1..n all work."""
    from pyspark.sql import functions as F

    from sparkclone.signatures import with_signatures

    data = [
        (1, list(range(10, 50))),
        (2, list(range(10, 50))),
        (3, list(range(1000, 1010))),
        (4, [7]),
    ]
    df = spark.createDataFrame(data, "snippet_id int, token_hashes array<long>")
    out = with_signatures(df, SignatureConfig()).orderBy("snippet_id").collect()
    assert out[0]["minhash"] == out[1]["minhash"]
    assert out[0]["simhash"] == out[1]["simhash"]
    assert out[0]["bands"] == out[1]["bands"]
    assert out[0]["minhash"] != out[2]["minhash"]
    assert len(out[3]["minhash"]) == 128
    assert len(out[3]["bands"]) == 16


def test_lsh_identical_sigs_bucket_together(spark):
    from sparkclone.config import LshConfig
    from sparkclone.lsh import candidate_pairs
    from sparkclone.signatures import with_signatures

    data = [
        (1, list(range(100))),
        (2, list(range(100))),
        (3, list(range(5000, 5100))),
    ]
    df = spark.createDataFrame(data, "snippet_id int, token_hashes array<long>")
    sigs = with_signatures(df, SignatureConfig())
    pairs, _ = candidate_pairs(sigs, LshConfig())
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_salted_path_equals_plain_path(spark):
    """Force every bucket through the salted join; the pair set must be
    identical to the plain self-join."""
    import sparkclone.lsh as L
    from sparkclone.config import LshConfig
    from sparkclone.signatures import with_signatures

    rng = np.random.default_rng(5)
    base = list(range(300))
    data = []
    for i in range(12):  # 12 rows sharing most tokens -> shared buckets
        toks = base.copy()
        for j in rng.integers(0, 300, size=3):
            toks[int(j)] = int(rng.integers(10_000, 20_000))
        data.append((i, toks))
    df = spark.createDataFrame(data, "snippet_id int, token_hashes array<long>")
    sigs = with_signatures(df, SignatureConfig())
    bt = L.band_table(sigs, "snippet_id")
    plain = {(r["id_a"], r["id_b"]) for r in L._pairs_plain(bt).dropDuplicates().collect()}
    salted = {(r["id_a"], r["id_b"]) for r in L._pairs_salted(bt).dropDuplicates().collect()}
    assert plain == salted
    assert plain  # non-empty
