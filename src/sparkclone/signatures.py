"""Batched MinHash + SimHash signatures and LSH band hashes.

Replaces the reference's transformer-embedding retrieval
(``embedding/codebert_embedder.py``, ``index/brute_index.py``) with
sketches whose estimates converge to the exact token-set Jaccard the
reference's lexical score computes (``similarity/lexical.py:6-19``) —
so at oracle config (lexical_weight=1.0) our candidate generation targets
the *same* quantity the reference thresholds on.

Dataflow: token hashing happens JVM-side (``xxhash64`` inside a
higher-order ``transform`` — stays in whole-stage codegen); the numpy
kernel runs once per Arrow batch inside a pandas UDF and is fully
vectorized across the batch via ``np.minimum.reduceat`` /
``np.add.reduceat`` over the concatenated token-hash buffer (no per-row
Python loops over tokens).

At 100 TB scale this stage is embarrassingly parallel (narrow, per-row),
so it scales with input partitions; Arrow batch size bounds memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from sparkclone.config import SignatureConfig

_MERSENNE_61 = np.uint64((1 << 61) - 1)
_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
# Token-count chunking bound for the reduceat kernels. Small on purpose:
# at 128 perms the permuted intermediate is tokens*perms*4 bytes — 1 MiB
# at 2048 tokens, which stays in L2/L3 instead of streaming DRAM. Measured
# 2-3x faster than 64k chunks (the kernel is memory-bandwidth-bound).
_CHUNK_TOKENS = 2_048

SIG_FIELDS = StructType(
    [
        StructField("minhash", ArrayType(LongType())),
        StructField("simhash", LongType()),
        StructField("bands", ArrayType(LongType())),
    ]
)


def _perm_params(cfg: SignatureConfig) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-add permutation parameters seeded from
    config. Odd 32-bit multipliers over Z/2^32 (multiply-shift universal
    hashing: adequate pairwise independence for MinHash in practice).
    32-bit lanes are deliberate: SIMD does 8-wide 32-bit multiplies where
    64-bit is scalar — measured ~2.3x on this kernel — and a 32-bit
    minhash value space only collides distinct tokens within one set at
    ~|set|^2/2^33 odds (immaterial below ~10^4 tokens per snippet)."""
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, 1 << 31, size=cfg.num_perms, dtype=np.uint32) * np.uint32(2) + np.uint32(1)
    b = rng.integers(0, 1 << 31, size=cfg.num_perms, dtype=np.uint32)
    return a, b


def _fold32(token_hashes: np.ndarray) -> np.ndarray:
    """Fold 64-bit token hashes to well-mixed 32-bit lanes."""
    return ((token_hashes >> np.uint64(32)) ^ token_hashes).astype(np.uint32)


def minhash_matrix(token_hashes: np.ndarray, offsets: np.ndarray, cfg: SignatureConfig) -> np.ndarray:
    """MinHash signatures for a batch.

    token_hashes: concatenated uint64 token hashes of all rows.
    offsets: int64 array of row start indices (len = n_rows), rows are
    [offsets[i], offsets[i+1]) with an implicit end at len(token_hashes).
    Empty rows are not allowed (filter upstream).
    Returns (n_rows, num_perms) uint32.
    """
    a, b = _perm_params(cfg)
    n_rows = len(offsets)
    out = np.empty((n_rows, cfg.num_perms), dtype=np.uint32)
    bounds = np.append(offsets, len(token_hashes))
    folded = _fold32(token_hashes)
    # chunk by whole rows so reduceat groups stay intact
    row = 0
    while row < n_rows:
        end_row = row + 1
        while end_row < n_rows and bounds[end_row + 1] - bounds[row] <= _CHUNK_TOKENS:
            end_row += 1
        h = folded[bounds[row] : bounds[end_row]]
        # (T, P): permuted hashes, uint32 wraparound is mod 2^32
        permuted = h[:, None] * a[None, :] + b[None, :]
        local_off = (bounds[row:end_row] - bounds[row]).astype(np.int64)
        out[row:end_row] = np.minimum.reduceat(permuted, local_off, axis=0)
        row = end_row
    return out


def simhash_vector(token_hashes: np.ndarray, offsets: np.ndarray, bits: int = 64) -> np.ndarray:
    """64-bit SimHash per row: majority vote per bit position over the
    row's (unweighted, distinct) token hashes. Ties -> bit clear.
    Returns (n_rows,) uint64."""
    n_rows = len(offsets)
    shifts = np.arange(bits, dtype=np.uint64)
    out = np.zeros(n_rows, dtype=np.uint64)
    bounds = np.append(offsets, len(token_hashes))
    row = 0
    while row < n_rows:
        end_row = row + 1
        while end_row < n_rows and bounds[end_row + 1] - bounds[row] <= _CHUNK_TOKENS:
            end_row += 1
        h = token_hashes[bounds[row] : bounds[end_row]]
        bitmat = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        local_off = (bounds[row:end_row] - bounds[row]).astype(np.int64)
        counts = np.add.reduceat(bitmat, local_off, axis=0)  # (rows, bits)
        n_tok = np.diff(np.append(local_off, len(h)))[:, None]
        majority = (counts * 2 > n_tok).astype(np.uint64)
        out[row:end_row] = (majority << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        row = end_row
    return out


def band_hashes(minhash: np.ndarray, cfg: SignatureConfig) -> np.ndarray:
    """Fold each band's r minhash values into one 64-bit bucket key via an
    FNV-style mix. minhash: (n, num_perms) uint -> (n, bands) uint64."""
    n = minhash.shape[0]
    grouped = minhash.astype(np.uint64).reshape(n, cfg.bands, cfg.rows_per_band)
    acc = np.full((n, cfg.bands), _FNV_OFFSET, dtype=np.uint64)
    for j in range(cfg.rows_per_band):
        acc = (acc ^ grouped[:, :, j]) * _FNV_PRIME
    return acc


def token_hashes_col(tokens: Column) -> Column:
    """JVM-side 64-bit token hashing: xxhash64 applied inside a
    higher-order transform (stays in codegen; no Python)."""
    return F.transform(tokens, lambda t: F.xxhash64(t))


def with_signatures_md5_portable(df: DataFrame, cfg: SignatureConfig) -> DataFrame:
    """SQL-oracle-portable signature scheme — the JVM twin of the
    textops.py md5 sketches, applied to the pipeline's own stage shape.

    Requires ``norm_text`` (tokens are re-derived JVM-side; md5 needs the
    token STRINGS, which the fast path deliberately drops). Appends:
      minhash — sorted distinct token md5 digests, first 4 (KMV sketch,
                array<string>);
      bands   — ONE band: 16-hex prefix of the minimum token md5 (bucket
                sharing == sharing the min token digest — computable by
                DuckDB as substr(list_sort(list_transform(toks, md5))[1],
                1, 16));
      simhash — 16-bit md5 SimHash (majority vote over bits 0..15 of the
                first 4 hex chars of md5(token); ties -> clear), as a pure
                column expression (no shuffle, unlike textops.simhash16's
                explode/groupBy form — same value).
    ``norm_text`` is dropped from the output like the fast path drops it
    upstream. Every expression here is deterministic and mirrored verbatim
    in the clone_pipeline_portable_sizes oracle SQL."""
    from sparkclone.normalize import tokens_col

    if "norm_text" not in df.columns:
        raise ValueError(
            "md5_portable signature scheme needs the norm_text column "
            "(unsupported in the probe-incremental path)"
        )
    toks = tokens_col(F.col("norm_text"))
    md5s = F.array_sort(F.transform(toks, lambda t: F.md5(t)))
    vs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")
    )
    simhash: F.Column = F.lit(0).cast("long")
    for j in range(16):
        ones = F.size(
            F.filter(vs, lambda v: F.shiftright(v, j).bitwiseAND(F.lit(1)) == 1)
        )
        simhash = simhash + F.when(
            ones * 2 > F.size(vs), F.lit(1 << j)
        ).otherwise(F.lit(0))
    return (
        df.withColumn("minhash", F.slice(md5s, 1, 4))
        .withColumn("simhash", simhash)
        .withColumn(
            "bands", F.array(F.substring(F.try_element_at(md5s, F.lit(1)), 1, 16))
        )
        .drop("norm_text")
    )


def with_signatures(df: DataFrame, cfg: SignatureConfig, tokens_col_name: str = "token_hashes") -> DataFrame:
    """Append minhash / simhash / bands columns computed in one batched
    pandas UDF over the token-hash array column. Rows with empty token
    sets must be filtered upstream (they can never clear the lexical
    floor — reference lexical.py:9-10 scores them 0.0).

    ``cfg.scheme`` resolves through the signature_scheme registry
    (sparkclone.registry) — "md5_portable" dispatches to the SQL-portable
    JVM twin; custom schemes register under new names."""
    if cfg.scheme != "xxhash64":
        from sparkclone import registry

        return registry.get("signature_scheme", cfg.scheme)(df, cfg)

    @F.pandas_udf(SIG_FIELDS)
    def sig_udf(tokens_s: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in tokens_s:
            lens = series.map(len).to_numpy(dtype=np.int64)
            concat = np.concatenate([np.asarray(v, dtype=np.int64) for v in series.to_numpy()]) if len(series) else np.empty(0, dtype=np.int64)
            concat_u = concat.view(np.uint64) if concat.size else concat.astype(np.uint64)
            offsets = np.zeros(len(series), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:]) if len(series) > 1 else None
            if len(series) == 0:
                yield pd.DataFrame({"minhash": [], "simhash": [], "bands": []})
                continue
            mh = minhash_matrix(concat_u, offsets, cfg)
            sh = simhash_vector(concat_u, offsets, cfg.simhash_bits)
            bh = band_hashes(mh, cfg)
            yield pd.DataFrame(
                {
                    "minhash": list(mh.astype(np.int64)),
                    "simhash": sh.view(np.int64),
                    "bands": list(bh.view(np.int64)),
                }
            )

    return df.withColumn("sig", sig_udf(F.col(tokens_col_name))).select(
        "*", "sig.minhash", "sig.simhash", "sig.bands"
    ).drop("sig")


from sparkclone import registry as _registry  # noqa: E402

_registry.register("signature_scheme", "xxhash64", with_signatures)
_registry.register("signature_scheme", "md5_portable", with_signatures_md5_portable)
