"""Deterministic, reproducible corpus sampling.

`df.sample()` is partition-layout dependent: the same fraction re-drawn
after a repartition (or on a different cluster size) selects DIFFERENT
rows, which breaks experiment reproducibility and resume. Training-data
pipelines sample by KEY HASH instead: a row is in the sample iff
h(key, seed) < rate * 2^32, so membership is a pure function of the row
-- stable across runs, partitionings, engines, and appends (new rows
join the sample at the same rate without disturbing old members).

The hash is the engine-portable md5 prefix (same construction as the
oracle-checked minhash twin), so a DuckDB/SQL oracle reproduces the
exact membership set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def sample_bucket_col(key_col, seed=0):
    """Uniform [0, 2^32) bucket from md5(key ':' seed): the first 8 hex
    chars parsed as an integer (native conv -- no UDF)."""
    digest = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))
    )
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")


def hash_sample(df, rate, key_col, seed=0):
    """Keep rows with bucket < rate * 2^32 (deterministic membership)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _BUCKETS)
    return df.filter(sample_bucket_col(key_col, seed) < threshold)


def stratified_hash_sample(df, rates, stratum_col, key_col,
                           default_rate=0.0, seed=0):
    """Per-stratum deterministic rates -- the standard corpus-mixing
    primitive (e.g. keep 100% of high-quality English, 10% of the rest).
    rates: {stratum_value: rate}; strata not listed get default_rate."""
    threshold = F.lit(int(default_rate * _BUCKETS))
    for value, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0, 1]")
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(sample_bucket_col(key_col, seed) < threshold)
