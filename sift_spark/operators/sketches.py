"""Cardinality sketching for corpus statistics at crawl scale.

K-Minimum-Values (Bar-Yossef et al., RANDOM'02 "Counting distinct
elements in a data stream"): hash every value into [0, 1); the k-th
smallest distinct hash h_(k) estimates the cardinality as (k-1) / h_(k).
Memory is O(k) per partition regardless of input size, and sketches
merge by keeping the k smallest of a union -- the properties that make
it usable where an exact COUNT(DISTINCT) shuffle of the full key set is
not (e.g. distinct shingles over 100 TB).

Deterministic: the hash is the md5 prefix (no seed-dependent xxhash), so
the k minima -- and therefore the ESTIMATE itself -- are bit-identical
in any engine; the driver gate hash-checks it against DuckDB.

Plan shape: mapPartitions keeps the k smallest distinct hashes per
partition with a bounded heap (k rows out per partition -- this is the
legitimate per-partition-imperative case), then one tiny global merge of
k * n_partitions rows.
"""

from __future__ import annotations

import heapq

from pyspark.sql import functions as F
from pyspark.sql import types as T

_HASH_SPACE = float(1 << 60)  # md5 prefix: 15 hex chars = 60 bits


def kmv_hash_col(col):
    """Value -> integer hash in [0, 2^60): the SAME engine-portable md5
    prefix the oracle-checked minhash twin uses (single source)."""
    from .dedup import md5_hash60

    return md5_hash60(col.cast("string"))


def _partition_minima(k):
    def keep_k(iterator):
        heap = []  # max-heap via negation; holds the k smallest distinct
        members = set()
        for row in iterator:
            h = row[0]
            if h is None or h in members:
                continue
            if len(heap) < k:
                heapq.heappush(heap, -h)
                members.add(h)
            elif h < -heap[0]:
                members.discard(-heapq.heappushpop(heap, -h))
                members.add(h)
        for h in members:
            yield (h,)

    return keep_k


def kmv_distinct_estimate(df, col, k=256):
    """One-row DataFrame (k_used, kth_hash, distinct_estimate) for the
    distinct cardinality of `col`. If fewer than k distinct values
    exist, the count is exact (the sketch degenerates to the truth)."""
    hashes = df.select(kmv_hash_col(F.col(col)).alias("h"))
    minima = hashes.rdd.mapPartitions(_partition_minima(k)).toDF(
        T.StructType([T.StructField("h", T.LongType())])
    )
    merged = (
        minima.distinct().orderBy("h").limit(k)
        .agg(
            F.count("*").alias("k_used"),
            F.max("h").alias("kth_hash"),
        )
    )
    return merged.select(
        "k_used",
        "kth_hash",
        F.round(
            F.when(
                F.col("k_used") < k, F.col("k_used").cast("double")
            ).otherwise(
                (F.lit(float(k - 1)) / (F.col("kth_hash") / F.lit(_HASH_SPACE)))
            ),
            4,
        ).alias("distinct_estimate"),
    )
