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


def temperature_sampling_rates(df, stratum_col, alpha=0.5):
    """Per-stratum keep rates realizing TEMPERATURE SAMPLING by
    deterministic downsampling: with stratum shares p_i, the target
    distribution is q_i ~ p_i^alpha (Lample & Conneau, XLM, arXiv
    1901.07291 sec. 3.1; the multilingual/source rebalancing used by
    XLM-R- and GPT-3-style corpus mixes). Realized without upsampling:
    keep rate r_i ~ q_i / p_i = p_i^(alpha-1), normalized so the
    smallest stratum keeps everything (max rate 1.0). alpha=1 keeps the
    natural distribution; alpha=0 equalizes strata; alpha in between
    flattens head strata while keeping tails intact.

    The groupBy-count collect is one tiny driver-side list (one row per
    stratum -- same bounded-list pattern as the skewed-host pre-pass).
    For alpha=0.5 the rate expression uses only correctly-rounded IEEE
    ops (sqrt, divide), so a SQL oracle mirroring the same expression
    sequence reproduces the thresholds bit-for-bit; other alphas go
    through pow (still deterministic in-engine, just not proven
    cross-engine-exact)."""
    import math

    counts = {
        row[0]: row[1]
        for row in df.groupBy(stratum_col).count().collect()
        if row[0] is not None
    }
    if not counts:
        return {}
    if alpha == 0.5:
        weights = {k: 1.0 / math.sqrt(float(n)) for k, n in counts.items()}
    else:
        weights = {k: float(n) ** (alpha - 1.0) for k, n in counts.items()}
    wmax = max(weights.values())
    return {k: w / wmax for k, w in weights.items()}


def temperature_resample(df, stratum_col, key_col, alpha=0.5, seed=0,
                         default_rate=0.0):
    """Temperature-rebalanced corpus: hash-threshold sampling with the
    rates from :func:`temperature_sampling_rates`. Deterministic,
    partition-layout invariant, append-stable -- the mixing step between
    per-source curation and packing.

    Thresholds are applied through a BROADCAST JOIN of a per-stratum
    rates table, not stratified_hash_sample's nested CASE WHEN chain:
    the stratum here can be high-cardinality (a url_host column has
    ~100k values on a crawl), and a 100k-deep when/otherwise tree blows
    up Catalyst analysis, while a broadcast of 100k tiny rows is flat.
    Thresholds use the same int(rate * 2^32) truncation as
    stratified_hash_sample, so membership matches it exactly.

    `default_rate` governs rows whose stratum has NO derived rate -- a
    null stratum, or a value unseen when rates were derived (appended
    rows): 0.0 (default) drops them, matching stratified_hash_sample's
    default_rate; 1.0 keeps them all; in between hash-samples them at
    that rate (ADVICE r5: the drop must be a documented choice, not a
    silent side effect of an inner join)."""
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(
            f"default_rate must be in [0, 1], got {default_rate}")
    rates = temperature_sampling_rates(df, stratum_col, alpha)
    spark = df.sparkSession
    default_threshold = int(default_rate * _BUCKETS)
    if not rates:
        return df.filter(
            sample_bucket_col(key_col, seed) < F.lit(default_threshold)
        )
    rates_df = spark.createDataFrame(
        [(value, int(rate * _BUCKETS)) for value, rate in rates.items()],
        ["_stratum", "_threshold"],
    )
    # qualified references + select(df["*"]) keep the caller's schema
    # exact even when df itself has a _stratum/_threshold column -- no
    # reserved names, no blind drop; LEFT join so no-rate rows reach
    # the default threshold instead of vanishing
    joined = df.join(
        F.broadcast(rates_df),
        df[stratum_col] == rates_df["_stratum"], "left",
    )
    return joined.filter(
        sample_bucket_col(key_col, seed)
        < F.coalesce(rates_df["_threshold"], F.lit(default_threshold))
    ).select(df["*"])
