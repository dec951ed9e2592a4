"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The GPT-3 appendix-C / PaLM approach: a training document is
contaminated if any of its word n-grams (n≈8-13) also occurs in a
benchmark document. At 100 TB the benchmark gram set is tiny relative
to the corpus (thousands of eval documents -> a few million distinct
grams), so the plan is

    corpus:     narrow split -> n-gram explode (no shuffle)
    benchmark:  same explode -> distinct -> BROADCAST
    match:      broadcast semi-ish inner join on the gram
                -> groupBy(doc_id) count  (the ONLY corpus shuffle,
                   and only over the matching rows)

i.e. the full corpus is never shuffled -- only colliding grams reach
the aggregation. Tokenization matches word_ngrams in operators/dedup.py
(lowercase, explicit [ \\t\\r\\n\\f] whitespace class for Java/RE2
agreement).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _word_grams(df, n, id_col, text_col):
    """(_id, gram) DISTINCT word n-grams per document, delegating to
    dedup.word_ngrams (ONE tokenization implementation to keep in sync
    with the Java/RE2-bivalent whitespace class) with skip_short=True:
    documents shorter than n words produce no grams -- a partial gram
    must never collide with a benchmark n-gram."""
    from .dedup import word_ngrams

    return word_ngrams(
        df.filter(F.col(text_col).isNotNull()), n,
        id_col=id_col, text_col=text_col, skip_short=True,
    ).select(F.col(id_col).alias("_id"), F.col("ngram").alias("gram"))


def ngram_decontaminate(corpus_df, benchmark_df, n=13,
                        id_col="doc_id", text_col="text",
                        bench_id_col=None, bench_text_col=None):
    """(doc_id, n_matched_grams, n_grams, contamination) for every
    corpus document sharing at least one word n-gram with the benchmark
    set; contamination = matched/total grams rounded to 6 places. Docs
    with zero collisions are absent (anti-join them downstream to KEEP
    the clean set without materializing it here)."""
    bench_grams = (
        _word_grams(
            benchmark_df, n, bench_id_col or id_col,
            bench_text_col or text_col,
        )
        .select("gram")
        .distinct()
    )
    corpus_grams = _word_grams(corpus_df, n, id_col, text_col)
    totals = corpus_grams.groupBy("_id").agg(
        F.count("*").alias("n_grams")
    )
    matched = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("_id")
        .agg(F.count("*").alias("n_matched_grams"))
    )
    return (
        matched.join(totals, "_id")
        .select(
            F.col("_id").alias(id_col),
            "n_matched_grams",
            "n_grams",
            F.round(
                F.col("n_matched_grams") / F.col("n_grams"), 6
            ).alias("contamination"),
        )
    )


def remove_contaminated(corpus_df, benchmark_df, n=13, min_matched=1,
                        id_col="doc_id", text_col="text", **kwargs):
    """The filter form: corpus minus documents with >= min_matched
    benchmark gram collisions (left_anti join on the flagged ids)."""
    flagged = ngram_decontaminate(
        corpus_df, benchmark_df, n=n, id_col=id_col, text_col=text_col,
        **kwargs,
    ).filter(F.col("n_matched_grams") >= min_matched)
    return corpus_df.join(
        flagged.select(id_col), id_col, "left_anti"
    )
