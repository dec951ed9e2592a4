"""Relational chunk table: posexplode + column-math classification.

Produces the `chunks` intermediate table of SURVEY.md §1.2:
  url, chunk_idx, chunk_text, n_units, field_type, is_list,
  is_extraneous, score

Spark-first split of work:
  * the split cascade is inherently sequential per document -> one
    Arrow-batched pandas UDF returning ARRAY<STRING>, then a native
    posexplode (the UDTF-equivalent, SURVEY.md §2.11)
  * positional threshold = pure column arithmetic (classify.go:139-166)
  * field-type detection = native regexp predicates
    (regex_patterns.go:28-36) -- whole-stage codegen, no Python
  * stopword ratio needs the Porter2 stemmer -> pandas UDF
  * unit counting: native expressions for words/chars; UDF for tokens
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.chunker import split_text
from ..core.classify import stopword_ratio
from ..core.counters import CHARS, TOKENS, WORDS, Counter
from ..core.pipeline import SiftParams
from ..core.selection import BASE_SIZES, LARGE_TEXT_MULTIPLIER, TEXT_THRESHOLDS


def make_split_udf(params: SiftParams):
    """text -> array<string> chunk cascade with unit-aware sizing
    (chunk_selection.go:107-143)."""
    method = params.counting_method
    base = BASE_SIZES.get(method, BASE_SIZES[CHARS])
    threshold = TEXT_THRESHOLDS.get(method, TEXT_THRESHOLDS[CHARS])

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def split_batch(text: pd.Series) -> pd.Series:
        out = []
        for value in text:
            if value is None:
                out.append([])
                continue
            size = base
            if len(value.encode("utf-8", "surrogatepass")) > threshold:
                size = int(base * LARGE_TEXT_MULTIPLIER)
            out.append(split_text(value, size))
        return pd.Series(out)

    return split_batch


_CHUNK_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk_text", T.StringType()),
            T.StructField("ratio", T.DoubleType()),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )
)


def make_split_classify_udf(params: SiftParams):
    """Fused map-side pass: split cascade + stopword ratio per chunk in
    ONE Python stage (the positional threshold still needs n_chunks and
    is pure column math after the explode). Halves the Arrow round-trips
    of the chunk stage and keeps the expensive stemming before the
    shuffle."""
    method = params.counting_method
    base = BASE_SIZES.get(method, BASE_SIZES[CHARS])
    threshold = TEXT_THRESHOLDS.get(method, TEXT_THRESHOLDS[CHARS])

    @F.pandas_udf(_CHUNK_STRUCT)
    def split_classify_batch(text: pd.Series) -> pd.Series:
        out = []
        for value in text:
            if value is None:
                out.append([])
                continue
            size = base
            if len(value.encode("utf-8", "surrogatepass")) > threshold:
                size = int(base * LARGE_TEXT_MULTIPLIER)
            chunks = split_text(value, size)
            rows = []
            for chunk in chunks:
                ratio, n_tokens = stopword_ratio(chunk)
                rows.append(
                    {"chunk_text": chunk, "ratio": ratio,
                     "n_tokens": n_tokens}
                )
            out.append(rows)
        return pd.Series(out)

    return split_classify_batch


_RATIO_SCHEMA = T.StructType(
    [
        T.StructField("ratio", T.DoubleType()),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


@F.pandas_udf(_RATIO_SCHEMA)
def stopword_ratio_udf(text: pd.Series) -> pd.DataFrame:
    ratios, counts = [], []
    for value in text:
        ratio, n = stopword_ratio(value or "")
        ratios.append(ratio)
        counts.append(n)
    return pd.DataFrame({"ratio": ratios, "n_tokens": counts})


def unit_count_col(col, method):
    """n_units as a NATIVE expression where possible (stays in codegen)."""
    if method == WORDS:
        # strings.Fields semantics: split on any whitespace, drop empties
        # (Spark's trim strips only spaces, so filter instead)
        return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != ""))
    if method == CHARS:
        return F.length(col)

    # capture the vocab path DRIVER-side at plan build: worker daemons
    # never see env set after session start (counters.get_tokenizer)
    vocab_path = os.environ.get("SIFT_SPARK_CL100K_PATH")

    @F.pandas_udf(T.IntegerType())
    def token_count(text: pd.Series) -> pd.Series:
        counter = Counter(TOKENS, vocab_path)
        return text.map(lambda v: counter.count(v) if v else 0)

    return token_count(col)


def field_type_cols(col):
    """(field_type, is_list) as native regexp column expressions
    (context_calculator.go:159-230). Pattern precedence matters."""
    trimmed = F.trim(col)
    # tolerate leading TABS: Spark's trim strips spaces only, so the
    # extraction regex must skip residual whitespace exactly like the
    # match condition below -- otherwise '\t# Title' matched the header
    # branch but extracted level 0, emitting the invalid field 'h0'
    header_level = F.length(
        F.regexp_extract(trimmed, r"^\s*(#{1,6})\s+.*", 1)
    )
    field = (
        F.when(trimmed.rlike(r"^\s*#{1,6}\s+"),
               F.concat(F.lit("h"), F.least(header_level, F.lit(6)).cast("string")))
        .when(trimmed.rlike(r"^\s*[-*+]\s+"), F.lit("body"))
        .when(trimmed.rlike(r"^\s*\d+\.\s+"), F.lit("body"))
        .when(col.rlike(r"^```") | col.rlike(r"```$"), F.lit("code"))
        .when(col.rlike(r"`[^`]+`"), F.lit("code"))
        .when(col.rlike(r"\*\*[^*\s][^*]*[^*\s]\*\*|\*\*[^*\s]\*\*"), F.lit("bold"))
        .when(
            col.rlike(
                r"(^|[^*])\*[^*\s][^*]*[^*\s]\*([^*]|$)|(^|[^*])\*[^*\s]\*([^*]|$)"
            ),
            F.lit("italic"),
        )
        .otherwise(F.lit("body"))
    )
    is_list = trimmed.rlike(r"^\s*[-*+]\s+") | (
        trimmed.rlike(r"^\s*\d+\.\s+") & ~trimmed.rlike(r"^\s*#{1,6}\s+")
    )
    # a header line is never a list; guard the precedence explicitly
    is_list = F.when(trimmed.rlike(r"^\s*#{1,6}\s+"), F.lit(False)).otherwise(is_list)
    return field, is_list


def threshold_col(chunk_idx, n_chunks):
    """Position-adjusted threshold as pure column math
    (classify.go:139-166)."""
    rel = chunk_idx.cast("double") / (n_chunks - F.lit(1)).cast("double")
    factor = F.lit(1.0) - F.abs(F.lit(2.0) * rel - F.lit(1.0))
    interpolated = F.lit(0.1) + F.lit(0.23) * factor
    return (
        F.when(n_chunks <= 0, F.lit(0.33))
        .when((chunk_idx < 0) | (chunk_idx >= n_chunks), F.lit(0.33))
        .when(n_chunks <= 3, F.lit(0.5))
        .otherwise(interpolated)
    )


def chunk_pages(md_df, params: SiftParams | None = None, text_col="text_md"):
    """(url, text_md) -> chunks table with classification columns.

    One UDF projection (narrow), one posexplode (narrow), one window over
    url (the only shuffle -- and shuffle-free if the input is already
    partitioned by url, see plans/partitioning.py)."""
    params = params or SiftParams()
    split_udf = make_split_classify_udf(params)

    exploded = md_df.select(
        "url",
        F.posexplode(split_udf(F.col(text_col))).alias("chunk_idx", "c"),
    ).select(
        "url", "chunk_idx",
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.ratio").alias("stopword_ratio"),
        F.col("c.n_tokens").alias("_n_tokens"),
    )

    url_window = Window.partitionBy("url")
    with_counts = exploded.withColumn(
        "n_chunks", F.count("*").over(url_window).cast("int")
    )

    field, is_list = field_type_cols(F.col("chunk_text"))
    thr = threshold_col(F.col("chunk_idx"), F.col("n_chunks"))

    return (
        with_counts.withColumn("n_units",
                               unit_count_col(F.col("chunk_text"),
                                              params.counting_method).cast("int"))
        .withColumn("field_type", field)
        .withColumn("is_list", is_list)
        .withColumn(
            "is_extraneous",
            F.when(F.col("_n_tokens") == 0, F.lit(True)).otherwise(
                F.col("stopword_ratio") > thr
            ),
        )
        .drop("_n_tokens")
    )


def filter_extraneous(chunks_df):
    """classifier filter application site (sift.go:199-210)."""
    return chunks_df.filter(~F.col("is_extraneous"))
