"""Structured Streaming wiring for continuous page ingestion.

The extraction UDF is stateless per row, so the streaming plan is the
batch plan with readStream/writeStream endpoints; exactly-once comes from
the sink checkpoint. No watermark is needed (no event-time aggregation in
the pipeline); late pages are simply processed when they arrive.
"""

from __future__ import annotations

from ..core.pipeline import SiftParams
from ..operators.extract import extract_pages
from ..sources.fixtures import PAGES_SCHEMA


def stream_extract(spark, input_path, output_path, checkpoint_path,
                   params: SiftParams | None = None, file_format="parquet"):
    """readStream(pages parquet dir) -> extraction UDF -> writeStream.

    Returns the StreamingQuery; caller owns awaitTermination/stop."""
    params = params or SiftParams()
    pages = (
        spark.readStream.format(file_format)
        .schema(PAGES_SCHEMA)
        .load(input_path)
    )
    extracted = extract_pages(pages, params)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_exact_dedup(spark, input_path, output_path, checkpoint_path,
                       watermark="1 hour", id_col="url",
                       file_format="parquet"):
    """Streaming exact dedup over a continuous crawl: md5 content hash +
    dropDuplicatesWithinWatermark keeps ONE row per content hash among
    pages whose event times fall within the watermark horizon.

    State stays bounded: the watermark evicts hash state older than the
    horizon, so a 10^12-page stream holds state proportional to the
    horizon's page rate, not history. (The batch engine's exact dedup --
    operators/dedup.exact_duplicates -- is the full-history form; run it
    periodically for cross-horizon collapse.)"""
    from pyspark.sql import functions as F

    from ..operators.dedup import normalized_text_col
    from ..sources.fixtures import PAGES_SCHEMA

    pages = (
        spark.readStream.format(file_format)
        .schema(PAGES_SCHEMA)
        .load(input_path)
    )
    hashed = pages.withColumn(
        "content_hash",
        F.md5(normalized_text_col(F.decode(F.col("html"), "utf-8"))),
    )
    deduped = (
        hashed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    return (
        deduped.select(id_col, "warc_ts", "content_hash")
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_host_rates(spark, input_path, output_path, checkpoint_path,
                      window="5 minutes", watermark="10 minutes",
                      file_format="parquet"):
    """Event-time windowed crawl-rate per host with late-data handling:
    watermarked tumbling-window counts, append mode (a window emits once
    its watermark passes -- the standard streaming-agg shape for crawl
    monitoring)."""
    from pyspark.sql import functions as F

    from ..sources.fixtures import PAGES_SCHEMA

    pages = (
        spark.readStream.format(file_format)
        .schema(PAGES_SCHEMA)
        .load(input_path)
    )
    host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    counts = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"),
                 host.alias("host"))
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.length("html")).alias("bytes_in"))
    )
    return (
        counts.select(F.col("win.start").alias("win_start"),
                      F.col("win.end").alias("win_end"),
                      "host", "n_pages", "bytes_in")
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
