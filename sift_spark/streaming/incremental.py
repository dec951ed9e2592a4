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
