"""Structured Streaming wiring smoke: availableNow batch-over-stream."""

from pyspark.sql import functions as F

from sift_spark.core.counters import WORDS
from sift_spark.core.pipeline import SiftParams
from sift_spark.sources.fixtures import build_pages_df
from sift_spark.streaming.incremental import stream_extract


def test_stream_extract_available_now(spark, tmp_path):
    input_dir = str(tmp_path / "pages_in")
    output_dir = str(tmp_path / "pages_out")
    checkpoint = str(tmp_path / "ckpt")

    build_pages_df(spark, n_big=6, include_fixtures=False).write.parquet(
        input_dir
    )
    query = stream_extract(
        spark, input_dir, output_dir, checkpoint,
        SiftParams(counting_method=WORDS, max_units=100),
    )
    query.awaitTermination(120)
    query.stop()

    out = spark.read.parquet(output_dir)
    assert out.count() == 6
    assert out.filter(F.col("error").isNull()).count() == 6
