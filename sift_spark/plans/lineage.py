"""Per-partition lineage, metrics, and idempotent resume.

North-rule requirement: "checkpoints per-partition lineage/metrics so any
partition can resume idempotently."

Mechanism (batch, not Structured Streaming -- the reference has no
streaming and resumability is a table property, SURVEY.md §2.11):

  * work unit = logical part_id (plans/partitioning.py), stable across
    runs and cluster sizes
  * output written parquet partitioned by part_id with DYNAMIC partition
    overwrite -> re-running a part atomically replaces its files
  * a lineage table (one row per completed part) records
    (part_id, n_docs, n_errors, bytes_in, bytes_out, run_id, status);
    a part counts as completed only once its lineage row is committed,
    and the lineage append happens AFTER the data write -> crash between
    the two reprocesses the part (idempotent because overwrite)
  * resume = left_anti join of pending part ids against completed lineage
    (SURVEY.md §2.4): only missing parts are scanned thanks to partition
    pruning on part_id

On Iceberg the same design uses snapshot commits for atomicity; the
lineage table maps to a metadata table. The parquet layout here keeps the
identical schema and commit ordering.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("bytes_out", T.LongType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


def lineage_path(output_dir):
    return os.path.join(output_dir, "_lineage")


def data_path(output_dir):
    return os.path.join(output_dir, "extracted")


def completed_parts(spark, output_dir):
    """Part ids with committed lineage rows."""
    path = lineage_path(output_dir)
    try:
        lineage = spark.read.parquet(path)
    except Exception:
        return None  # no lineage yet
    return lineage.filter(F.col("status") == "ok").select("part_id").distinct()


def pending_pages(spark, pages_with_part_id, output_dir):
    """Filter the input to parts not yet completed (anti-join resume)."""
    done = completed_parts(spark, output_dir)
    if done is None:
        return pages_with_part_id
    return pages_with_part_id.join(done, "part_id", "left_anti")


def commit(spark, extracted_df, bytes_in_df, output_dir, run_id):
    """Write data (dynamic partition overwrite by part_id), then commit
    lineage rows for the parts just written.

    extracted_df: url, text, n_chunks, n_units, error, part_id
    bytes_in_df:  part_id, bytes_in (pre-aggregated from the input scan)
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        extracted_df.write.mode("overwrite")
        .partitionBy("part_id")
        .parquet(data_path(output_dir))
    )

    # metrics come from the JUST-WRITTEN parquet, not from extracted_df:
    # aggregating the un-persisted plan would re-run the entire upstream
    # extraction UDF a second time (doubling the job at crawl scale).
    # bytes_in_df (one row per pending part, no UDF in its lineage)
    # doubles as the this-run part list so previously-completed parts in
    # the output directory are excluded.
    bytes_in_df = bytes_in_df.persist()  # scanned for parts AND bytes
    if bytes_in_df.limit(1).count() == 0:
        # nothing pending (fully-resumed run or empty input): the data
        # write above produced no part files, so reading it back for
        # metrics would fail schema inference -- commit an empty lineage
        # append (creates the path on a first run) and return no rows
        empty = spark.createDataFrame([], LINEAGE_SCHEMA)
        empty.write.mode("append").parquet(lineage_path(output_dir))
        bytes_in_df.unpersist()
        return spark.read.parquet(lineage_path(output_dir)).filter(
            F.col("run_id") == run_id
        )
    this_run_parts = bytes_in_df.select("part_id")
    written = (
        spark.read.parquet(data_path(output_dir))
        .withColumn("part_id", F.col("part_id").cast("int"))
        .join(this_run_parts, "part_id")
    )
    metrics = (
        written.groupBy("part_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_errors"
            ),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
                "bytes_out"
            ),
        )
        .join(bytes_in_df, "part_id", "left")
        .select(
            F.col("part_id").cast("int"),
            "n_docs",
            "n_errors",
            F.coalesce(F.col("bytes_in"), F.lit(0)).alias("bytes_in"),
            "bytes_out",
            F.lit(run_id).alias("run_id"),
            F.lit("ok").alias("status"),
        )
    )
    metrics.write.mode("append").parquet(lineage_path(output_dir))
    bytes_in_df.unpersist()
    # return the COMMITTED rows, not the lazy metrics plan: re-collecting
    # that plan after the commit would re-resolve `pending` against the
    # now-updated lineage (empty) and yield nothing
    return spark.read.parquet(lineage_path(output_dir)).filter(
        F.col("run_id") == run_id
    )


def read_extracted(spark, output_dir):
    return spark.read.parquet(data_path(output_dir))


def read_lineage(spark, output_dir):
    return spark.read.parquet(lineage_path(output_dir))
