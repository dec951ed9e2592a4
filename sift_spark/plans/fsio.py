"""Small-file IO through the JVM Hadoop FileSystem API.

Sidecar artifacts (manifests, index metadata) must live NEXT TO their
parquet sinks on whatever filesystem the job writes -- local, HDFS or
s3a. Python's open() only reaches the local disk, and a Spark
text-write makes a DIRECTORY of part files where a loader expects one
real file; the Hadoop FileSystem client (already loaded in the
driver JVM, already holding the job's credentials/config) does exactly
this in one call. Driver-side only, and only for KB-scale metadata --
corpus data always goes through DataFrame writers.
"""

from __future__ import annotations


def _fs_and_path(spark, path):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def path_exists(spark, path):
    """True iff `path` exists on its filesystem (local/HDFS/s3a)."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def delete_path(spark, path):
    """Best-effort recursive delete; returns True iff the filesystem
    reported the delete done (False covers both 'did not exist' and
    'delete failed' -- callers that must distinguish should probe with
    path_exists first)."""
    import logging

    try:
        fs, jpath = _fs_and_path(spark, path)
        return bool(fs.delete(jpath, True))
    except Exception as exc:
        logging.getLogger(__name__).warning(
            "delete failed for %s: %s", path, exc
        )
        return False


def write_text_file(spark, path, text):
    """Write `text` as ONE real file at `path` (overwriting), on
    whatever filesystem the path names."""
    fs, jpath = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text_file(spark, path):
    """Read a small text file written by :func:`write_text_file`.
    The byte shuffling stays JVM-side (commons-io, on Spark's
    classpath): py4j passes arrays by value, so a Python-side
    stream.read(buf) loop would never see the bytes."""
    fs, jpath = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
