#!/usr/bin/env python
"""Sustained full-job run with injected size skew.

Evidence for the 100 TB story beyond micro-benches: a larger deterministic
corpus (default 50k pages, ~1 GB HTML) with a handful of pathological fat
pages (100x the median size, same host), pushed through the COMPLETE job
path -- distributed generation -> salted url-hash partitioning -> lineage
resume filter -> extraction UDF -> partitioned parquet + lineage commit --
and verified: row counts, zero unexpected errors, fat pages extracted not
dropped, lineage totals consistent. Appends results to BENCH/BASELINE.md.

    python scripts/sustained.py [--n-pages 50000] [--fat 16] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-pages", type=int, default=50000)
    parser.add_argument("--fat", type=int, default=16)
    parser.add_argument("--cores", type=int, default=32)
    parser.add_argument("--out", default="/tmp/sift_sustained")
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from sift_spark.core.counters import WORDS
    from sift_spark.core.pipeline import SiftParams
    from sift_spark.job import run_extraction_job
    from sift_spark.plans import lineage
    from sift_spark.session import get_spark
    from sift_spark.sources.fixtures import build_big_pages_df

    shutil.rmtree(args.out, ignore_errors=True)
    spark = get_spark(app_name="sustained", cores=args.cores,
                      shuffle_partitions=args.cores,
                      extra_conf={"spark.python.worker.reuse": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    normal = build_big_pages_df(spark, args.n_pages,
                                n_partitions=args.cores * 4)
    # fat pages: same deterministic generator, 100x sections, one host
    fat = build_big_pages_df(spark, args.fat, n_partitions=args.fat,
                             section_scale=100).withColumn(
        "url", F.concat(F.lit("https://fat.example/"),
                        F.monotonically_increasing_id().cast("string"))
    )
    pages = normal.unionByName(fat)

    stats = pages.agg(F.count("*"), F.sum(F.length("html"))).first()
    n_docs, html_bytes = stats[0], stats[1]

    params = SiftParams(counting_method=WORDS, max_units=200)
    start = time.perf_counter()
    run_extraction_job(spark, pages, args.out, params,
                       n_parts=args.cores * 4)
    elapsed = time.perf_counter() - start

    extracted = lineage.read_extracted(spark, args.out)
    checks = extracted.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
            "n_err"),
        F.sum(F.when(F.col("url").startswith("https://fat.example/")
                     & F.col("error").isNull(), 1).otherwise(0)).alias(
            "fat_ok"),
    ).first()
    lin = lineage.read_lineage(spark, args.out).agg(
        F.sum("n_docs"), F.count("*")).first()

    result = {
        "n_docs": n_docs,
        "html_mb": round((html_bytes or 0) / 1e6, 1),
        "wall_sec": round(elapsed, 1),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "mb_per_sec": round((html_bytes or 0) / 1e6 / elapsed, 2),
        "rows_out": checks["n"],
        "errors": checks["n_err"],
        "fat_pages_ok": checks["fat_ok"],
        "lineage_docs": lin[0],
        "lineage_parts": lin[1],
        "cores": args.cores,
    }
    ok = (checks["n"] == n_docs and checks["n_err"] == 0
          and checks["fat_ok"] == args.fat and lin[0] == n_docs)
    result["all_checks"] = "PASS" if ok else "FAIL"

    section = f"""

## Sustained full-job run (generation -> salted partitioning -> lineage commit)

{result['n_docs']} pages ({result['html_mb']} MB HTML; {args.fat} of them
pathological 100x-size pages on one host, exercising fat-row salting) in
{result['wall_sec']} s at local[{args.cores}]: **{result['docs_per_sec']}
docs/s, {result['mb_per_sec']} MB/s HTML-in** through the COMPLETE job
(write + lineage included). Verification: {result['rows_out']} rows out,
{result['errors']} errors, all {args.fat} fat pages extracted, lineage
totals consistent over {result['lineage_parts']} parts --
**{result['all_checks']}**.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(section)
    print(json.dumps(result))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
