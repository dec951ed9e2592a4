#!/usr/bin/env python
"""spark-submit launcher for the extraction job:

    spark-submit --master ... --py-files dist/sift_spark.zip submit_job.py \
        --input pages.parquet --output out/ --n-parts 256 [...]

(spark-submit executes the primary file as a script, so the package
entrypoint lives behind this shim; the zip ships the package to driver
and executors.)
"""

from sift_spark.job import main

if __name__ == "__main__":
    main()
