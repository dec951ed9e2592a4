#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north_rule proxy).

No real cluster exists in this sandbox, so the N vs 4N executor
requirement is evidenced by running the IDENTICAL job on the IDENTICAL
input at local[N] and local[4N] in separate JVMs (fresh subprocess each,
so no warm-JVM bias inside a run) and reporting

    efficiency = throughput(4N) / (4 * throughput(N))

plus a byte-identity check of the extracted output across the two runs.
Writes BENCH/BASELINE.md. Usage:

    python scripts/scaling.py [--n 8] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sift_spark.session import get_spark
from sift_spark.core.counters import WORDS
from sift_spark.core.pipeline import SiftParams
from sift_spark.operators.extract import extract_pages
from sift_spark.sources.fixtures import pages_from_documents

cores = {cores}
spark = get_spark(app_name="scaling-%d" % cores, cores=cores,
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = pages_from_documents(spark, {sf_dir!r}, n_partitions=cores * 2).cache()
stats = pages.agg(F.count("*"), F.sum(F.length("html"))).first()
n_docs, html_bytes = stats[0], stats[1]

params = SiftParams(counting_method=WORDS, max_units=200)
# warmup (JIT + python worker pool), then timed run
extract_pages(pages, params).count()
start = time.perf_counter()
out = extract_pages(pages, params)
rows = out.select("url", "text", "error").collect()
elapsed = time.perf_counter() - start

digest = hashlib.sha256()
for row in sorted(rows, key=lambda r: r["url"]):
    digest.update((row["url"] or "").encode())
    digest.update((row["text"] or "").encode())
    digest.update((row["error"] or "").encode())

print("RESULT " + json.dumps({{
    "cores": cores, "sec": elapsed, "n_docs": n_docs,
    "html_mb": (html_bytes or 0) / 1e6,
    "docs_per_sec": n_docs / elapsed,
    "mb_per_sec": (html_bytes or 0) / 1e6 / elapsed,
    "sha256": digest.hexdigest(),
}}))
spark.stop()
"""


def run_at(cores, sf_dir):
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, sf_dir=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"run at local[{cores}] produced no result:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=8)
    parser.add_argument("--sf-dir",
                        default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                               "/root/testdata/sf0.1"))
    args = parser.parse_args(argv)

    small = run_at(args.n, args.sf_dir)
    large = run_at(args.n * 4, args.sf_dir)

    efficiency = large["docs_per_sec"] / (4 * small["docs_per_sec"])
    identical = small["sha256"] == large["sha256"]

    report = f"""# BENCH/BASELINE — measured extraction throughput + scaling

Input: deterministic pages table derived from `{args.sf_dir}` documents
({small['n_docs']} docs, {small['html_mb']:.2f} MB HTML). Job: full sift
extraction pipeline (readability UDF + word-budget 200), identical code
and input at both parallelism levels; fresh JVM per run; one warmup pass
before timing (measures steady-state throughput, not JIT).

| parallelism | wall sec | docs/sec | MB/sec HTML-in |
|---|---|---|---|
| local[{args.n}]  | {small['sec']:.2f} | {small['docs_per_sec']:.1f} | {small['mb_per_sec']:.2f} |
| local[{args.n * 4}] | {large['sec']:.2f} | {large['docs_per_sec']:.1f} | {large['mb_per_sec']:.2f} |

**Scaling efficiency (N -> 4N): {efficiency:.3f}** (target >= 0.8,
BASELINE.json north_rule; sandbox proxy for N vs 4N executors — no real
cluster available, same `spark-submit`-able job at two `local[k]` levels).

**Output byte-identity across parallelism levels: {"PASS" if identical else "FAIL"}**
(sha256 over url+text+error sorted by url:
`{small['sha256'][:16]}…` vs `{large['sha256'][:16]}…`).

Reference baseline: the reference publishes no throughput numbers
(BASELINE.md); these are the engine's first measured numbers.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write(report)
    print(json.dumps({
        "n": args.n, "sec_n": round(small["sec"], 2),
        "sec_4n": round(large["sec"], 2),
        "docs_per_sec_n": round(small["docs_per_sec"], 1),
        "docs_per_sec_4n": round(large["docs_per_sec"], 1),
        "efficiency": round(efficiency, 3),
        "byte_identical": identical,
        "report": path,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
