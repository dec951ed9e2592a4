"""Site-level template (boilerplate) detection across documents.

Single-page readability catches per-page chrome; the cross-document
signal -- a chunk that appears on MOST of a site's pages is template,
not content -- needs corpus-level aggregation, which is exactly what a
Spark job adds over the reference's one-document-at-a-time pipeline
(standard technique in web-corpus cleaning, e.g. Pomikalek's justext
thesis 2011 / CommonCrawl-derived corpora).

Scale shape: both aggregations and the join are keyed by site (host),
so the whole operator is ONE shuffle family on the site key; chunk
identity travels as a 16-byte md5, never the text.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def site_boilerplate_chunks(chunks_df, site_col="site", doc_col="doc_id",
                            chunk_col="chunk_text", min_ratio=0.5,
                            min_docs=3):
    """(site, chunk_hash, n_docs, site_docs, ratio) for chunks present in
    >= min_ratio of a site's documents (sites with < min_docs pages are
    skipped: no statistical basis)."""
    per_site = chunks_df.groupBy(site_col).agg(
        F.count_distinct(F.col(doc_col)).alias("site_docs")
    )
    freq = chunks_df.groupBy(
        site_col, F.md5(F.col(chunk_col)).alias("chunk_hash")
    ).agg(F.count_distinct(F.col(doc_col)).alias("n_docs"))
    return (
        freq.join(per_site, site_col)
        .withColumn(
            "ratio",
            F.round(F.col("n_docs") / F.col("site_docs"), 6),
        )
        .filter(
            (F.col("site_docs") >= min_docs)
            & (F.col("ratio") >= min_ratio)
        )
    )


def drop_site_boilerplate(chunks_df, boiler_df, site_col="site",
                          chunk_col="chunk_text"):
    """Remove detected template chunks: anti-join on (site, chunk_hash)."""
    keyed = chunks_df.withColumn(
        "chunk_hash", F.md5(F.col(chunk_col))
    )
    return keyed.join(
        boiler_df.select(site_col, "chunk_hash"),
        [site_col, "chunk_hash"],
        "left_anti",
    ).drop("chunk_hash")
