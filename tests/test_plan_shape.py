"""Physical-plan regression tests: the scale properties we rely on are
asserted, not assumed (SURVEY.md §4). A refactor that silently adds a
shuffle or drops pushdown fails here, not at 100 TB."""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from sift_spark.core.counters import WORDS
from sift_spark.core.pipeline import SiftParams
from sift_spark.operators.extract import extract_pages
from sift_spark.sources.fixtures import build_pages_df


def plan_of(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_nodes(plan, node_name):
    """Count physical nodes by their detail headers ('(N) NodeName');
    the tree section prints each node a second time."""
    return len(re.findall(rf"^\(\d+\) {node_name}\b", plan, re.M))


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pages")
    build_pages_df(spark, n_big=4).write.parquet(path)
    return spark.read.parquet(path)


def test_extraction_is_shuffle_free(spark, pages_parquet):
    params = SiftParams(counting_method=WORDS, max_units=50)
    plan = plan_of(extract_pages(pages_parquet, params))
    assert count_nodes(plan, "Exchange") == 0, (
        "extraction must stay a narrow pipeline"
    )


def test_filter_pushdown_reaches_scan(spark, pages_parquet):
    params = SiftParams(counting_method=WORDS, max_units=50)
    plan = plan_of(
        extract_pages(pages_parquet.filter(F.col("lang") == "en"), params)
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_column_pruning_drops_unused_columns(spark, pages_parquet):
    params = SiftParams(counting_method=WORDS, max_units=50)
    plan = plan_of(extract_pages(pages_parquet, params))
    # the scan must read only url + html: warc_ts / text / lang pruned
    assert "ReadSchema: struct<url:string,html:binary>" in plan


def test_chunk_pipeline_single_shuffle(spark):
    from sift_spark.operators.chunking import chunk_pages

    md = spark.createDataFrame(
        [("u", "text " * 300)], ["url", "text_md"]
    )
    plan = plan_of(chunk_pages(md, SiftParams(counting_method=WORDS)))
    # exactly one Exchange: the url window (classification is column math)
    assert count_nodes(plan, "Exchange") == 1


def test_bm25_no_joins(spark):
    from sift_spark.operators.search import bm25_scores

    chunks = spark.createDataFrame(
        [("u", 0, "spark streams data"), ("u", 1, "other words")],
        ["url", "chunk_idx", "chunk_text"],
    )
    plan = plan_of(bm25_scores(chunks, "spark data"))
    # pivoted single-pass scoring: one join only (zero-term chunk restore)
    joins = count_nodes(plan, "SortMergeJoin") + count_nodes(
        plan, "BroadcastHashJoin"
    )
    assert joins <= 1


def test_broadcast_in_tfidf(spark):
    from sift_spark.operators.search import tfidf_scores

    chunks = spark.createDataFrame(
        [("u", 0, "spark streams data"), ("u", 1, "other words")],
        ["url", "chunk_idx", "chunk_text"],
    )
    plan = plan_of(tfidf_scores(chunks, "spark data"))
    assert "BroadcastHashJoin" in plan  # corpus sizes broadcast, never SMJ


def test_topk_is_take_ordered(spark):
    from sift_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    plan = plan_of(cosine_topk(emb, [1.0, 0.0], k=5))
    # per-partition top-k + driver merge, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_neardup_pipelines_avoid_cartesian_products(spark):
    """Every near-dup pair generator must join on a blocking/bucket key;
    a CartesianProduct or BroadcastNestedLoopJoin in the plan means the
    O(n^2) form leaked in and the operator dies at crawl scale."""
    from sift_spark.operators.dedup import (
        minhash_near_duplicates,
        simhash_pairs_from_hashes,
    )
    from sift_spark.operators.similarity import embedding_near_duplicates

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    hashed = spark.createDataFrame(
        [(1, 12345), (2, 12349)], "doc_id long, simhash long"
    )
    plans = {
        "minhash": plan_of(minhash_near_duplicates(docs, n_hashes=16,
                                                   n_bands=4)),
        "simhash": plan_of(simhash_pairs_from_hashes(hashed)),
        "embedding": plan_of(embedding_near_duplicates(emb, dim=2)),
    }
    for name, plan in plans.items():
        assert count_nodes(plan, "CartesianProduct") == 0, name
        assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0, name


def test_minhash_signature_branch_single_shuffle(spark):
    """Signatures come from the raw shingle multiset: explode -> map-side
    partial min-agg -> ONE exchange on the id. A distinct creeping back
    in would add a full shuffle of the shingle table -- the biggest data
    volume in the dedup pipeline at crawl scale."""
    from sift_spark.operators.dedup import char_shingles, minhash_signatures

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    plan = plan_of(
        minhash_signatures(char_shingles(docs, distinct=False), n_hashes=8)
    )
    assert count_nodes(plan, "Exchange") == 1
