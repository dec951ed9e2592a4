"""Shared fixture corpus (re-exported from the package source of truth)."""

from sift_spark.sources.reference_fixtures import (  # noqa: F401
    BLOG_POST_HTML,
    COMPOSITE_DOC,
    MALFORMED_HTML,
    SIMPLE_HTML,
)
