"""URL canonicalization for crawl-scale dedup and grouping.

Two URLs that differ only in scheme/host case, a default port, a
trailing fragment, tracking query parameters, or query-parameter ORDER
are the same resource; canonicalizing before exact/near dedup collapses
the crawl's biggest trivial-duplicate class (RFC 3986 §6 normalization
plus the de-facto tracking-param strip used by web-corpus pipelines).

All native column expressions (regexp + split/sort/filter inside
whole-stage codegen) -- no UDF, and every rule is reproducible in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# query parameters that never change the resource (analytics trackers)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid",
)


def canonical_url_col(col):
    """Canonical form: lowercase scheme+host, default ports stripped,
    fragment stripped, tracking params dropped, remaining query params
    sorted; non-absolute inputs pass through untouched."""
    url = F.regexp_replace(F.trim(col), r"#.*$", "")  # fragment first
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1)
    )
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)

    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.regexp_extract(url, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~F.regexp_extract(p, r"^([^=]*)", 1)
            .isin(*TRACKING_PARAMS),
        )
    )
    qstring = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    return F.when(
        scheme == "", col  # not an absolute URL: pass through UNTOUCHED
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qstring))
