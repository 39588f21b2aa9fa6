"""Web-corpus provenance operators: URL decomposition and per-domain
document caps — the RefinedWeb/C4-style source-diversity controls a
pre-training pipeline applies before mixing (Penedo et al. 2023 §3.1
caps documents per registered domain; Raffel et al. 2020 filters by
host). Pure Column regexp arithmetic (explicit character classes so
Java regex and RE2/DuckDB agree) plus one rank window — no UDFs.

Scale shape: url_parts is shuffle-free projection; domain_cap is ONE
exchange (the rank window partitioned by domain). Domain skew is real
at corpus scale (a handful of hosts dominate web crawls) but the
window state per key is a single running counter, not a buffer, so a
hot domain costs one task's scan time, not memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCHEME = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTHORITY = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def url_parts(url: Column) -> Column:
    """Decompose an absolute URL into struct(scheme, host, domain, path):
    scheme lowercased; host = authority minus userinfo and port,
    lowercased; domain = the last two dot-labels of the host (a
    registrable-domain approximation — no public-suffix list in scope);
    path = the raw path component ('' when absent). Unparseable rows
    yield empty strings, never NULL, so group keys stay total."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    authority = F.regexp_extract(url, _AUTHORITY, 1)
    # userinfo@ prefix off, :port suffix off
    host = F.lower(
        F.regexp_extract(authority, "^(?:[^@]*@)?([^:]*)", 1)
    )
    domain = F.regexp_extract(host, "([^.]+[.][^.]+)$", 1)
    path = F.regexp_extract(url, _PATH, 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        F.when(domain == "", host).otherwise(domain).alias("domain"),
        path.alias("path"),
    )


def domain_cap(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 10,
    order_col: str | None = None,
) -> DataFrame:
    """Keep at most `max_per_domain` documents per registered domain.
    Rank inside each domain by (order_col DESC, doc_id) when order_col
    is given (keep the best-scoring docs first), else by doc_id alone —
    either way the tie-break is total, so the kept set is deterministic
    under any partitioning. Returns every input row plus (host, domain,
    rank_in_domain, kept)."""
    parts = url_parts(F.col(url_col))
    base = docs.withColumn("_up", parts)
    order = (
        [F.col(order_col).desc(), F.col(id_col)]
        if order_col is not None
        else [F.col(id_col)]
    )
    rank = F.row_number().over(
        Window.partitionBy(F.col("_up")["domain"]).orderBy(*order)
    )
    return base.select(
        "*",
        F.col("_up")["host"].alias("host"),
        F.col("_up")["domain"].alias("domain"),
        rank.alias("rank_in_domain"),
    ).drop("_up").withColumn(
        "kept", F.col("rank_in_domain") <= F.lit(max_per_domain)
    )


def canonical_url(url: Column) -> Column:
    """Canonicalize an absolute URL for crawl dedup (the URL-level
    first-pass every web pipeline runs before content dedup): scheme
    and host lowercased, default ports stripped (:80 for http, :443
    for https), fragment dropped, trailing slash on a bare path
    normalized away, query parameters SORTED (split on '&',
    array_sort, rejoin — '?b=2&a=1' and '?a=1&b=2' are the same
    resource), empty query dropped. Pure Column ops with explicit
    character classes; the DuckDB oracle restates every step
    (driver query `url_dedup`).

    Boundary (documented): percent-encoding is NOT normalized ('%2F'
    vs '/' needs a decoder with exclusion rules — RFC 3986 §2.2) and
    the host keeps its unicode form (IDNA is ICU territory)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    authority = F.regexp_extract(url, _AUTHORITY, 1)
    hostport = F.regexp_extract(authority, "^(?:[^@]*@)?(.*)$", 1)
    host = F.lower(F.regexp_extract(hostport, "^([^:]*)", 1))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(url, _PATH, 1)
    # '/x/' -> '/x', '' -> '/', '/' -> '/'
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            path.substr(F.lit(1), F.length(path) - 1),
        ).otherwise(path)
    )
    # the '?' must occur BEFORE any '#': a '?' inside the fragment
    # ('#!?page=2'-style) is fragment content, not a query
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(sorted_query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_query)
        ),
    )


def url_dup_groups(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups under the canonical URL (one linear hash
    aggregation, the `exact_dup_groups` shape keyed on canonical_url):
    (canon_url, n_docs, doc_ids sorted, survivor = lowest id)."""
    return (
        docs.groupBy(canonical_url(F.col(url_col)).alias("canon_url"))
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_list(F.col(id_col))).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            "canon_url", "n_docs", "doc_ids",
            F.element_at("doc_ids", 1).alias("survivor"),
        )
    )
