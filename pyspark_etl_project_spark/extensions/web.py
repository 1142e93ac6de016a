"""Web-crawl hygiene operators: URL canonicalization and URL-level
dedup — the first dedup pass of any crawl pipeline (two fetches of the
same page differ only in case, tracking params, fragments, or default
ports; canonicalizing before content dedup removes the cheap bulk).

Everything is pure column expressions over portable regex/string/array
functions — no UDFs, no driver state — so the canonical form is
bit-identical across engines (the DuckDB oracle replays the same
rules) and the whole pass stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters dropped during canonicalization (utm_* wildcard
# plus the common click ids). Keep in sync with the regex literal in
# the url_canonical_dedup SQL twin (plans/extensions.py).
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def _host_of(hostport: Column) -> Column:
    """Host of a (userinfo-stripped) authority. Bracketed IPv6
    literals keep their brackets — the colon-based port split would
    otherwise truncate '[2001:db8::1]' to '[', collapsing every IPv6
    host to one canonical value (and making IPv6 blocklist entries
    unmatchable). DNS names get the usual lowercase + www-strip;
    IP literals are matched exactly, never by dot-suffix."""
    bracketed = F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1))
    plain = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)),
        r"^www\.", "")
    return F.when(hostport.startswith("["), bracketed).otherwise(plain)


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an http(s) URL:

    - scheme and host lowercased; leading ``www.`` dropped
    - default ports stripped (``:80`` for http, ``:443`` for https);
      other ports kept
    - fragment dropped
    - tracking query params dropped (``TRACKING_RE``), remaining params
      sorted bytewise; empty query drops the ``?``
    - trailing slashes trimmed from the path; empty path becomes ``/``
    """
    u = F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                         r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    # Strip URL userinfo BEFORE splitting host/port: without this,
    # 'http://x@blocked.com/' keeps 'x@blocked.com' as the host (never
    # matching a blocklist suffix) and 'user:pass@host' makes the
    # ^([^:]*) extract return 'user'. Greedy .*@ takes the LAST @, as
    # RFC 3986 requires (userinfo may itself contain @-free ':').
    hostport = F.regexp_replace(hostport, r"^.*@", "")
    host = _host_of(hostport)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = (F.when((scheme == "http") & (port == "80"), F.lit(""))
             .when((scheme == "https") & (port == "443"), F.lit(""))
             .otherwise(port))
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1),
                            r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_RE)))
    qstr = F.array_join(params, "&")
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")))


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Group documents by canonical URL: (canonical_url, n_docs,
    n_raw_variants, keep_id = lowest id). One hash shuffle on the
    canonical string; the canonicalization itself is map-side."""
    return (df.select(F.col(id_col), F.col(url_col),
                      canonical_url(url_col).alias("canonical_url"))
              .groupBy("canonical_url")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.countDistinct(url_col).alias("n_raw_variants"),
                   F.min(id_col).alias("keep_id")))


def url_host(col: Column | str) -> Column:
    """Lowercased host of an http(s) URL with any leading ``www.``
    dropped and the port stripped — the key both the canonicalizer above
    and the blocklist filter below agree on."""
    u = F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                         r"#.*$", "")
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # Userinfo stripped first (see canonical_url) — a crafted
    # 'http://anything@blocked.com/' must not bypass the blocklist.
    hostport = F.regexp_replace(hostport, r"^.*@", "")
    return _host_of(hostport)


def blocklist_verdicts(df: DataFrame, id_col: str, url_col: str,
                       blocklist: list[str]) -> DataFrame:
    """Match each URL's host against a domain blocklist with DNS-suffix
    semantics (an entry blocks the exact host AND every subdomain of
    it), the standard crawl-hygiene filter in front of a training-data
    pipeline. Returns the input ids plus ``host`` and ``matched_domain``
    (null = kept).

    When several entries match one host the MOST SPECIFIC (longest)
    wins — and that choice is always deterministic, because two distinct
    suffixes of the same host string can never have equal length.

    Scale shape: suffix matching is decomposed into an EQUI-join — each
    host explodes into its dot-suffix candidates ('a.b.c' → ['a.b.c',
    'b.c', 'c'], bounded by the label count, ~5 rows per host), which
    join the blocklist on plain equality. With the blocklist broadcast
    (curated lists are small) the whole filter is map-side: no
    nested-loop predicate evaluation per (host × entry) pair, so cost
    is rows × labels, independent of blocklist size — the same plan
    carries a million-entry list, where it falls back to a shuffled
    hash join on the suffix key. The per-id longest-match aggregate
    collapses multi-entry matches deterministically. Measured in the
    100× amplification probe (tools/amplification_probe.py,
    blocklist_filter_1k_entries): the equi-join form runs the 10M-row ×
    1k-entry probe in 17.6 s where the nested-loop formulation took
    36.4 s — and unlike the nested loop its cost does not multiply
    with blocklist size."""
    spark = df.sparkSession
    from pyspark_etl_project_spark.functions.seedframe import seed_df
    bl = F.broadcast(
        seed_df(spark, [(d,) for d in blocklist], "domain string"))
    hosts = df.select(F.col(id_col), url_host(url_col).alias("host"))
    parts = F.split(F.col("host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."))
    cand = hosts.select(F.col(id_col), "host",
                        F.explode(suffixes).alias("_sfx"))
    joined = cand.join(bl, cand["_sfx"] == bl["domain"], "left")
    # Every host yields >= 1 candidate row, so grouping the left join
    # back by id loses nothing. Longest-match pick; coalesce(-1) keeps
    # the unmatched (null-domain) rows orderable below any real match.
    best = F.max(F.struct(
        F.coalesce(F.length("domain"), F.lit(-1)).alias("l"),
        F.col("domain").alias("d")))
    return (joined.groupBy(id_col, "host")
            .agg(best.alias("_m"))
            .select(F.col(id_col), "host",
                    F.col("_m.d").alias("matched_domain")))
