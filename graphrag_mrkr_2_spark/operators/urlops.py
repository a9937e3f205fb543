"""URL operations for web-crawl curation: normalization, domain extraction,
per-domain caps.

The reference ingests uploaded files, so it has no URL layer; at the
north-rule's 10^12-page crawl scale these are the standard curation passes
(C4/CC-Net-style URL canonicalization before dedup; per-domain caps against
head-domain dominance — the same skew the pipeline's salted url-hash
repartition addresses at the shuffle level, applied here at the DATA level).

All column expressions (whole-stage codegen, no Python). Every regex is
RE2-safe (no lookarounds/backrefs in PATTERNS) so the DuckDB oracle can run
byte-identical patterns; only the replacement backref syntax differs per
engine ($1 Java / \\1 RE2), which the oracle mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# one regex pair per normalization step: (pattern, java_replacement).
# Steps run AFTER the scheme://host prefix is lowercased (so the
# port/slash patterns can be anchored on lowercase schemes), in this order.
# The mid-string tracking-param rule is ANCHORED on a [?&] separator (an
# unanchored variant matched inside other params' values, e.g.
# '?q=gclid=x&p=2'); because a regex engine resumes scanning after each
# replacement, one pass removes every OTHER consecutive tracking param, so
# the rule repeats 3x — up to 8 consecutive tracking params, far beyond
# real URLs; any 9th+ survives un-normalized rather than corrupted.
_TRACKING_MID = (r"([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*&", "$1")
URL_NORM_STEPS: list[tuple[str, str]] = [
    _TRACKING_MID,
    _TRACKING_MID,
    _TRACKING_MID,
    # last param in the query
    (r"[?&](utm_[a-z]+|gclid|fbclid)=[^&#]*$", ""),
    # tidy leftover separators: '?&' -> '?', trailing '?' or '&'
    (r"\?&", "?"),
    (r"[?&]$", ""),
    # default ports (bracketed IPv6 hosts carry ':' inside [] — the
    # alternation keeps the rule matching them; review r4 pass-3 #3)
    (r"^(http://(?:\[[^\]]*\]|[^/:?#]+)):80([/?#]|$)", "$1$2"),
    (r"^(https://(?:\[[^\]]*\]|[^/:?#]+)):443([/?#]|$)", "$1$2"),
    # trailing slash on a bare host
    (r"^([a-z]+://[^/?#]+)/$", "$1"),
]

_SCHEME_HOST = r"^([^/?#]*://[^/?#]*)"
# host capture: bracketed IPv6 literals are taken WHOLE (the ':' inside
# brackets must not truncate the host — review r4 pass-2 finding #4);
# otherwise the host ends at the first ':' (port), '/', '?' or '#'
_HOST = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/?#:]+)"


def normalize_url(col: Column) -> Column:
    """Canonical URL: lowercase scheme://host prefix, no fragment, no
    tracking params, no default ports, no trailing slash on bare hosts."""
    # fragment first (it may contain '?'/'&' that would confuse later steps)
    out = F.regexp_replace(col, r"#.*$", "")
    # lowercase the scheme://host prefix BEFORE the anchored steps — an
    # uppercase 'HTTP://HOST:80/' must normalize identically to lowercase
    prefix = F.lower(F.regexp_extract(out, _SCHEME_HOST, 1))
    out = F.concat(prefix, F.regexp_replace(out, _SCHEME_HOST, ""))
    for pattern, repl in URL_NORM_STEPS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def url_domain(col: Column, strip_www: bool = True) -> Column:
    """Host part of the URL (lowercased), optionally minus a leading www. —
    the cheap approximation kept for callers that explicitly want hosts;
    the default per-domain grouping key is :func:`registered_domain`."""
    host = F.lower(F.regexp_extract(col, _HOST, 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def registered_domain(col: Column) -> Column:
    """PSL-aware registered domain of the URL's host (r4, VERDICT r3 #7):
    foo.co.uk-style hosts group at the registrable boundary instead of the
    host-minus-www approximation, so per-domain caps can't be dodged by
    subdomain fan-out on shared-suffix registries (bbc.co.uk vs
    news.bbc.co.uk → bbc.co.uk; user1.github.io vs user2.github.io stay
    distinct). Vendored-subset rules by default; the full PSL file drops in
    via SPARK_GRAFT_PSL_FILE (functions/psl.py). Pure column expressions —
    hashed-InSet membership probes, whole-stage codegen."""
    from ..functions.psl import registered_domain_expr

    return registered_domain_expr(F.lower(F.regexp_extract(col, _HOST, 1)))


def with_normalized_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "norm_url", psl: bool = True
) -> DataFrame:
    dom = registered_domain(F.col(out_col)) if psl else url_domain(F.col(out_col))
    return df.withColumn(out_col, normalize_url(F.col(url_col))).withColumn(
        "domain", dom
    )


def cap_per_domain(
    df: DataFrame,
    max_per_domain: int,
    domain_col: str = "domain",
    order_col: str = "url",
) -> DataFrame:
    """Keep at most N rows per domain, deterministically (md5-order over
    ``order_col`` — reproducible at any cluster size, no RNG).

    One window per domain partition — the head-domain key is exactly the hot
    key, but row_number's per-partition state is O(1) and AQE splits skewed
    shuffle partitions; this never buffers a domain's rows.
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(order_col).cast("string")), F.col(order_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_per_domain)
        .drop("__rn")
    )
