"""URL/domain operators — the FIRST stage of published crawl pipelines.

C4 (Raffel et al. 2020) and RefinedWeb (Penedo et al. 2023) both gate on
the page URL before touching text: extract the host, reduce it to the
registrable domain, and drop pages from blocklisted domains (adult/
malware/ad-tracker lists) — at 100 TB this prunes whole partitions before
any text byte is parsed. Everything here is a pure whole-stage-codegen
projection (one regexp + array ops per row) plus, for DataFrame-sized
blocklists, a broadcast anti-join; the laws are expressible identically
in ANSI SQL for oracle parity.

The registrable-domain rule is the standard public-suffix reduction with
a SMALL built-in multi-part-suffix set (the high-traffic two-level
suffixes; the full Mozilla Public Suffix List is ~10k entries and can be
passed in via ``multi_suffixes``): take the last two host labels, or the
last three when the last two are themselves a public suffix (co.uk,
com.au, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# High-traffic two-level public suffixes (extend via the multi_suffixes
# argument; source: Mozilla Public Suffix List, a public dataset).
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.ar", "com.tr", "com.tw", "com.sg",
)

# authority host: after the scheme and optional userinfo, up to the first
# port/path/query/fragment delimiter. Scheme-less inputs ("example.com/x")
# are treated as host-first, matching how crawl URL columns are stored.
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(url_col) -> F.Column:
    """Lowercased authority host of a URL column/name (empty string, never
    NULL, for NULL/hostless input — the oracle-comparator convention)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.coalesce(F.regexp_extract(c, _HOST_RE, 1), F.lit("")))


def registrable_domain(host: F.Column,
                       multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
                       ) -> F.Column:
    """Public-suffix-reduced registrable domain of a host expression:
    the last two dot-labels, or three when the last two are a multi-part
    public suffix. Single-label hosts (``localhost``) pass through."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2),
                         ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3),
                         ".")
    is_multi = last2.isin(*multi_suffixes)
    return (F.when(n <= 2, host)
            .when(is_multi & (n >= 3), last3)
            .otherwise(last2))


def url_domains(df: DataFrame, url_col: str = "url",
                multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
                ) -> DataFrame:
    """Append ``host`` and ``domain`` (registrable) — one codegen pass."""
    host = url_host(url_col)
    return df.withColumns(
        {"host": host,
         "domain": registrable_domain(host, multi_suffixes)})


def filter_by_domain(
    df: DataFrame,
    blocklist,
    url_col: str = "url",
    mode: str = "block",
    multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES,
) -> DataFrame:
    """Domain-gate a crawl: keep rows whose registrable domain is NOT in
    ``blocklist`` (``mode="block"``) or IS in it (``mode="allow"`` — an
    allowlist). Appends ``domain`` and ``keep`` and returns ALL rows
    labeled (filter with ``.where("keep")``) so drops stay auditable,
    mirroring ``quality_filter``.

    ``blocklist`` is either a small list/tuple of domains (a literal
    ``isin`` — stays inside whole-stage codegen, zero shuffle) or a
    one-column DataFrame (broadcast LEFT join marker — the 10k-1M-entry
    real-world lists; the corpus side never shuffles). NULL/hostless URLs
    have domain ``''`` which no list contains: they are kept under
    ``block`` and dropped under ``allow`` — never a NULL boolean."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    out = url_domains(df, url_col, multi_suffixes).drop("host")
    if isinstance(blocklist, DataFrame):
        bcol = blocklist.columns[0]
        marks = (blocklist.select(F.lower(F.col(bcol)).alias("domain"))
                 .distinct().withColumn("_dom_hit", F.lit(1)))
        out = (out.join(F.broadcast(marks), "domain", "left")
               .withColumn("_hit", F.col("_dom_hit").isNotNull())
               .drop("_dom_hit"))
    else:
        doms = [d.lower() for d in blocklist]
        out = out.withColumn(
            "_hit", F.col("domain").isin(*doms) if doms else F.lit(False))
    keep = ~F.col("_hit") if mode == "block" else F.col("_hit")
    return out.withColumn("keep", keep).drop("_hit")
