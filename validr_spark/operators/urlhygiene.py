"""URL/domain hygiene — host extraction, registrable-domain grouping,
blocklist filtering, and per-domain caps over a web corpus.

Why: web-scale training pipelines (C4, RefinedWeb, FineWeb) apply URL
rules BEFORE any text processing — drop blocklisted domains, then cap
how many documents any single registrable domain may contribute so one
crawler-friendly site cannot dominate the mixture.  These are the
cheapest filters in the pipeline (pure string arithmetic on a short
column) and remove the most bytes per CPU-second, so they run first.

Scale design (corpus = 10^12 docs):

* host/domain extraction is pure codegen ``regexp_extract`` in the
  Java ∩ RE2 dialect (no lookarounds, no backrefs) — the DuckDB oracle
  runs the IDENTICAL pattern strings, same trick as operators/pii.py
  and operators/encoding.py.  No ``parse_url`` (DuckDB has no twin) and
  no Python.
* ``url_filter`` with a literal blocklist compiles to an ``InSet``
  predicate — map-side, zero shuffle.  A DataFrame blocklist becomes a
  broadcast LEFT ANTI join on the domain.
* ``cap_per_domain`` is one window shuffle keyed on the registrable
  domain; the ``row_number <= cap`` filter gets WindowGroupLimit
  partial limits from the planner (each map task forwards at most
  ``cap`` rows per domain it has seen), so a hot domain with 10^8 docs
  ships ~``cap × n_tasks`` rows, not 10^8.
* ``domain_histogram`` is a hash aggregate — shuffle carries distinct
  domains only.

Registrable domain: last two host labels, or last three when the last
two are a known multi-label public suffix (``co.uk``-style).  The
embedded suffix set is a small documented HEURISTIC subset of the
Public Suffix List — enough to group correctly for the common 2-level
country TLDs; pass ``extra_suffixes`` for corpus-specific ones.  Raw
IPv4 hosts are kept whole (no "domain" to extract).

No counterpart in guyskk/validr (its `url` validator checks a single
value's scheme/length, pyx:1118-1144 — these operators are corpus-level
transforms built on the same URL shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["host_of", "registrable_domain", "url_filter",
           "domain_histogram", "cap_per_domain", "HOST_RE", "IPV4_HOST_RE",
           "MULTI_LABEL_SUFFIXES"]

# scheme://[user@]HOST[:port][/...]  — host capture stops at : / ? #.
# Java ∩ RE2: character classes and a single capture group only.
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"
IPV4_HOST_RE = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"

# Heuristic subset of the Public Suffix List: common 2-level suffixes
# under which the registrable domain is THREE labels (bbc.co.uk), not
# two (co.uk).  Documented as a subset — not an exhaustive PSL mirror.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.tw", "com.sg", "com.ar",
)


def host_of(url: Column) -> Column:
    """Lowercased host of ``url`` (NULL when no ``scheme://host`` shape
    is present).  Pure codegen regexp — oracle-identical in DuckDB."""
    h = F.lower(F.regexp_extract(url, HOST_RE, 1))
    return F.when(h != "", h)          # regexp_extract misses → '' → NULL


def registrable_domain(url: Column,
                       extra_suffixes: tuple[str, ...] = ()) -> Column:
    """Registrable domain of ``url``: last two host labels, last three
    under a known multi-label suffix, the whole host for IPv4 literals.
    NULL when the URL has no parsable host."""
    host = host_of(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2),
                        F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    suffixes = list(MULTI_LABEL_SUFFIXES) + list(extra_suffixes)
    return F.when(host.isNull(), F.lit(None).cast("string")) \
        .when(host.rlike(IPV4_HOST_RE), host) \
        .when((n >= 3) & last2.isin(suffixes), last3) \
        .when(n >= 2, last2) \
        .otherwise(host)


def url_filter(df: DataFrame, blocklist, url_col: str = "url",
               extra_suffixes: tuple[str, ...] = (),
               keep_unparsable: bool = False) -> DataFrame:
    """Corpus minus documents whose registrable domain is blocklisted.

    ``blocklist`` is either a list of domains (compiled to a map-side
    ``InSet`` — zero shuffle, the normal case: curated lists are 10^3..
    10^5 entries) or a one-column DataFrame of domains (broadcast LEFT
    ANTI join — for blocklists living in a table).  Documents whose URL
    has no parsable host are dropped unless ``keep_unparsable`` (an
    unparsable URL can't be vetted against the list — fail safe).
    """
    dom = registrable_domain(F.col(url_col), extra_suffixes)
    if isinstance(blocklist, DataFrame):
        bcol = blocklist.columns[0]
        block = blocklist.select(F.col(bcol).alias("_blocked_dom"))
        tagged = df.withColumn("_dom", dom)
        out = tagged.join(F.broadcast(block),
                          tagged["_dom"] == F.col("_blocked_dom"),
                          "left_anti")
        if not keep_unparsable:
            out = out.filter(F.col("_dom").isNotNull())
        return out.drop("_dom")
    blocked = dom.isin([d.lower() for d in blocklist])
    keep = ~F.coalesce(blocked, F.lit(False))
    if not keep_unparsable:
        keep = keep & dom.isNotNull()
    return df.filter(keep)


def domain_histogram(df: DataFrame, url_col: str = "url",
                     blocklist: list[str] | None = None,
                     extra_suffixes: tuple[str, ...] = ()) -> DataFrame:
    """(domain, n_docs, share, blocked) per registrable domain, share of
    ALL rows (unparsable URLs appear as domain NULL so the shares sum to
    1).  One hash aggregate; the total rides a window over the
    aggregated rows (|domains|, not |docs|)."""
    from pyspark.sql import Window

    dom = registrable_domain(F.col(url_col), extra_suffixes)
    agg = (df.select(dom.alias("domain"))
           .groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs")))
    total = F.sum("n_docs").over(Window.partitionBy())
    blocked = (F.coalesce(F.col("domain").isin(
        [d.lower() for d in blocklist]), F.lit(False))
        if blocklist else F.lit(False))
    return agg.select(
        "domain", "n_docs",
        F.round(F.col("n_docs") / total, 6).alias("share"),
        blocked.alias("blocked"))


def cap_per_domain(df: DataFrame, cap: int, url_col: str = "url",
                   by: str | None = None, id_col: str = "doc_id",
                   extra_suffixes: tuple[str, ...] = ()) -> DataFrame:
    """At most ``cap`` documents per registrable domain: the survivors
    are the top ``cap`` by ``by`` (descending, NULLs last — pass a
    quality score to keep the best copies) with ``id_col`` ascending as
    the deterministic tie-break; ``by=None`` keeps the ``cap`` smallest
    ids.  Documents with no parsable host form one NULL-domain group
    (cap applies to it too — an unbounded "junk URL" group would defeat
    the cap).

    One window shuffle on the domain; WindowGroupLimit pushes a partial
    per-domain top-``cap`` into each map task before the exchange.
    """
    if cap <= 0:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    order = ([F.col(by).desc_nulls_last(), F.col(id_col).asc()]
             if by else [F.col(id_col).asc()])
    dom = registrable_domain(F.col(url_col), extra_suffixes)
    w = Window.partitionBy("_dom").orderBy(*order)
    return (df.withColumn("_dom", dom)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_dom", "_rn"))
