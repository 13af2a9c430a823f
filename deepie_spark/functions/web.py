"""URL canonicalization — pure JVM column expressions.

Web-corpus pipelines dedup and partition by URL; raw crawl URLs differ
in fragment, tracking parameters, parameter order, host case, and
trailing slashes while naming the same resource.  ``normalize_url``
applies the standard canonicalization steps with built-in functions
only (split/regexp/array ops — whole-stage codegen, no Python), so it
runs at scan speed on 10^12 rows and has an exact DuckDB twin.

Steps (each mirrored in the oracle):
1. strip the fragment (``#…``),
2. split path from query string,
3. lowercase scheme+host (path case is significant and kept),
4. strip one trailing slash from the path,
5. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``),
6. sort the surviving parameters and reattach.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking-parameter prefixes dropped during canonicalization
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=")


def normalize_url(u: Column) -> Column:
    no_frag = F.element_at(F.split(u, "#", 2), 1)
    parts = F.split(no_frag, r"\?", 2)
    base = F.element_at(parts, 1)
    # try_element_at: a url without a query has a 1-element split and
    # ANSI-mode element_at(…, 2) would raise instead of returning null
    query = F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit(""))
    host = F.regexp_extract(base, "^([A-Za-z]+://[^/]*)", 1)
    rest = F.regexp_replace(
        F.regexp_replace(base, "^[A-Za-z]+://[^/]*", ""), "/$", ""
    )
    cleaned = F.concat(F.lower(host), rest)

    def keep(p: Column) -> Column:
        cond = p != ""
        for pre in TRACKING_PREFIXES:
            cond = cond & ~p.startswith(pre)
        return cond

    params = F.array_sort(F.filter(F.split(query, "&"), keep))
    qs = F.array_join(params, "&")
    return F.when(qs != "", F.concat(cleaned, F.lit("?"), qs)).otherwise(
        cleaned
    )


def extract_links(html: Column) -> Column:
    """All ``href="…"`` targets of a page in document order — one
    codegen ``regexp_extract_all``, no Python (the link-extraction
    stage of web-graph construction; DuckDB twin uses the identical
    pattern)."""
    return F.regexp_extract_all(html, F.lit('href="([^"]+)"'), 1)


def url_host(u: Column) -> Column:
    """scheme-stripped host of a URL (empty string when no scheme —
    relative links don't vote in the host graph)."""
    return F.regexp_extract(u, "^[A-Za-z]+://([^/]+)", 1)


#: shared href/anchor pattern — two codegen passes over the same
#: regex (``regexp_extract_all`` captures ONE group per call), zipped
#: in-row; the DuckDB twin uses the identical pattern per group.
_ANCHOR_PATTERN = 'href="([^"]+)"[^>]*>([^<]*)</a>'


def extract_anchors(html: Column) -> Column:
    """All ``<a href="…">text</a>`` links of a page in document order
    as an array of (href, anchor) structs — the anchor-text harvest of
    web-graph construction (inbound anchor text is the classic
    external naming signal for entity aliasing, Craswell et al. 2001).
    Pure JVM: two ``regexp_extract_all`` + one ``arrays_zip``, no
    Python, scan-speed at 10^12 pages."""
    return F.arrays_zip(
        F.regexp_extract_all(html, F.lit(_ANCHOR_PATTERN), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(_ANCHOR_PATTERN), 2).alias("anchor"),
    )
