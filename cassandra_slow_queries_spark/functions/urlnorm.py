"""URL canonicalization — the web-crawl dedup key (Tier 3).

A crawl corpus reaches the same page through many spellings —
scheme/host case, ``www.`` prefixes, tracking parameters, shuffled
query order, fragments, trailing slashes, explicit default ports.
Exact dedup (operators/dedup.py) keyed on the RAW url misses all of
them; keying on the canonical form is the standard first dedup pass of
a web pipeline (it is how crawl frontiers and CDX indexes key pages).

Everything here is a pure column expression — regexp + array ops
inside whole-stage codegen, no Python, no shuffle of its own — so the
canonical key rides the scan and feeds directly into the usual
hash-groupBy dedup. The steps (each an independent helper, composed by
:func:`canonical_url`):

1. drop the fragment;
2. lowercase scheme and host (ONLY those — path/query stay cased);
3. strip a leading ``www.`` from the host;
4. strip an explicit default port (``:80`` for http, ``:443`` https);
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ...);
6. sort surviving query parameters bytewise (order never
   distinguishes resources in practice);
7. drop a trailing ``/`` on a non-root path.

Every regex avoids lookaround on purpose: the catalog oracle replays
the identical transforms in DuckDB, whose RE2 engine supports neither
lookahead nor lookbehind — capture-group rewrites express the same
thing portably.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never identify a resource (trackers)
TRACKING_PARAMS = (
    "utm_[a-z]+",
    "fbclid",
    "gclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
)

#: anchored alternation matching a tracking parameter's ``name=`` head
TRACKER_RE = "^(" + "|".join(TRACKING_PARAMS) + ")="


def _c(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def strip_fragment(url: Column | str) -> Column:
    return F.regexp_replace(_c(url), "#.*$", "")


def lower_scheme_host(url: Column | str) -> Column:
    """Lowercase only the ``scheme://host[:port]`` prefix; everything
    after the authority keeps its case (paths ARE case-sensitive)."""
    c = _c(url)
    head = F.regexp_extract(c, "^([^/?#]*//[^/?#]*)", 1)
    return F.concat(
        F.lower(head), F.substring(c, F.length(head) + 1, F.lit(1 << 30))
    )


def strip_www(url: Column | str) -> Column:
    return F.regexp_replace(
        _c(url), "^([a-z][a-z0-9+.-]*://)www\\.", "$1"
    )


def strip_default_port(url: Column | str) -> Column:
    """``:80`` on http / ``:443`` on https is the same resource; other
    scheme-port pairs are left alone. Capture-group rewrite (no
    lookahead): the boundary char — or end-of-string — is re-emitted."""
    c = F.regexp_replace(
        _c(url), "^(http://[^/?#:]*):80([/?#]|$)", "$1$2"
    )
    return F.regexp_replace(c, "^(https://[^/?#:]*):443([/?#]|$)", "$1$2")


def normalize_query(url: Column | str) -> Column:
    """Drop tracking params, sort the rest bytewise, re-join. A query
    left empty (or absent to begin with) contributes nothing — the
    ``?`` goes too."""
    c = _c(url)
    base = F.substring_index(c, "?", 1)
    has_q = F.instr(c, "?") > 0
    qs = F.regexp_extract(c, "\\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKER_RE),
        )
    )
    return F.when(
        has_q & (F.size(kept) > 0),
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)


def strip_trailing_slash(url: Column | str) -> Column:
    """Remove one trailing ``/`` from the PATH — at end-of-string or
    immediately before the ``?`` (unless the preceding char is also
    ``/``, so a stray ``...//`` isn't half-eaten): ``https://host/``
    and ``https://host`` canonicalize to the latter, ``/path/`` joins
    ``/path``, ``/p/?q=1`` joins ``/p?q=1``. Capture-group rewrites
    (no lookbehind)."""
    c = F.regexp_replace(_c(url), "([^/])/\\?", "$1?")
    return F.regexp_replace(c, "([^/])/$", "$1")


def canonical_url(url: Column | str) -> Column:
    """The full pipeline, steps 1–7 in order. NULL-safe (every step is
    NULL-propagating, so NULL in → NULL out)."""
    c = _c(url)
    c = strip_fragment(c)
    c = lower_scheme_host(c)
    c = strip_www(c)
    c = strip_default_port(c)
    c = normalize_query(c)
    c = strip_trailing_slash(c)
    return c


#: URL matcher shared with the oracle SQL — RE2-portable (no lookaround,
#: inline (?i) — both engines support it), stops at whitespace, quotes,
#: angle brackets, and closing parens. Case-insensitive on purpose:
#: 'HTTPS://...' mentions are real, and a case-sensitive matcher drops
#: them SILENTLY (caught by the x_outlinks entry returning half its
#: hosts).
URL_RE = "(?i)https?://[^\\s\"'<>()]+"


def extract_urls(text: Column | str) -> Column:
    """All http(s) URLs mentioned in a text column, in order —
    ``regexp_extract_all``, pure codegen. Trailing sentence punctuation
    (``.,;:!?``) is stripped from each match (the standard outlink-
    extraction wart: 'see https://x.com/a.' must not yield a URL ending
    in '.'). Feeds :func:`canonical_url` for outlink/domain analysis:
    extract → canonicalize → hash-groupBy is the whole outlink-graph
    ingestion path."""
    c = _c(text)
    raw = F.regexp_extract_all(c, F.lit(URL_RE), 0)
    return F.transform(
        raw, lambda u: F.regexp_replace(u, "[.,;:!?]+$", "")
    )


def url_host(url: Column | str) -> Column:
    """The lowercased host (no port, no ``www.``) of a URL — the domain
    grouping key for per-site caps (operators/curation.py:cap_per_group)
    and outlink counts. Case-insensitive like :func:`extract_urls` (the
    URL is lowered before matching), so the two compose directly on raw
    mentions — an uppercase 'HTTPS://...' must not fall into an
    empty-host group."""
    c = F.lower(_c(url))
    host = F.regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1)
    return F.regexp_replace(host, "^www\\.", "")
