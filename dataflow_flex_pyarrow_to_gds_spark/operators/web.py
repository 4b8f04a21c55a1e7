"""URL canonicalization — the web-corpus identity operator.

The reference pipeline (neo4j-field/dataflow-flex-pyarrow-to-gds) has
no URL surface (SURVEY.md §2.8 — its only string function is
strtobool, reference neo4j_beam/util.py:61-74); this module is part of
the LLM-training-data extension mandate.

Web-scale training corpora key almost everything on the URL (exact
dedup across crawls, per-domain caps, robots/blocklist joins), and raw
crawl URLs are noisy: mixed-case hosts, default ports, tracking
parameters, fragments, trailing slashes all make byte-distinct strings
that name the same resource. Canonicalizing BEFORE any URL-keyed
operation is the difference between "deduped" and "kept five copies of
every page that was ever shared with a utm_source".

Everything here is a JVM ``regexp_extract``/``regexp_replace``/string
expression chain — narrow, zero shuffle, no UDF — restricted to the
regex subset (anchors, char classes, alternation; no backrefs, no
lookaround) whose semantics are identical in Java and RE2, so the
DuckDB oracle mirrors every step verbatim (the strip_html_col rule).

Canonicalization contract (deliberately explicit — canonicalizers
differ, and silent disagreement between pipeline stages is the actual
failure mode):

1. fragment dropped (``#…`` never reaches the server);
2. scheme and authority lowercased (RFC 3986 §6.2.2.1); path/query
   case is preserved (significant on most servers);
3. default ports dropped (``:80`` for http, ``:443`` for https);
4. a leading ``www.`` label dropped;
5. tracking parameters removed: ``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid`` (query-string noise injected by ad/analytics redirects;
   the list is a parameter);
6. remaining query-string punctuation repaired (``?&`` → ``?``,
   trailing ``?``/``&`` dropped);
7. trailing slashes trimmed from a non-root path (``/a/`` ≡ ``/a``;
   the root ``/`` itself is dropped too — host-only form).

Reference: RFC 3986 §6 (syntax-based normalization); the tracking-
parameter list is the common public blocklist core.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "normalize_url_col",
    "seed_synthetic_urls_col",
    "url_domain_col",
    "url_host_col",
]

#: Default tracking-parameter name pattern (regex alternation, applied
#: inside ``(?:…)=value`` matches).
TRACKING_PARAMS = "utm_[a-z]+|fbclid|gclid|msclkid"

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$"


def normalize_url_col(
    url: Column, tracking_params: str = TRACKING_PARAMS
) -> Column:
    """Canonical form of a URL column per the module contract. Inputs
    that don't parse as ``scheme://authority…`` pass through unchanged
    (garbage stays byte-identifiable rather than silently mangled)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(no_frag, _URL_RE, 2))
    rest = F.regexp_extract(no_frag, _URL_RE, 3)
    # default ports, then the www. label
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, r":443$", "")
    ).otherwise(auth)
    auth = F.regexp_replace(auth, r"^www\.", "")
    # tracking params (value runs to the next & or end), then repair
    # query punctuation, then trailing slashes
    rest = F.regexp_replace(
        rest, r"[?&](?:" + tracking_params + r")=[^&#]*", ""
    )
    rest = F.regexp_replace(rest, r"^([^?&]*)&", r"$1?")
    rest = F.regexp_replace(rest, r"[?&]$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    rest = F.regexp_replace(rest, r"/+\?", "?")
    return F.when(
        F.regexp_extract(no_frag, _URL_RE, 1) == "", url
    ).otherwise(F.concat(scheme, F.lit("://"), auth, rest))


def url_host_col(url: Column) -> Column:
    """Lowercased host (no port) of a URL column — '' if unparseable."""
    auth = F.lower(F.regexp_extract(url, _URL_RE, 2))
    return F.regexp_replace(auth, r":[0-9]*$", "")


def url_domain_col(url: Column) -> Column:
    """Registrable-domain HEURISTIC: the last two dot-labels of the
    host (``a.b.example.com`` → ``example.com``). Honest limitation:
    multi-label public suffixes (``example.co.uk``) need the public
    suffix list, which is a data file, not an algorithm — callers with
    ccTLD-heavy corpora should join a PSL table on :func:`url_host_col`
    instead."""
    host = url_host_col(url)
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def seed_synthetic_urls_col(id_col: Column) -> Column:
    """Deterministic messy URL per id — the PII/markup seeding
    precedent: the fixture has no URL column, so the catalog row
    derives one IN-QUERY (mirrored verbatim in the oracle) exercising
    every normalization rule: case-mixed scheme/host/www, default and
    explicit ports, tracking params in first/middle positions, kept
    params with preserved case, fragments, trailing slashes."""
    i = id_col
    scheme = F.when(i % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    www = F.when(i % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    host = F.concat(
        www, F.lit("Site"), (i % 20).cast("string"), F.lit(".ExAmPle.COM")
    )
    port = (
        F.when((i % 5 == 0) & (i % 2 == 0), F.lit(":443"))
        .when((i % 5 == 0) & (i % 2 == 1), F.lit(":80"))
        .when(i % 7 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/Page/"),
        (i % 13).cast("string"),
        F.when(i % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(i % 3 == 0, F.lit("?utm_source=feed&id=KeepMe&utm_medium=x"))
        .when(i % 3 == 1, F.lit("?id=KeepMe&fbclid=abc123"))
        .otherwise(F.lit(""))
    )
    frag = F.when(i % 6 == 0, F.lit("#SectionTwo")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)
