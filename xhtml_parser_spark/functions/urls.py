"""URL canonicalization for web-corpus dedup keys (pure JVM built-ins).

Crawl dedup and host-level partitioning both key on a normalized URL;
the normalization here is the standard crawl-pipeline subset:

  * drop the fragment
  * lowercase scheme and host
  * strip the scheme's default port (:80 http, :443 https)
  * drop tracking query params (utm_*, gclid, fbclid, msclkid, ref)
  * sort the surviving query params (order-insensitive equality)

Everything is regexp/array built-ins inside whole-stage codegen -- no
Python -- and every regex is RE2-compatible so the DuckDB oracle
replays the normalization character-for-character.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# (=|$): trackers emitted WITHOUT a value ('?fbclid' after redirect
# truncation) must strip identically, or dedup keys split on a tracker
TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$)"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_host(url) -> "F.Column":
    """Lowercased host[:port] of a URL (empty string if not a URL)."""
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    return F.lower(F.regexp_extract(rest, "^([^/?#]*)", 1))


def normalize_url(url) -> "F.Column":
    u = F.regexp_replace(F.coalesce(url, F.lit("")), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(rest, "^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(u, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )

def surt_key(url) -> "F.Column":
    """SURT (Sort-friendly URI Reordering Transform) key, the sort key
    of web-archive CDX indexes: host components reversed and
    comma-joined, then ``)`` and the path+query, everything lowercased
    -- ``https://www.Example.COM/A?b=2&a=1`` -> ``com,example)/a?a=1&b=2``.

    The crawl subset implemented (documented, matching the public
    webarchive-commons canonicalizer's common path): fragment dropped,
    scheme dropped, default ports ``:80``/``:443`` stripped, one
    leading ``www.`` stripped, query params sorted (tracking params
    are NOT stripped here -- SURT keys identify captures, dedup keys
    use normalize_url). No %-escape canonicalization or IDN mapping.
    Pure codegen built-ins, same as normalize_url."""
    u = F.regexp_replace(F.coalesce(url, F.lit("")), "#.*$", "")
    rest = F.lower(F.regexp_replace(u, _SCHEME_RE, ""))
    hostport = F.regexp_replace(
        F.regexp_extract(rest, "^([^/?]*)", 1), ":(80|443)$", ""
    )
    host = F.regexp_replace(
        F.regexp_extract(hostport, "^([^:]*)", 1), "^www\\.", ""
    )
    port = F.regexp_extract(hostport, "(:[0-9]+)$", 1)  # non-default only
    rev = F.concat(
        F.array_join(F.reverse(F.split(host, "\\.")), ","), port
    )
    path = F.regexp_extract(rest, "^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    qs = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != F.lit(""))),
        "&",
    )
    return F.concat(
        rev,
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def _remove_dot_segments(abs_path) -> "F.Column":
    """RFC 3986 §5.2.4 over an absolute path ("/"-rooted), as one
    aggregate fold over the split segments: "." drops, ".." pops,
    anything else pushes. Trailing "/." and "/.." keep their directory
    semantics (a trailing "/" is appended pre-split so the fold's
    empty tail segment survives). Paths are short (a handful of
    segments), so the interpreted fold is noise next to the regexes."""
    dirish = F.when(
        abs_path.rlike("(^|/)\\.\\.?$"), F.concat(abs_path, F.lit("/"))
    ).otherwise(abs_path)
    segs = F.split(F.regexp_replace(dirish, "^/", ""), "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    return F.concat(F.lit("/"), F.array_join(folded, "/"))


def resolve_url(base, href) -> "F.Column":
    """Resolve ``href`` against ``base`` per RFC 3986 §5 (the crawl
    subset): absolute hrefs pass through, "//host/..." adopts the base
    scheme, "/path" is host-relative, "?q" replaces the base query,
    "" / "#frag" mean the base document (fragment stripped), and
    relative paths merge with the base directory and get dot-segments
    removed. All codegen built-ins except the short per-path
    dot-segment fold. Pair with normalize_url/url_host downstream;
    non-hierarchical schemes (mailto:, javascript:) pass through
    as-is, so graph builders filter on '^https?://'."""
    b = F.coalesce(base, F.lit(""))
    h = F.regexp_replace(F.coalesce(href, F.lit("")), "#.*$", "")
    scheme = F.lower(F.regexp_extract(b, _SCHEME_RE, 1))
    rest = F.regexp_replace(b, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, "^([^/?#]*)", 1)
    bpath = F.regexp_extract(rest, "^[^/?#]*([^?#]*)", 1)
    root = F.concat(scheme, F.lit("://"), hostport)
    hpath = F.regexp_extract(h, "^([^?]*)", 1)
    hquery = F.regexp_extract(h, "(\\?.*)$", 1)
    merged = F.when(hpath.startswith("/"), hpath).otherwise(
        F.concat(F.regexp_replace(bpath, "[^/]*$", ""), hpath)
    )
    # the fold in _remove_dot_segments is an interpreted higher-order
    # expression; CASE evaluates branches lazily, so gating it on the
    # presence of an actual dot segment keeps the (dominant) clean-path
    # case fully inside codegen
    has_dots = merged.rlike("(^|/)\\.\\.?(/|$)")
    clean = F.when(
        merged.startswith("/"), merged
    ).otherwise(F.concat(F.lit("/"), merged))
    path = F.when(has_dots, _remove_dot_segments(merged)).otherwise(clean)
    return (
        F.when(h == "", F.regexp_replace(b, "#.*$", ""))
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)
        .when(hpath == "", F.concat(root, bpath, hquery))
        .otherwise(F.concat(root, path, hquery))
    )
