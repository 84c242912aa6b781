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
