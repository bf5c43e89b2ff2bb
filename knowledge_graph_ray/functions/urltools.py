"""URL canonicalization — the webtext dedup/aggregation key maker.

Crawl pipelines key nearly everything on a canonical URL (host-level
quality stats, URL-level exact dedup, politeness bucketing); raw
crawl URLs differ in case, default ports, ``www.`` prefixes, trailing
slashes and tracking params while naming the same resource. This
canonicalizer folds those, vectorized end to end on
``pyarrow.compute`` RE2 kernels — the SAME regex engine DuckDB uses,
so the SQL oracle applies the literal same pattern strings
(functions/scrub.py established the technique).

Rules (conservative, order matters):
  host  = lowercase(authority), strip leading ``www.``, strip the
          default ``:80`` port; path case is PRESERVED (paths are
          case-sensitive per RFC 3986).
  path  = everything between authority and ``?``/``#``, trailing
          slashes stripped.
  query + fragment are dropped (tracking params).
  canonical_url = host + path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# literal-shared with the DuckDB twin — change BOTH or neither
P_HOST_OF = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$"
P_PATH_OF = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*$"
P_WWW = r"^www\."
P_DEFAULT_PORT = r":80$"
P_TRAILING_SLASH = r"/+$"


def _sub(col, pattern: str, replacement: str):
    return pc.replace_substring_regex(col, pattern=pattern, replacement=replacement)


def canonical_host(urls: pa.Array | pa.ChunkedArray):
    host = pc.utf8_lower(_sub(urls, P_HOST_OF, r"\1"))
    return _sub(_sub(host, P_WWW, ""), P_DEFAULT_PORT, "")


def canonical_url(urls: pa.Array | pa.ChunkedArray):
    """(host, canonical_url) arrays for a URL string column."""
    host = canonical_host(urls)
    path = _sub(_sub(urls, P_PATH_OF, r"\1"), P_TRAILING_SLASH, "")
    return host, pc.binary_join_element_wise(host, path, "")


def canonicalize_batch(
    batch: pa.Table, *, url_col: str = "url"
) -> pa.Table:
    """map_batches kernel: adds ``host`` and ``canonical_url``."""
    host, canon = canonical_url(batch.column(url_col))
    return batch.append_column("host", host).append_column("canonical_url", canon)
