"""URL canonicalization + host extraction (web-corpus source keys).

The first dedup any crawl pipeline runs is URL-level: the same page is
fetched under `http://WWW.Site.com/p/1?utm_source=feed#frag` and
`https://site.com/p/1`, and dup-pair recall starts with collapsing those
to one canonical key. The reference has no URL layer (filesystem paths
are its keys); this module is the pages-table analog of its path
normalization, built for the `url:string` column of the input schema
(BASELINE.json:15).

Design constraint: every transform is expressed as an ordered list of
RE2 regex rewrites (`_REPLACES`) plus one scheme/host case-fold step.
Both pyarrow.compute (`replace_substring_regex`) and DuckDB
(`regexp_replace(..., 'g')`) run RE2 with `\\1`-style rewrites, so the
SAME spec compiles to the vectorized Arrow kernel (`canonicalize_urls`)
AND to the equivalent SQL expression (`canonicalize_sql`) — the oracle
can't drift from the engine because there is one source of truth.

Canonicalization steps (order matters):
  1. strip the fragment (`#...`)
  2. case-fold scheme + authority (path/query stay case-sensitive)
  3. strip a leading `www.` from the host
  4. strip default ports (`:80` on http, `:443` on https)
  5. fold `http://` to `https://` (AFTER port stripping, which is
     scheme-keyed) — the same page refetched across an HTTPS migration
     is the module's motivating dup pair, and scheme-variant fetches of
     genuinely different content are vanishingly rare on the modern web
  6. strip tracking params (utm_*, fbclid, gclid, msclkid) wherever
     they sit in the query string
  7. strip a dangling `?` and a bare root `/`
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://authority prefix (group 1) + the rest (group 2); RE2-safe.
_PREFIX_RE = r"^(?P<pre>[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)(?P<rest>[/?#].*)?$"

_TRACK = r"utm_[^=&#]*|fbclid|gclid|msclkid"

# Ordered (pattern, rewrite) pairs applied AFTER the case-fold step.
# RE2 'g' rewrites on both sides; no lookarounds (RE2 has none).
_REPLACES_POST: list[tuple[str, str]] = [
    (r"^(https?://)www\.", r"\1"),
    (r"^(http://[^/?#:]+):80([/?#].*)?$", r"\1\2"),
    (r"^(https://[^/?#:]+):443([/?#].*)?$", r"\1\2"),
    (r"^http://", "https://"),
    (rf"&(?:{_TRACK})=[^&#]*", ""),
    (rf"\?(?:{_TRACK})=[^&#]*&", "?"),
    (rf"\?(?:{_TRACK})=[^&#]*$", ""),
    (r"\?$", ""),
    (r"^([a-z][a-z0-9+.\-]*://[^/?#]+)/$", r"\1"),
]

_FRAGMENT = (r"#.*$", "")

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?(?P<host>[^/?#:]*).*$"


def _fold_prefix(arr: pa.ChunkedArray | pa.Array):
    """Lowercase the scheme://authority prefix, leave path/query as-is.
    Rows that don't parse as absolute URLs pass through unchanged."""
    m = pc.extract_regex(arr, _PREFIX_RE)
    prefix = pc.utf8_lower(pc.struct_field(m, "pre"))
    rest = pc.fill_null(pc.struct_field(m, "rest"), "")
    folded = pc.binary_join_element_wise(prefix, rest, "")
    return pc.if_else(pc.is_valid(folded), folded, arr)


def canonicalize_urls(arr: pa.ChunkedArray | pa.Array):
    """Vectorized canonical form of a string URL column (see module doc).
    Pure Arrow kernels — no Python per row."""
    out = pc.replace_substring_regex(
        arr, pattern=_FRAGMENT[0], replacement=_FRAGMENT[1]
    )
    out = _fold_prefix(out)
    for pat, rew in _REPLACES_POST:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=rew)
    return out


def host_of(arr: pa.ChunkedArray | pa.Array):
    """Registrable host of each URL (lowercased, sans port/userinfo/www);
    null where the row is not an absolute URL."""
    folded = _fold_prefix(
        pc.replace_substring_regex(
            arr, pattern=_FRAGMENT[0], replacement=_FRAGMENT[1]
        )
    )
    host = pc.struct_field(pc.extract_regex(folded, _HOST_RE), "host")
    return pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")


def _sql_escape(pattern: str) -> str:
    # DuckDB single-quoted strings are RAW (no backslash processing):
    # only quotes need doubling; doubling backslashes would corrupt the
    # RE2 pattern/rewrite.
    return pattern.replace("'", "''")


def canonicalize_sql(expr: str) -> str:
    """DuckDB SQL expression equivalent to :func:`canonicalize_urls` over
    ``expr`` — generated from the SAME spec list, so the oracle and the
    Arrow kernel cannot drift."""
    out = (
        f"regexp_replace({expr}, '{_sql_escape(_FRAGMENT[0])}', '', 'g')"
    )
    # case-fold scheme://authority, keep the rest
    pre = _sql_escape(_PREFIX_RE)
    out = (
        f"CASE WHEN regexp_matches({out}, '{pre}') THEN "
        f"lower(regexp_extract({out}, '{pre}', 1)) || "
        f"coalesce(regexp_extract({out}, '{pre}', 2), '') "
        f"ELSE {out} END"
    )
    for pat, rew in _REPLACES_POST:
        out = (
            f"regexp_replace({out}, '{_sql_escape(pat)}', "
            f"'{_sql_escape(rew)}', 'g')"
        )
    return out


def host_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`host_of` over ``expr``."""
    frag = (
        f"regexp_replace({expr}, '{_sql_escape(_FRAGMENT[0])}', '', 'g')"
    )
    pre = _sql_escape(_PREFIX_RE)
    folded = (
        f"CASE WHEN regexp_matches({frag}, '{pre}') THEN "
        f"lower(regexp_extract({frag}, '{pre}', 1)) || "
        f"coalesce(regexp_extract({frag}, '{pre}', 2), '') "
        f"ELSE {frag} END"
    )
    host = _sql_escape(_HOST_RE)
    return (
        f"regexp_replace(CASE WHEN regexp_matches({folded}, '{host}') "
        f"THEN regexp_extract({folded}, '{host}', 1) ELSE NULL END, "
        f"'^www\\.', '', 'g')"
    )


def surt_of(arr: "pa.ChunkedArray | pa.Array"):
    """Urls -> SURT keys (Sort-friendly URI Reordering Transform — the
    key real CDX files sort by, grouping a domain's subdomains
    contiguously): reversed host labels joined with commas, then
    ``)/path`` lowercased, query dropped. ``com,example,www)/dir/page``.
    Unparseable urls -> ''. Pure string work per url (metadata-sized
    stage — runs on index rows, never page payloads)."""
    import re as _re

    out = []
    for u in arr.to_pylist():
        m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)([^?#]*)", u or "")
        if not m:
            out.append("")
            continue
        host = m.group(1).lower()
        if "@" in host:
            host = host.rpartition("@")[2]
        if not host.endswith("]") and ":" in host:
            host = host.rpartition(":")[0]
        path = (m.group(2) or "/").lower() or "/"
        out.append(",".join(reversed(host.split("."))) + ")" + path)
    return pa.array(out, pa.string())


def surt_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`surt_of` over ``expr`` (no
    userinfo/port handling — fixture urls carry neither)."""
    host = (
        f"regexp_replace(lower(regexp_extract({expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), ':[0-9]+$', '')"
    )
    path = f"lower(coalesce(nullif(regexp_extract({expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1), ''), '/'))"
    return (
        f"CASE WHEN regexp_matches({expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://') "
        f"THEN array_to_string(list_reverse(string_split({host}, '.')), ',') "
        f"|| ')' || {path} ELSE '' END"
    )
