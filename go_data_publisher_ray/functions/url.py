"""URL canonicalization — the web-CDC key normalizer.

At crawl scale the same page arrives under spelling variants
(``HTTP://Example.com:80/a#frag`` vs ``http://example.com/a``); if the
upsert key is the raw string, variants land in different partitions and
the lake keeps duplicate rows per logical page.  Canonicalizing the key
at ingest (BEFORE the partition hash) makes variants co-locate and
merge — the analog of the reference keying Kafka messages by a stable
identity rather than the wire form
(``computors-publisher/kafka/producer.go:40-42``).

Canonical form (deliberately conservative — only transforms that
preserve URL semantics per RFC 3986 §6.2.2-6.2.3):

- applies only to absolute URLs (``scheme://authority...``); any other
  string passes through byte-identical;
- the fragment (``#...``) is stripped (never sent to the server);
- scheme and host are ASCII-lowercased (case-insensitive per spec;
  userinfo, path and query are case-SENSITIVE and untouched — the
  host is everything after the authority's last ``@``);
- the default port is dropped from the host (``http://h:80`` ->
  ``http://h``, ``https://h:443`` -> ``https://h``; IPv6 literals and
  userinfo containing ``:`` are handled).

The transform is idempotent (canon(canon(x)) == canon(x)) — required
because replicated feeds re-apply already-canonical rows through the
same ingest stage.

``canonicalize_url`` (scalar, pure Python) is the semantic spec;
``canonicalize_urls`` is the vectorized Arrow twin used in the hot
path (four RE2/C kernels per batch, no Python row loop).  Parity is
asserted in tests/test_url_canonical.py over the edge battery.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# scheme://authority split: authority = everything up to the first /, ?
# or # after ://; host = authority after its LAST @ (RFC 3986 — raw @
# is illegal in userinfo, and last-@ is also what browsers parse on
# dirty input).
_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://(?:([^/?#]*)@)?([^/?#@]*)([\s\S]*)$"
)
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def _ascii_lower(s: str) -> str:
    """ASCII-only lowercase — the scalar twin of Arrow's ascii_lower
    (str.lower() would also map non-ASCII letters and disagree)."""
    return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s)


def canonicalize_url(url: str | None) -> str | None:
    """Scalar reference implementation (the spec; see module docstring)."""
    if url is None:
        return None
    nofrag = url.split("#", 1)[0]
    m = _URL_RE.match(nofrag)
    if m is None:
        return url  # not an absolute URL: byte-identical pass-through
    scheme, user, host, rest = m.groups()
    scheme = _ascii_lower(scheme)
    host = _ascii_lower(host)
    dport = _DEFAULT_PORT.get(scheme)
    # fixpoint strip: dirty input like 'h:80:80' must collapse in ONE
    # pass, or canon(canon(x)) != canon(x) and replica re-apply (which
    # normalizes again) would diverge from the source key
    while dport and host.endswith(dport):
        host = host[: -len(dport)]
    user = f"{user}@" if user is not None else ""
    return f"{scheme}://{user}{host}{rest}"


def canonicalize_urls(col) -> pa.Array | pa.ChunkedArray:
    """Vectorized twin of ``canonicalize_url`` over a string column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    nofrag = pc.replace_substring_regex(col, pattern=r"#[\s\S]*", replacement="")
    ex = pc.extract_regex(
        nofrag,
        pattern=(
            r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
            r"(?P<user>[^/?#]*@)?(?P<host>[^/?#@]*)(?P<rest>[\s\S]*)$"
        ),
    )
    scheme = pc.ascii_lower(pc.struct_field(ex, "scheme"))
    host = pc.ascii_lower(pc.struct_field(ex, "host"))
    # default-port strip on the host alone (userinfo with ':' and IPv6
    # bracket literals never confuse it), conditioned on the scheme;
    # (:80)+ not :80 — see the fixpoint note in canonicalize_url
    h80 = pc.replace_substring_regex(host, pattern=r"(:80)+$", replacement="")
    h443 = pc.replace_substring_regex(host, pattern=r"(:443)+$", replacement="")
    host = pc.if_else(
        pc.equal(scheme, "http"),
        h80,
        pc.if_else(pc.equal(scheme, "https"), h443, host),
    )
    canon = pc.binary_join_element_wise(
        scheme, "://", pc.struct_field(ex, "user"), host,
        pc.struct_field(ex, "rest"), "",
    )
    # non-absolute-URL rows (extract miss): original bytes, fragment kept
    return pc.if_else(pc.is_valid(ex), canon, col)


# Registry consumed by MergeSpec.key_normalizer: the lake persists the
# NAME (lake.json), every stage resolves it here — so ingest, verify
# oracles, replica apply and point lookups all share one definition.
KEY_NORMALIZERS = {"url_canonical": canonicalize_urls}


def normalize_keys(keys: list, normalizer: str) -> list:
    """Normalize a Python key list (point lookups, erasure requests)
    through the named normalizer — same clear-error contract as
    ``normalize_key_column`` (an unknown name from a newer build's
    lake.json fails with the known-names message, not a KeyError)."""
    fn = KEY_NORMALIZERS.get(normalizer)
    if fn is None:
        raise ValueError(
            f"unknown key_normalizer {normalizer!r} "
            f"(known: {sorted(KEY_NORMALIZERS)})"
        )
    return fn(pa.array(keys)).to_pylist()


def normalize_key_column(table: pa.Table, col_name: str, normalizer: str) -> pa.Table:
    """Replace ``col_name`` with its normalized form (shared helper for
    the ingest stage and the verify oracles).  Fails with a clear
    message on an unknown normalizer name or a non-string key column —
    otherwise the error would surface as an opaque Arrow kernel
    dispatch failure deep inside a Ray worker."""
    fn = KEY_NORMALIZERS.get(normalizer)
    if fn is None:
        raise ValueError(
            f"unknown key_normalizer {normalizer!r} "
            f"(known: {sorted(KEY_NORMALIZERS)})"
        )
    col = table.column(col_name)
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        raise TypeError(
            f"key_normalizer {normalizer!r} needs a string key column; "
            f"{col_name!r} is {col.type}"
        )
    idx = table.schema.get_field_index(col_name)
    return table.set_column(idx, table.schema.field(idx), fn(col))
