"""Stable, vectorized hashing for partitioning and content addressing.

The reference derives sink identity per record (M7: tx hash, tick
number, ``"{epoch}-{from}"``, K12 content hash —
``transactions-consumer/consume/transaction_consumer.go:118``,
``computors-consumer/consume/processor.go:146-173``).  Here the natural
key is ``url``; the partition key is a *stable* 64-bit hash of it so the
same url always lands in the same lake partition across processes,
epochs and cluster sizes (python's builtin ``hash`` is salted per
process and must never be used).

``pd.util.hash_array`` is the vectorized stable hash (siphash-1-3 with
a fixed key; documented-deterministic).  md5-based helpers exist where a
DuckDB oracle must reproduce the value exactly (DuckDB ``md5()``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_object_array(values) -> np.ndarray:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        return np.asarray(values.to_pandas(), dtype=object)
    return np.asarray(values, dtype=object)


def stable_hash64(values) -> np.ndarray:
    """Deterministic uint64 hash of a string column (vectorized)."""
    arr = _as_object_array(values)
    return pd.util.hash_array(arr, categorize=False)


def partition_for(values, num_partitions: int) -> np.ndarray:
    """Partition id in [0, num_partitions) for each value — THE shuffle
    key of the engine (SURVEY.md §7: the only required shuffle)."""
    return (stable_hash64(values) % np.uint64(num_partitions)).astype(np.int32)


def hash_and_partition(values, num_partitions: int) -> tuple[np.ndarray, np.ndarray]:
    """One hash pass -> (int64 url hash, partition id).  The hash is
    kept as a sort-accelerator column: sorting by (hash, url) compares
    long url strings only within hash-equal runs."""
    h = stable_hash64(values)
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return h.astype(np.int64), part


def md5_hex(s: str) -> str:
    """Hex md5 of a UTF-8 string; identical to DuckDB ``md5(s)``."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_hex_array(values) -> np.ndarray:
    arr = _as_object_array(values)
    out = np.empty(len(arr), dtype=object)
    for i, s in enumerate(arr):
        out[i] = hashlib.md5(s.encode("utf-8")).hexdigest()
    return out


def md5_hex_bytes_array(values) -> np.ndarray:
    """md5 of a binary column's lowercase-hex form — the DuckDB twin is
    ``md5(lower(hex(blob)))`` (DuckDB's md5 does not accept BLOB)."""
    arr = _as_object_array(values)
    out = np.empty(len(arr), dtype=object)
    for i, b in enumerate(arr):
        out[i] = hashlib.md5(bytes(b).hex().encode("ascii")).hexdigest()
    return out


def md5_int64(s: str) -> int:
    """First 15 hex digits of md5 as a non-negative int (fits int64).

    DuckDB equivalent: ``('0x' || substr(md5(s), 1, 15))::BIGINT`` —
    kept to 15 nibbles (60 bits) so both sides stay positive int64.
    """
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_int64_array(values) -> np.ndarray:
    arr = _as_object_array(values)
    out = np.empty(len(arr), dtype=np.int64)
    for i, s in enumerate(arr):
        out[i] = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    return out


def row_value_md5(t, cols: list[str]):
    """Row-wise md5 digest over the given columns (null-safe,
    type-tagged canonical serialization) — THE engine-wide payload
    identity: stored as the internal ``value_md5`` column by
    suppress-unchanged lakes, and used by both sides of the hash-mode
    distributed verify (pipelines/verify.py payload_md5_column
    delegates here), so the two always agree byte for byte.  The md5
    itself is C (hashlib) and dominates; the per-row loop is bounded
    per batch — no vectorized md5 exists in numpy/pyarrow (same
    measured-accepted justification as the dedup family's fingerprint
    kernels).  Returns a pyarrow string array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = t.num_rows
    if n == 0 or not cols:
        return pa.array([""] * n, pa.string())
    # name-sorted: the digest must not depend on schema column ORDER
    # (event files and base files may order the same value columns
    # differently)
    names = sorted(cols)
    arrs = [
        c.combine_chunks() if isinstance(c := t.column(nm), pa.ChunkedArray) else c
        for nm in names
    ]

    def _strish(dt):
        return pa.types.is_string(dt) or pa.types.is_large_string(dt)

    def _binish(dt):
        return pa.types.is_binary(dt) or pa.types.is_large_binary(dt)

    if all(_strish(a.type) or _binish(a.type) for a in arrs):
        # fast path (string/binary columns — the pages value set): the
        # serialization is built by Arrow C kernels into ONE binary per
        # row in a SINGLE join pass (scalar tags interleaved with the
        # value columns — per-column tag joins would each copy the full
        # payload), then the Python loop only feeds hashlib.
        # Bit-identical to the generic path below.
        #
        # Framing is netstring-style — tag, DECIMAL LENGTH, ':', value —
        # which decodes unambiguously, so the serialization is
        # INJECTIVE: no choice of values can shift a field boundary.
        # (A plain tag-delimited scheme is not — values may legally
        # contain the tag bytes; review finding, repro'd: ('1\x00S','2')
        # vs ('1','\x00S2') hashed equal and a suppress-unchanged lake
        # would silently drop that real update.)
        parts = []
        for a in arrs:
            tag = b"S" if _strish(a.type) else b"B"
            b = a.cast(pa.large_binary())
            lens = pc.cast(pc.binary_length(b), pa.string()).cast(pa.large_binary())
            if b.null_count:
                parts.append(
                    pc.if_else(
                        pc.is_valid(b),
                        pa.scalar(tag, pa.large_binary()),
                        pa.scalar(b"N", pa.large_binary()),
                    )
                )
                parts.append(pc.fill_null(lens, b""))
                parts.append(pa.scalar(b":", pa.large_binary()))
                parts.append(pc.fill_null(b, b""))
            else:
                parts.append(pa.scalar(tag, pa.large_binary()))
                parts.append(lens)
                parts.append(pa.scalar(b":", pa.large_binary()))
                parts.append(b)
        serialized = pc.binary_join_element_wise(
            *parts, pa.scalar(b"", pa.large_binary())
        )
        if isinstance(serialized, pa.ChunkedArray):
            serialized = serialized.combine_chunks()
        # hash straight off the Arrow buffer (no per-row bytes objects);
        # serialized has no nulls by construction (if_else filled them)
        offs = np.frombuffer(serialized.buffers()[1], dtype=np.int64)[
            serialized.offset : serialized.offset + n + 1
        ]
        mv = memoryview(serialized.buffers()[2])
        md5 = hashlib.md5
        return pa.array(
            [md5(mv[offs[i] : offs[i + 1]]).hexdigest() for i in range(n)],
            pa.string(),
        )

    pylists = [a.to_pylist() for a in arrs]
    out = []
    for i in range(n):
        h = hashlib.md5()
        for col in pylists:
            v = col[i]
            if v is None:
                h.update(b"N:")
            elif isinstance(v, bytes):
                h.update(b"B%d:" % len(v))
                h.update(v)
            else:
                enc = str(v).encode()
                h.update(b"S%d:" % len(enc))
                h.update(enc)
        out.append(h.hexdigest())
    return pa.array(out, pa.string())
