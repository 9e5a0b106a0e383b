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
