"""Deduplication stages: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine.  The reference's dedup is exact/key-based only
(``_id`` overwrite + checksum filters, SURVEY.md §2.8); these extend it
to the near-dup family a 100 TB training-data pipeline needs.

Every stage is expressed as Ray Data transforms that scale by
*blocking* (shingle inverted index, LSH band buckets, simhash chunks,
IVF cells) instead of O(n^2) all-pairs; the only shuffles are
``groupby`` on the blocking key.  Numeric choices (md5-derived 60-bit
token ids, xor-family MinHash, 60-bit SimHash) are made so a DuckDB
oracle can reproduce every value exactly (see queries.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_int64_array
from ..functions.text import distinct_tokens_by_row, flat_word_ngrams

# --- MinHash ----------------------------------------------------------
# xor-family "permutations": h_i(x) = x XOR XOR_KEYS[i], minimized over
# a doc's shingle ids.  Weaker than affine perms but exactly
# reproducible in int64 SQL (no overflow) — the scale behavior (band
# blocking, signature size) is identical.
# 16 fixed 60-bit keys from one seeded draw (numpy Philox, seed 7).
_key_rng = np.random.Generator(np.random.Philox(key=[7, 0]))
XOR_KEYS: tuple[int, ...] = tuple(
    int(x) for x in _key_rng.integers(0, 1 << 60, size=16, dtype=np.int64)
)
N_PERM = len(XOR_KEYS)
BAND_ROWS = 2  # 8 bands of 2 rows
N_BANDS = N_PERM // BAND_ROWS

SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4  # 4 x 15-bit chunks; hamming<=3 => >=1 chunk equal
_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS

# 16-bit popcount lookup (numpy 1.x has no bitwise_count)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of non-negative int64 values (LUT in 16-bit
    slices)."""
    v = x.astype(np.uint64)
    m = np.uint64(0xFFFF)
    return (
        _POP16[(v & m).astype(np.int64)]
        + _POP16[((v >> np.uint64(16)) & m).astype(np.int64)]
        + _POP16[((v >> np.uint64(32)) & m).astype(np.int64)]
        + _POP16[((v >> np.uint64(48)) & m).astype(np.int64)]
    ).astype(np.int64)


def shingle_table(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> pa.Table:
    """Explode docs to distinct (doc_id, shingle) rows — the inverted-
    index build for Jaccard/MinHash.  map_batches UDF.

    Vectorized (r5): one `flat_word_ngrams` Arrow pass per batch — the
    grams are materialized ONCE as a dictionary + (row, code) pairs, so
    this is a split + join + take, no per-row Python (2.0x over the
    per-row `word_ngrams` loop it replaced; tools/bench_text_kernels.py)."""
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids_np = ids.to_numpy(zero_copy_only=False)
    rows, dic, codes = flat_word_ngrams(batch.column(text_col), n)
    return pa.table(
        {
            "doc_id": pa.array(ids_np[rows]),
            "shingle": dic.take(pa.array(codes)),
        }
    )


def pairs_from_posting(group: pa.Table, *, max_posting: int = 10_000) -> pa.Table:
    """map_groups UDF over one shingle's posting list -> co-occurring
    doc pairs (a<b).  ``max_posting`` guards against degenerate stop-
    shingles blowing up quadratically: an oversized posting emits a
    MARKER row ``(doc_a=-1, doc_b=<posting size>)`` instead of pairs, so
    the truncation is visible downstream (callers filter ``doc_a >= 0``
    and may count/log the markers) rather than silently read as
    'covered'.  The DuckDB oracles have no cap — the cap is an
    engine-only scale guard, only reachable on degenerate stop-shingle
    data (documented in the query docstrings)."""
    ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
    if len(ids) > max_posting:
        return pa.table(
            {"doc_a": pa.array([-1], pa.int64()), "doc_b": pa.array([len(ids)], pa.int64())}
        )
    if len(ids) < 2:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    a, b = np.triu_indices(len(ids), k=1)
    return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})


def attach_size(group: pa.Table, *, out_col: str) -> pa.Table:
    """map_groups UDF of the bucketed size join: the group (one doc key)
    holds exactly one size row (sentinel ``inter == -1``, size in
    ``sz``) plus this key's pair rows; returns the pair rows with the
    size attached as ``out_col``.  This replaces a driver-side
    take_all + broadcast-dict — the per-doc size table never leaves the
    cluster, so the join scales to 10^9 docs (VERDICT r1 "What's wrong"
    #5)."""
    inter = group.column("inter").to_numpy(zero_copy_only=False)
    is_size = inter == -1
    sz_vals = group.column("sz").to_numpy(zero_copy_only=False)[is_size]
    pairs = group.filter(pa.array(~is_size)).drop_columns(["sz"])
    if pairs.num_rows == 0:
        return pairs.append_column(out_col, pa.array([], pa.int64()))
    if len(sz_vals) == 0:
        raise RuntimeError("pair rows present for a doc with no size row")
    return pairs.append_column(
        out_col, pa.array(np.full(pairs.num_rows, sz_vals[0], dtype=np.int64))
    )


def minhash_signatures(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> pa.Table:
    """map_batches UDF: doc -> (doc_id, band, h0, h1) rows (one per LSH
    band).  Signature = min over shingle ids of (id XOR key_p).

    Vectorized end to end (r5): shingling is ONE `flat_word_ngrams`
    Arrow pass (split + join C kernels, distinct (row, code) pairs),
    md5 runs only over the batch's UNIQUE shingles (the dictionary —
    hot shingles repeat across docs), and per-doc minima come from one
    ``np.minimum.reduceat`` over the (shingles x perms) xor matrix —
    no per-row Python anywhere (tools/bench_text_kernels.py)."""
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids_np = ids.to_numpy(zero_copy_only=False)
    rows, dic, codes = flat_word_ngrams(batch.column(text_col), n)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "band": pa.array([], pa.int64()),
            "h0": pa.array([], pa.int64()),
            "h1": pa.array([], pa.int64()),
        }
    )
    if len(rows) == 0:
        return empty
    sh_ids = md5_int64_array(dic)[codes]  # (S,) md5 over uniques only
    keys = np.array(XOR_KEYS, dtype=np.int64)
    x = np.bitwise_xor(sh_ids[:, None], keys[None, :])  # (S, P)
    urows, starts = np.unique(rows, return_index=True)  # rows is sorted
    sig = np.minimum.reduceat(x, starts, axis=0)  # (D, P)
    sigb = sig.reshape(len(urows), N_BANDS, BAND_ROWS)
    d = ids_np[urows]
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(d, N_BANDS)),
            "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int64), len(d))),
            "h0": pa.array(sigb[:, :, 0].ravel()),
            "h1": pa.array(sigb[:, :, 1].ravel()),
        }
    )


def simhash_fingerprints(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """map_batches UDF: doc -> 60-bit SimHash over distinct whitespace
    tokens (bit b set iff sum over tokens of sign((h>>b)&1) > 0).

    Batch-vectorized end to end (r5): distinct tokens per row come from
    ONE `distinct_tokens_by_row` Arrow pass (split + dictionary-encode
    + integer-unique — 2.7x over the per-row set(split) loop it
    replaced, tools/bench_text_kernels.py), md5 runs only for the
    batch's unique tokens, bit votes summed per doc with one
    ``np.add.reduceat`` over the (tokens x bits) sign matrix."""
    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    out = np.zeros(batch.num_rows, dtype=np.int64)
    rows, dic, codes = distinct_tokens_by_row(batch.column(text_col))
    if len(rows):
        h = md5_int64_array(dic)[codes]  # (T,) md5 over uniques only
        signs = (((h[:, None] >> shifts[None, :]) & 1) * 2 - 1)  # (T, 60)
        urows, starts = np.unique(rows, return_index=True)  # rows sorted
        votes = np.add.reduceat(signs, starts, axis=0)  # (D, 60)
        out[urows] = ((votes > 0).astype(np.int64) << shifts[None, :]).sum(axis=1)
    return pa.table(
        {
            "doc_id": batch.column(id_col).cast(pa.int64()),
            "simhash": pa.array(out),
        }
    )


def simhash_chunks(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) -> (doc_id, simhash, chunk, val) x4: pigeonhole
    blocking for hamming<=3 candidate generation."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    fps = batch.column("simhash").to_numpy(zero_copy_only=False)
    n = len(ids)
    chunk = np.repeat(np.arange(SIMHASH_CHUNKS, dtype=np.int64), n)
    rid = np.tile(ids, SIMHASH_CHUNKS)
    rfp = np.tile(fps, SIMHASH_CHUNKS)
    val = (rfp >> (chunk * _CHUNK_BITS)) & ((1 << _CHUNK_BITS) - 1)
    return pa.table(
        {"doc_id": pa.array(rid), "simhash": pa.array(rfp), "chunk": pa.array(chunk), "val": pa.array(val)}
    )


def hamming_pairs_from_bucket(
    group: pa.Table, *, max_hamming: int, max_bucket: int = 10_000
) -> pa.Table:
    """map_groups UDF over one (chunk,val) bucket: verified near-dup
    pairs with popcount(xor) <= max_hamming.

    ``max_bucket`` guards the ``np.triu_indices`` blow-up on a
    degenerate bucket (thousands of identical / near-empty docs sharing
    one 15-bit chunk value) — the same cap+marker pattern as
    ``pairs_from_posting``: an oversized bucket emits ONE marker row
    ``(doc_a=-1, doc_b=<bucket size>, hamming=-1)`` instead of pairs, so
    callers can filter ``doc_a >= 0`` and surface the truncation."""
    sub = group.select(["doc_id", "simhash"])
    order = np.argsort(sub.column("doc_id").to_numpy(zero_copy_only=False))
    ids = sub.column("doc_id").to_numpy(zero_copy_only=False)[order]
    fps = sub.column("simhash").to_numpy(zero_copy_only=False)[order]
    uniq, first = np.unique(ids, return_index=True)
    ids, fps = uniq, fps[first]
    if len(ids) > max_bucket:
        return pa.table(
            {
                "doc_a": pa.array([-1], pa.int64()),
                "doc_b": pa.array([len(ids)], pa.int64()),
                "hamming": pa.array([-1], pa.int64()),
            }
        )
    if len(ids) < 2:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
    a, b = np.triu_indices(len(ids), k=1)
    x = np.bitwise_xor(fps[a], fps[b])
    ham = popcount64(x)
    keep = ham <= max_hamming
    return pa.table(
        {
            "doc_a": pa.array(ids[a][keep]),
            "doc_b": pa.array(ids[b][keep]),
            "hamming": pa.array(ham[keep]),
        }
    )
