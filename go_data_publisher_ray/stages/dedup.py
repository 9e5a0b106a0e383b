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
from ..functions.text import whitespace_tokens, word_ngrams

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


def shingle_table(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> pa.Table:
    """Explode docs to distinct (doc_id, shingle) rows — the inverted-
    index build for Jaccard/MinHash.  map_batches UDF."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids: list[int] = []
    out_sh: list[str] = []
    for i, t in zip(ids, texts):
        sh = word_ngrams(t, n)
        out_ids.extend([i] * len(sh))
        out_sh.extend(sorted(sh))
    return pa.table({"doc_id": pa.array(out_ids, pa.int64()), "shingle": pa.array(out_sh)})


def pairs_from_posting(group: pa.Table, *, max_posting: int = 10_000) -> pa.Table:
    """map_groups UDF over one shingle's posting list -> co-occurring
    doc pairs (a<b).  ``max_posting`` guards against degenerate stop-
    shingles blowing up quadratically (the posting is dropped and the
    truncation is visible in the 'dropped' marker rows)."""
    ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
    if len(ids) < 2 or len(ids) > max_posting:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    a, b = np.triu_indices(len(ids), k=1)
    return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})


def minhash_signatures(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> pa.Table:
    """map_batches UDF: doc -> (doc_id, band, h0, h1) rows (one per LSH
    band).  Signature = min over shingle ids of (id XOR key_p)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    keys = np.array(XOR_KEYS, dtype=np.int64)
    out_id: list[int] = []
    out_band: list[int] = []
    out_h0: list[int] = []
    out_h1: list[int] = []
    for i, t in zip(ids, texts):
        sh = sorted(word_ngrams(t, n))
        if not sh:
            continue
        sh_ids = md5_int64_array(sh)  # (S,)
        sig = np.bitwise_xor(sh_ids[:, None], keys[None, :]).min(axis=0)  # (P,)
        for band in range(N_BANDS):
            out_id.append(i)
            out_band.append(band)
            out_h0.append(int(sig[band * BAND_ROWS]))
            out_h1.append(int(sig[band * BAND_ROWS + 1]))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int64()),
            "h0": pa.array(out_h0, pa.int64()),
            "h1": pa.array(out_h1, pa.int64()),
        }
    )


def simhash_fingerprints(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """map_batches UDF: doc -> 60-bit SimHash over distinct whitespace
    tokens (bit b set iff sum over tokens of sign((h>>b)&1) > 0)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    out = np.empty(len(ids), dtype=np.int64)
    for row, t in enumerate(texts):
        toks = sorted(set(whitespace_tokens(t)))
        if not toks:
            out[row] = 0
            continue
        h = md5_int64_array(toks)  # (T,)
        bits = (h[:, None] >> shifts[None, :]) & 1  # (T, 60)
        votes = (2 * bits - 1).sum(axis=0)
        out[row] = int(((votes > 0).astype(np.int64) << shifts).sum())
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(out)})


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


def hamming_pairs_from_bucket(group: pa.Table, *, max_hamming: int) -> pa.Table:
    """map_groups UDF over one (chunk,val) bucket: verified near-dup
    pairs with popcount(xor) <= max_hamming."""
    sub = group.select(["doc_id", "simhash"])
    order = np.argsort(sub.column("doc_id").to_numpy(zero_copy_only=False))
    ids = sub.column("doc_id").to_numpy(zero_copy_only=False)[order]
    fps = sub.column("simhash").to_numpy(zero_copy_only=False)[order]
    uniq, first = np.unique(ids, return_index=True)
    ids, fps = uniq, fps[first]
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
    ham = np.vectorize(lambda v: bin(v & ((1 << 63) - 1)).count("1"))(x).astype(np.int64)
    keep = ham <= max_hamming
    return pa.table(
        {
            "doc_a": pa.array(ids[a][keep]),
            "doc_b": pa.array(ids[b][keep]),
            "hamming": pa.array(ham[keep]),
        }
    )
