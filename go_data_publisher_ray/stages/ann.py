"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the exact baseline — a broadcast query
  matrix (``ray.put`` once, read per task) against per-batch numpy
  matmuls, then a per-query global top-k reduce.  No shuffle of the
  embedding table itself; only (Q x k) candidate rows move per batch.
- IVF-style cell assignment: the scale path — vectors are bucketed by
  nearest centroid; searches and pairwise dedup then run within cells
  only (documented approximation).

Cosine matches DuckDB ``list_cosine_similarity`` (double precision
dot/(|a||b|)) so oracles replicate values exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def fixed_len_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """Zero-copy-ish (values buffer) list<float> -> (n, d) float64."""
    arr = col.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0))
    d = len(arr[0])
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, d).astype(np.float64)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor-pool map_batches stage: per batch, cosine of all batch
    vectors vs the broadcast query matrix; emits each query's local
    top-k candidates.  A tiny per-query global reduce finishes the job.

    The query matrix is fetched from the object store ONCE per actor
    (``__init__``), not per batch — the broadcast-small-side pattern.
    """

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)  # dict: {"ids": (Q,), "matrix": (Q, d)}
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.qmat = normalize_rows(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mat = normalize_rows(fixed_len_matrix(batch.column("embedding")))
        sims = mat @ self.qmat.T  # (n, Q)
        out_q: list[int] = []
        out_n: list[int] = []
        out_s: list[float] = []
        k = min(self.k + 1, len(vids))  # +1 to survive self-match removal
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            # deterministic pruning: ties at the k-boundary are broken
            # by vec_id asc, matching the oracle's ORDER BY (sim DESC,
            # vec_id ASC) — an argpartition cut could drop the
            # smaller-id member of an exact tie before the reduce
            idx = np.lexsort((vids, -col))[:k]
            for i in idx:
                if vids[i] != qid:
                    out_q.append(int(qid))
                    out_n.append(int(vids[i]))
                    out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def topk_reduce(group: pa.Table, *, k: int) -> pa.Table:
    """map_groups UDF: per query keep k best (sim desc, neighbor asc)
    and assign 1-based ranks."""
    sims = group.column("sim").to_numpy(zero_copy_only=False)
    nbrs = group.column("neighbor_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((nbrs, -sims))[:k]
    qid = group.column("query_id")[0].as_py()
    return pa.table(
        {
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "neighbor_id": pa.array(nbrs[order]),
        }
    )


# Random-hyperplane LSH: 16 fixed seeded hyperplanes (values rounded so
# a SQL oracle can embed them as exact literals).  Vectors sharing the
# full 16-bit sign code are near-dup candidates — the embedding analog
# of SimHash banding; buckets via groupby, never all-pairs.
_hp_rng = np.random.Generator(np.random.Philox(key=[13, 0]))
LSH_DIM = 64
N_HYPERPLANES = 16
HYPERPLANES: np.ndarray = np.round(
    _hp_rng.normal(size=(N_HYPERPLANES, LSH_DIM)), 6
)


def lsh_codes(batch: pa.Table) -> pa.Table:
    """map_batches UDF: (vec_id, embedding) -> (vec_id, lsh_code) with
    code bit i = 1 iff <embedding, hyperplane_i> > 0 (double math)."""
    vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    mat = fixed_len_matrix(batch.column("embedding"))
    proj = mat @ HYPERPLANES.T  # (n, 16)
    bits = (proj > 0).astype(np.int64)
    codes = (bits << np.arange(N_HYPERPLANES, dtype=np.int64)[None, :]).sum(axis=1)
    return pa.table({"vec_id": pa.array(vids, pa.int64()), "lsh_code": pa.array(codes)})


class CellAssigner:
    """Actor-pool stage: assign each vector to its nearest (max-cosine)
    centroid; centroids broadcast once per actor."""

    def __init__(self, centroids_ref):
        import ray

        c = ray.get(centroids_ref)
        self.cids = np.asarray(c["ids"], dtype=np.int64)
        self.cmat = normalize_rows(np.asarray(c["matrix"], dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = normalize_rows(fixed_len_matrix(batch.column("embedding")))
        sims = mat @ self.cmat.T
        best = np.argmax(sims, axis=1)
        return batch.append_column("cell_id", pa.array(self.cids[best], pa.int64()))


def cosine_pairs_in_cell(group: pa.Table, *, threshold: float) -> pa.Table:
    """map_groups UDF: all pairs within one IVF cell with cosine >=
    threshold (a<b) — embedding near-dup, blocked by cell."""
    ids = group.column("vec_id").to_numpy(zero_copy_only=False)
    mat = normalize_rows(fixed_len_matrix(group.column("embedding")))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    sims = mat @ mat.T
    a, b = np.triu_indices(len(ids), k=1)
    keep = sims[a, b] >= threshold
    return pa.table(
        {
            "doc_a": pa.array(ids[a][keep], pa.int64()),
            "doc_b": pa.array(ids[b][keep], pa.int64()),
        }
    )
