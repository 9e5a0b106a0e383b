"""Versioned store for trained models (IVF centroids, LSH planes):
train-once-serve-many made DURABLE, not just per-process.

The reference keeps its long-lived derived state in external stores
(ES indices, pebble checkpoints); the engine's equivalent for trained
ANN models is a small versioned parquet file per model under a shared
directory — on a cluster this is the lake's shared storage, so any
node serves queries with zero training passes once one node trained.

Layout (all writes are write-temp-then-atomic-rename):

    <root>/<name>/v{N:06d}.parquet   # the model's table form
    <root>/<name>/v{N:06d}.json      # provenance meta; MUST match on load

``root`` defaults to ``$GDP_MODEL_DIR`` or ``/tmp/gdp_ray_models``.
``load`` validates the caller's expected provenance (source file
identity, hyper-parameters, trainer version) against the stored meta —
a stale model for regenerated source data is ignored, not served.
Versions are append-only; the latest valid one wins (concurrent
identical trainers race benignly: both write, last rename wins with
identical content — the same idempotent-overwrite convention as the
manifest log).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from .storage import get_storage
from .manifest import atomic_write_json, read_json


def _meta_within(stored: dict, expect: dict, staleness: dict | None) -> bool:
    """Exact-match unless ``staleness`` grants a key drift (see
    ``ModelStore.load``).  Key sets must always agree — a model saved
    with different provenance fields is a different trainer."""
    if not staleness:
        return stored == expect
    if stored.keys() != expect.keys():
        return False
    for k, want in expect.items():
        have = stored[k]
        if k not in staleness:
            if have != want:
                return False
            continue
        tol = staleness[k]
        if tol is None:
            continue
        if not isinstance(have, (int, float)) or not isinstance(want, (int, float)):
            return False
        if abs(have - want) > tol * max(abs(want), 1):
            return False
    return True


class ModelStore:
    def __init__(self, root: str | None = None):
        self.root = (
            root
            or os.environ.get("GDP_MODEL_DIR")
            or os.path.join(tempfile.gettempdir(), "gdp_ray_models")
        )

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def versions(self, name: str) -> list[int]:
        d = self._dir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith("v") and f.endswith(".parquet"):
                out.append(int(f[1:-len(".parquet")]))
        return sorted(out)

    def load(
        self,
        name: str,
        expect_meta: dict | None = None,
        *,
        staleness: dict | None = None,
    ) -> tuple[pa.Table, dict] | None:
        """Newest version whose stored meta matches ``expect_meta``
        (ignoring the store-added ``version`` key); None when nothing
        (valid) is stored.

        ``staleness`` is the drift policy: without it the match is
        exact (a regenerated source invalidates every stored version —
        correct but retrains from scratch on any lake growth).  With it,
        the named meta keys may drift: ``{key: None}`` ignores the key
        entirely, ``{key: rel_tol}`` accepts a numeric stored value
        within ``rel_tol`` RELATIVE to the expected one (so e.g.
        ``{"rows": 0.05, "mtime_ns": None}`` serves a model trained on a
        source within 5% of today's row count, no matter when it was
        written).  Keys absent from ``staleness`` still match exactly.
        Versions are scanned newest-first, so once a caller retrains and
        saves against the grown source, the fresh version wins over any
        stale-but-tolerated one."""
        for v in reversed(self.versions(name)):
            meta_path = os.path.join(self._dir(name), f"v{v:06d}.json")
            if not os.path.exists(meta_path):
                continue  # crashed between parquet and meta: not committed
            meta = read_json(meta_path)
            stored = {k: x for k, x in meta.items() if k != "version"}
            if expect_meta is not None and not _meta_within(
                stored, expect_meta, staleness
            ):
                continue
            t = pq.read_table(os.path.join(self._dir(name), f"v{v:06d}.parquet"))
            return t, meta

    def save(self, name: str, table: pa.Table, meta: dict) -> int:
        """Append a new version; the meta json rename is the commit."""
        d = self._dir(name)
        os.makedirs(d, exist_ok=True)
        v = (self.versions(name)[-1] + 1) if self.versions(name) else 1
        ppath = os.path.join(d, f"v{v:06d}.parquet")
        tmp = f"{ppath}.tmp-{os.getpid()}"
        pq.write_table(table, tmp, compression="zstd")
        get_storage().finalize_file(tmp, ppath)
        atomic_write_json(
            os.path.join(d, f"v{v:06d}.json"), {**meta, "version": v}
        )
        return v
