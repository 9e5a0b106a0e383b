"""Compaction: fold a partition's live deltas into a new sorted base.

The LSM maintenance path of the north_star.  Tombstones are dropped
here — safe because a full-partition compaction merges *every* live
file of the partition, so no older version of a deleted url survives
anywhere (FIXTURES.md `test_delete_tombstones`).

Implemented as an actor-pool ``map_batches`` stage over partition
descriptors: each actor holds the lake paths + unified schema once
(`__init__`), then compacts one partition per batch — the stateful
actor-pool merger shape (T3 analog,
``status-service/rpc/status_service.go:28-46`` TTL-cached derived
views, made explicit).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as schema_mod
from ..stages.merge import (
    atomic_write_parquet,
    merge_partition_files,
    stamp_value_md5,
    strip_internal,
)
from ..state.manifest import FileEntry, Manifest


class Compactor:
    """Actor-pool stage: one partition descriptor row in -> one stats row
    out; the merged base is written from the worker, never shipped."""

    def __init__(
        self,
        lake_dir: str,
        schema_json: str,
        tag: str,
        merge_spec_dict: dict | None = None,
        storage_name: str | None = None,
    ):
        from ..schema import PAGES_SPEC, MergeSpec

        self.lake_dir = lake_dir
        self.schema = schema_mod.schema_from_json(schema_json)
        self.tag = tag
        self.mspec = (
            MergeSpec.from_dict(merge_spec_dict) if merge_spec_dict else PAGES_SPEC
        )
        # __init__ runs on the WORKER (fn_constructor_args), so the
        # driver's storage choice must arrive as an argument — resolving
        # GDP_STORAGE here would read the worker's env and could split
        # one compaction commit across substrates (state/storage.py).
        self.storage_name = storage_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for payload in batch.column("payload").to_pylist():
            spec = json.loads(payload)
            part = spec["part"]
            base = FileEntry.from_dict(spec["base"]) if spec["base"] else None
            deltas = [FileEntry.from_dict(d) for d in spec["deltas"]]
            merged = merge_partition_files(
                self.lake_dir,
                base,
                deltas,
                self.schema,
                keep_tombstones=False,
                spec=self.mspec,
            )
            merged = strip_internal(merged)
            # folded bases of a suppress-unchanged entity re-stamp the
            # digest over the CURRENT value columns (self-healing across
            # schema evolution; see stamp_value_md5)
            merged = stamp_value_md5(merged, self.mspec)
            rel = os.path.join(f"part={part:05d}", f"base_{self.tag}.parquet")
            abspath = os.path.join(self.lake_dir, rel)
            os.makedirs(os.path.dirname(abspath), exist_ok=True)
            size = atomic_write_parquet(merged, abspath, self.storage_name)
            max_lsn = (
                (pc.max(merged.column(self.mspec.lsn_col)).as_py() or 0)
                if merged.num_rows
                else 0
            )
            rows.append(
                {
                    "path": rel,
                    "partition": part,
                    "rows": merged.num_rows,
                    "bytes": size,
                    "max_lsn": max_lsn,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("path", pa.string()),
                    ("partition", pa.int32()),
                    ("rows", pa.int64()),
                    ("bytes", pa.int64()),
                    ("max_lsn", pa.int64()),
                ]
            ),
        )


def compact(
    lake_dir: str,
    *,
    min_deltas: int = 1,
    delta_ratio: float | None = None,
    concurrency: int = 8,
    parts: set[int] | None = None,
) -> dict:
    """Compact every eligible partition (``parts`` restricts to a
    partition subset — the targeted fold the key-erasure path uses so
    one erased url doesn't rewrite the whole lake).

    Eligibility is size-tiered when ``delta_ratio`` is given: a
    partition folds when its live delta bytes reach ``delta_ratio`` x
    its base bytes (write amplification stays bounded — one tiny delta
    atop a huge cold base no longer pays a full base rewrite) OR when
    the delta-file count reaches ``min_deltas`` (the read-amplification
    backstop: every read merges all live files, so ratio alone must not
    let tiny files pile up forever).  A baseless partition always
    qualifies — its first fold is proportional to the deltas themselves.
    With ``delta_ratio=None`` (default) the trigger is count-only,
    today's behavior.  The ES segment-merge policy analog implied by
    K3's bulk sizing (``tick-intervals-consumer/elastic/client.go``).

    The actor pool is capped so each actor amortizes its process
    startup over >=4 partitions — spinning one actor per partition
    measurably regresses (actor start ~1s each)."""
    import ray.data as rd

    from ..state.storage import get_storage

    if delta_ratio is not None and min_deltas < 2:
        # at min_deltas=1 the count backstop trips on ANY delta and the
        # ratio never gates anything — the exact write amplification the
        # caller asked to avoid, silently.  Refuse loudly instead.
        raise ValueError(
            "delta_ratio needs min_deltas >= 2: at min_deltas=1 the "
            "file-count backstop folds every partition with any delta "
            "and the bytes-ratio trigger is inert"
        )

    t0 = time.perf_counter()
    man = Manifest(lake_dir)
    state = man.load_state()
    upto = max(state.committed_epochs, default=-1)
    schema = state.schema if state.schema is not None else pa.schema([])
    if man.merge_spec.has_tombstones and "op" not in schema.names:
        schema = schema_mod.unify(schema, pa.schema([("op", pa.string())]))

    items = []
    for part in range(man.num_partitions):
        if parts is not None and part not in parts:
            continue
        base, deltas = state.live_files(part)
        if not deltas:
            continue
        if delta_ratio is not None:
            delta_bytes = sum(d.bytes for d in deltas)
            if (
                len(deltas) < min_deltas
                and base is not None
                and delta_bytes < delta_ratio * base.bytes
            ):
                continue
        elif len(deltas) < min_deltas:
            continue
        items.append(
            {
                "payload": json.dumps(
                    {
                        "part": part,
                        "base": base.to_dict() if base else None,
                        "deltas": [d.to_dict() for d in deltas],
                    }
                )
            }
        )
    if not items:
        return {"compacted_partitions": 0, "sec": 0.0}

    cid = man.next_compaction_id()
    stats = (
        rd.from_items(items)
        .map_batches(
            Compactor,
            fn_constructor_args=(
                lake_dir,
                schema_mod.schema_to_json(schema),
                f"c{cid:06d}",
                man.merge_spec.to_dict(),
                get_storage().name,  # driver's choice, carried to workers
            ),
            batch_format="pyarrow",
            batch_size=1,
            concurrency=max(1, min(concurrency, len(items) // 4 or 1)),
        )
        .take_all()
    )
    entries = [
        FileEntry(
            path=r["path"],
            partition=int(r["partition"]),
            rows=int(r["rows"]),
            bytes=int(r["bytes"]),
            max_lsn=int(r["max_lsn"]),
        )
        for r in stats
    ]
    base_schema = (
        schema.remove(schema.get_field_index("op"))
        if "op" in schema.names
        else schema
    )
    man.commit_compaction(upto, entries, base_schema, cid=cid)
    return {
        "compacted_partitions": len(entries),
        "upto_epoch": upto,
        "sec": time.perf_counter() - t0,
    }
