"""Snapshot: stream the lake's merged current state as a Dataset.

The read-back analog of the reference's ES search clients (S7,
``status-service/elastic/client_tick_data.go:25-89``), except bulk: one
Ray task per partition merges base+deltas (LWW, tombstones dropped) and
emits the partition's live rows as Arrow — the full table never sits in
one place; downstream stages/writes stream with backpressure.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from .. import schema as schema_mod
from ..stages.merge import merge_partition_files, strip_internal
from ..state.manifest import FileEntry, Manifest


def _snapshot_items(
    man: Manifest, upto_epoch: int | None = None
) -> tuple[list[dict], pa.Schema]:
    state = man.load_state()
    if upto_epoch is None:
        schema = state.schema if state.schema is not None else pa.schema([])
    else:
        # TIME TRAVEL: the as-of schema is the cumulative unified schema
        # the manifest recorded when that epoch committed — so a column
        # added later does not appear in the historical view
        if not man.has_epoch(upto_epoch):
            raise ValueError(f"epoch {upto_epoch} is not committed")
        schema = schema_mod.schema_from_json(
            man.epoch_record(upto_epoch)["schema"]
        )
    if (
        man.merge_spec.has_tombstones
        and "op" not in schema.names
        and any(state.deltas.values())
    ):
        schema = schema_mod.unify(schema, pa.schema([("op", pa.string())]))
    items = []
    for part in range(man.num_partitions):
        base, deltas = state.live_files(part, upto_epoch)
        if base is None and not deltas:
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
    return items, schema


def make_partition_merger(
    lake_dir: str,
    schema_json: str,
    *,
    keep_tombstones: bool = False,
    keep_lineage: bool = True,
    columns: list[str] | None = None,
    merge_spec_dict: dict | None = None,
):
    """Factory for the per-partition merge UDF (stateless task; the
    closure ships only paths + a schema string + the entity spec)."""
    from ..schema import PAGES_SPEC, MergeSpec

    mspec = (
        MergeSpec.from_dict(merge_spec_dict) if merge_spec_dict else PAGES_SPEC
    )

    def merge(batch: pa.Table) -> pa.Table:
        unified = schema_mod.schema_from_json(schema_json)
        out = []
        for payload in batch.column("payload").to_pylist():
            spec = json.loads(payload)
            base = FileEntry.from_dict(spec["base"]) if spec["base"] else None
            deltas = [FileEntry.from_dict(d) for d in spec["deltas"]]
            merged = merge_partition_files(
                lake_dir,
                base,
                deltas,
                unified,
                keep_tombstones=keep_tombstones,
                spec=mspec,
            )
            if not keep_tombstones:
                merged = strip_internal(
                    merged, extra=() if keep_lineage else (mspec.lsn_col,)
                )
            if columns:
                merged = merged.select(columns)
            out.append(merged)
        return pa.concat_tables(out) if out else unified.empty_table()

    return merge


def snapshot(
    lake_dir: str,
    *,
    columns: list[str] | None = None,
    keep_lineage: bool = True,
    upto_epoch: int | None = None,
):
    """Return a ``ray.data.Dataset`` of the lake's merged state — the
    CURRENT state, or (``upto_epoch=E``) the TIME-TRAVEL view exactly as
    it stood when epoch E committed: deltas beyond E are excluded and
    the schema is the one recorded in E's manifest entry.  Travel is
    bounded by the compaction horizon (folded epochs raise) — the
    manifest-log lakehouse analog of snapshot-isolation reads on an
    older table version."""
    import ray.data as rd

    man = Manifest(lake_dir)
    items, schema = _snapshot_items(man, upto_epoch)
    if not items:
        return rd.from_arrow(schema.empty_table())
    fn = make_partition_merger(
        lake_dir,
        schema_mod.schema_to_json(schema),
        keep_lineage=keep_lineage,
        columns=columns,
        merge_spec_dict=man.merge_spec.to_dict(),
    )
    return rd.from_items(items).map_batches(fn, batch_format="pyarrow", batch_size=1)


def export_snapshot(
    lake_dir: str,
    out_dir: str,
    *,
    columns: list[str] | None = None,
    upto_epoch: int | None = None,
) -> dict:
    """Write the merged current state (or the ``upto_epoch`` time-travel
    view) as a parquet directory (streaming, one file per
    partition-merge block) — the bulk-export sink a downstream consumer
    of the lake would read."""
    ds = snapshot(lake_dir, columns=columns, keep_lineage=True, upto_epoch=upto_epoch)
    ds.write_parquet(out_dir)
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    rows = sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows for f in files
    )
    return {"out_dir": out_dir, "files": len(files), "rows": rows}


def snapshot_table(lake_dir: str, **kwargs) -> pa.Table:
    """Driver-side merged table, sorted by the entity's key columns
    (tests / small lakes)."""
    import pyarrow.compute as pc

    keys = Manifest(lake_dir).merge_spec.key_cols
    ds = snapshot(lake_dir, **kwargs)
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.schema([]).empty_table()
    unified = schema_mod.unify(*[t.schema for t in tables])
    t = pa.concat_tables([schema_mod.conform(x, unified) for x in tables])
    sort_keys = [(k, "ascending") for k in keys]
    return t.take(pc.sort_indices(t, sort_keys=sort_keys)).combine_chunks()
