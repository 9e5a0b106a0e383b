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

import numpy as np
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


def _hex_encode_binary(arr) -> pa.Array:
    """Vectorized binary→hex for the text-sink boundary transcode: ONE
    ``binascii.hexlify`` pass over the array's packed data buffer plus
    numpy-doubled offsets — no per-row Python (the engine-wide rule)."""
    import binascii

    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        chunks = [_hex_encode_binary(c) for c in arr.chunks]
        return pa.chunked_array(chunks if chunks else [pa.array([], pa.string())])
    a = arr.cast(pa.large_binary())
    if len(a) == 0:
        return pa.array([], pa.string())
    off = np.frombuffer(a.buffers()[1], np.int64)[a.offset : a.offset + len(a) + 1]
    data = a.buffers()[2]
    start, end = int(off[0]), int(off[-1])
    hexed = (
        binascii.hexlify(memoryview(data)[start:end])
        if data is not None and end > start
        else b""
    )
    new_off = ((off - start) * 2).astype(np.int64)
    out = pa.Array.from_buffers(
        pa.large_string(),
        len(a),
        [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(hexed)],
    )
    if a.null_count:
        out = pc.if_else(pc.is_valid(a), out, pa.scalar(None, pa.large_string()))
    return out.cast(pa.string())


def export_snapshot(
    lake_dir: str,
    out_dir: str,
    *,
    columns: list[str] | None = None,
    upto_epoch: int | None = None,
    fmt: str = "parquet",
) -> dict:
    """Write the merged current state (or the ``upto_epoch`` time-travel
    view) as a directory of files (streaming, one file per
    partition-merge block) — the bulk-export sink a downstream consumer
    of the lake would read.  ``fmt`` picks the sink: ``parquet``
    (default), ``csv``, or ``jsonl`` (Ray's native streaming writers —
    same backpressure, different encoder).  Binary columns don't fit
    the two text sinks and are hex-encoded there, matching the
    boundary-only transcode convention of ``sources/jsonl.py`` (M1/M2,
    `transactions-producer/domain/tx/converter.go` analog)."""
    ds = snapshot(lake_dir, columns=columns, keep_lineage=True, upto_epoch=upto_epoch)
    if fmt == "parquet":
        ds.write_parquet(out_dir)
        suffix = ".parquet"
    elif fmt in ("csv", "jsonl"):

        def hex_binaries(t: pa.Table) -> pa.Table:
            for i, f in enumerate(t.schema):
                if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
                    t = t.set_column(i, f.name, _hex_encode_binary(t.column(f.name)))
            return t

        ds = ds.map_batches(hex_binaries, batch_format="pyarrow")
        if fmt == "csv":
            ds.write_csv(out_dir)
            suffix = ".csv"
        else:
            ds.write_json(out_dir)
            suffix = ".json"
    else:
        raise ValueError(f"unknown export format {fmt!r} (parquet|csv|jsonl)")

    files = [f for f in os.listdir(out_dir) if f.endswith(suffix)]
    if fmt == "parquet":
        import pyarrow.parquet as pq

        rows = sum(
            pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows for f in files
        )
    else:
        rows = None  # counting text rows would re-read the export
    # provenance marker: consumers (pipelines/publish.py::replicate)
    # verify an export was taken at the epoch they expect instead of
    # silently building on a wrong-epoch snapshot
    from ..state.manifest import atomic_write_json

    # extension-less name: a "*.json" glob over a jsonl export must
    # not pick the marker up as data
    atomic_write_json(
        os.path.join(out_dir, "_export_marker"),
        {"lake": os.path.abspath(lake_dir), "upto_epoch": upto_epoch, "rows": rows},
    )
    return {"out_dir": out_dir, "files": len(files), "rows": rows, "format": fmt}


def _combine_keys(t: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    """One hashable array per row for ``pc.index_in`` — the key column
    itself when single, else a ``\\x1f``-joined string composite."""
    import pyarrow.compute as pc

    if len(key_cols) == 1:
        return t.column(key_cols[0]).combine_chunks()
    parts = [pc.cast(t.column(c), pa.string()) for c in key_cols]
    return pc.binary_join_element_wise(*parts, "\x1f")


def make_partition_differ(
    lake_dir: str,
    old_schema_json: str,
    new_schema_json: str,
    merge_spec_dict: dict,
    value_cols: tuple[str, ...] = (),
):
    """Per-partition CHANGEFEED task: merge the partition's as-of-E1 and
    as-of-E2 views, then a vectorized Arrow hash-join (``pc.index_in``)
    classifies every key as added / changed / deleted.  Unchanged keys
    (identical winning order tuple ⇒ identical row under LWW) are
    dropped, so the output is proportional to the change set, not the
    table.  ``value_cols`` ride along as old_*/new_* payload columns
    (the reference re-publishes FULL documents on its change stream,
    not just keys — transactions-producer/domain/processor.go); change
    classification stays on the order tuple alone."""
    from ..schema import MergeSpec

    mspec = MergeSpec.from_dict(merge_spec_dict)
    keys, orders = list(mspec.key_cols), list(mspec.order_cols)
    new_schema_ref = schema_mod.schema_from_json(new_schema_json)
    # a value column that does not exist at the TO endpoint yet (F3
    # schema evolution: added in a later epoch) is silently absent from
    # THIS diff — the epoch records carry the cumulative unified schema,
    # so later diffs pick it up the epoch it appears, and the replica
    # consumer derives payload columns per feed epoch accordingly
    vals = [
        c
        for c in value_cols
        if c not in orders and c not in keys and c in new_schema_ref.names
    ]

    def _merge_side(spec_side: dict | None, schema_json: str) -> pa.Table:
        schema = schema_mod.schema_from_json(schema_json)
        cols = keys + orders + vals
        # schema evolution: conform BOTH endpoints to the unified schema
        # so a value column added (or int-widened) after the old endpoint
        # reads back as nulls / the widened type in the historical side
        # and the per-change pieces concat without type drift
        unified = schema_mod.unify(schema, new_schema_ref)
        if spec_side is None:
            return unified.empty_table().select(cols)
        base = FileEntry.from_dict(spec_side["base"]) if spec_side["base"] else None
        deltas = [FileEntry.from_dict(d) for d in spec_side["deltas"]]
        merged = merge_partition_files(
            lake_dir, base, deltas, schema, keep_tombstones=False, spec=mspec
        )
        return schema_mod.conform(merged, unified).select(cols)

    def diff(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = []
        for payload in batch.column("payload").to_pylist():
            spec = json.loads(payload)
            old = _merge_side(spec["old"], old_schema_json)
            new = _merge_side(spec["new"], new_schema_json)
            okey, nkey = _combine_keys(old, keys), _combine_keys(new, keys)
            pos_in_old = pc.index_in(nkey, value_set=okey)
            pos_in_new = pc.index_in(okey, value_set=nkey)
            added = pc.is_null(pos_in_old)
            # order-tuple inequality on aligned rows (null-take on added
            # rows -> null -> fill False) marks changed keys
            chg = pa.array(np.zeros(new.num_rows, dtype=bool))
            for o in orders:
                aligned = old.column(o).combine_chunks().take(pos_in_old)
                ne = pc.fill_null(pc.not_equal(aligned, new.column(o)), False)
                chg = pc.or_(chg, ne)
            pieces = []

            def emit(side: pa.Table, mask, change: str, aligned_old=None):
                rows = side.filter(mask)
                cols = {k: rows.column(k) for k in keys}
                cols["change"] = pa.array([change] * rows.num_rows, pa.string())
                for o in orders + vals:
                    typ = side.schema.field(o).type
                    if change == "deleted":
                        cols[f"old_{o}"] = rows.column(o)
                        cols[f"new_{o}"] = pa.nulls(rows.num_rows, typ)
                    elif change == "added":
                        cols[f"old_{o}"] = pa.nulls(rows.num_rows, typ)
                        cols[f"new_{o}"] = rows.column(o)
                    else:  # changed: old side aligned onto new row order
                        cols[f"old_{o}"] = pc.filter(aligned_old[o], mask)
                        cols[f"new_{o}"] = rows.column(o)
                pieces.append(pa.table(cols))

            aligned_old = {
                o: old.column(o).combine_chunks().take(pos_in_old)
                for o in orders + vals
            }
            emit(new, added, "added")
            emit(new, pc.and_(pc.invert(added), chg), "changed", aligned_old)
            emit(old, pc.is_null(pos_in_new), "deleted")
            out.append(pa.concat_tables(pieces))
        return pa.concat_tables(out)

    return diff


def snapshot_diff(
    lake_dir: str,
    from_epoch: int,
    to_epoch: int,
    value_cols: tuple[str, ...] = (),
):
    """CHANGEFEED between two committed table versions: a Dataset of
    (key, change∈{added,changed,deleted}, old_*/new_* order columns) for
    every key whose merged state differs between ``as of from_epoch``
    and ``as of to_epoch`` — the manifest-log analog of a lakehouse
    incremental read / CDC-between-snapshots, and the engine's own
    change-data output surface (the reference emits its change stream
    via Kafka re-publish; SURVEY §2.2).  ``value_cols`` adds old_*/new_*
    payload columns so a downstream consumer (e.g. incremental view
    maintenance) gets the data it needs without re-reading the table.
    Both endpoints must be committed and at or after the compaction
    horizon; the diff itself is metadata-planned (per-partition file
    lists) and executes as one vectorized task per partition."""
    import ray.data as rd

    man = Manifest(lake_dir)
    for e in (from_epoch, to_epoch):
        if not man.has_epoch(e):
            raise ValueError(f"epoch {e} is not committed")
    if from_epoch >= to_epoch:
        raise ValueError("from_epoch must precede to_epoch")
    state = man.load_state()
    old_json = man.epoch_record(from_epoch)["schema"]
    new_json = man.epoch_record(to_epoch)["schema"]
    items = []
    for part in range(man.num_partitions):
        ob, od = state.live_files(part, from_epoch)
        nb, nd = state.live_files(part, to_epoch)
        if ob is None and not od and nb is None and not nd:
            continue
        items.append(
            {
                "payload": json.dumps(
                    {
                        "part": part,
                        "old": (
                            None
                            if ob is None and not od
                            else {
                                "base": ob.to_dict() if ob else None,
                                "deltas": [d.to_dict() for d in od],
                            }
                        ),
                        "new": (
                            None
                            if nb is None and not nd
                            else {
                                "base": nb.to_dict() if nb else None,
                                "deltas": [d.to_dict() for d in nd],
                            }
                        ),
                    }
                )
            }
        )
    extra = tuple(
        c
        for c in value_cols
        if c not in man.merge_spec.order_cols and c not in man.merge_spec.key_cols
    )
    if not items:
        new_schema = schema_mod.schema_from_json(new_json)
        fields = [new_schema.field(k) for k in man.merge_spec.key_cols]
        fields.append(pa.field("change", pa.string()))
        # mirror make_partition_differ's presence filter: a value column
        # not (yet) in the TO-endpoint schema is absent from this diff's
        # schema too, not a KeyError
        present = [c for c in extra if c in new_schema.names]
        for o in list(man.merge_spec.order_cols) + present:
            typ = new_schema.field(o).type
            fields += [pa.field(f"old_{o}", typ), pa.field(f"new_{o}", typ)]
        return rd.from_arrow(pa.schema(fields).empty_table())
    fn = make_partition_differ(
        lake_dir, old_json, new_json, man.merge_spec.to_dict(), value_cols=extra
    )
    return rd.from_items(items).map_batches(fn, batch_format="pyarrow", batch_size=1)


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


def lookup_keys(
    lake_dir: str,
    keys: list,
    *,
    columns: list[str] | None = None,
    upto_epoch: int | None = None,
) -> pa.Table:
    """Point lookups by primary key — the search-by-key read the
    reference serves from ES (S7, `status-service/elastic/
    client_tick_data.go:25-89` GetTickData), served from the lake
    without a scan: each key hashes to its partition, and only the
    touched partitions' base+delta files are opened WITH parquet
    predicate pushdown (files are key-sorted, so non-matching row
    groups never decode).  Tombstoned keys return no row; missing keys
    return no row.

    Raw Ray tasks (one per touched partition), not a Dataset: a point
    lookup touches at most ``len(keys)`` partitions and returns a
    result that must be small by definition — the Dataset machinery
    would cost more than the read.  ``upto_epoch`` gives the
    time-travel view, same fencing as ``snapshot``."""
    import ray

    from ..functions.hashing import partition_for

    man = Manifest(lake_dir)
    state = man.load_state()
    spec = man.merge_spec
    if upto_epoch is None:
        schema = state.schema if state.schema is not None else pa.schema([])
    else:
        if not man.has_epoch(upto_epoch):
            raise ValueError(f"epoch {upto_epoch} is not committed")
        schema = schema_mod.schema_from_json(man.epoch_record(upto_epoch)["schema"])
    if spec.has_tombstones and "op" not in schema.names and any(state.deltas.values()):
        schema = schema_mod.unify(schema, pa.schema([("op", pa.string())]))

    if spec.key_normalizer:
        # the lake stores CANONICAL keys — normalize the probes so a
        # lookup by any spelling variant finds the merged row
        from ..functions.url import normalize_keys

        keys = normalize_keys(keys, spec.key_normalizer)
    parts = partition_for(pa.array(keys), man.num_partitions)
    by_part: dict[int, list] = {}
    for k, p in zip(keys, parts):
        by_part.setdefault(int(p), []).append(k)

    schema_json = schema_mod.schema_to_json(schema)
    spec_dict = spec.to_dict()

    @ray.remote
    def _lookup_one(payload: str) -> pa.Table:
        from ..stages.merge import merge_partition_files, strip_internal

        req = json.loads(payload)
        base = FileEntry.from_dict(req["base"]) if req["base"] else None
        deltas = [FileEntry.from_dict(d) for d in req["deltas"]]
        merged = merge_partition_files(
            lake_dir,
            base,
            deltas,
            schema_mod.schema_from_json(schema_json),
            keep_tombstones=False,
            spec=schema_mod.MergeSpec.from_dict(spec_dict),
            key_in=req["keys"],
        )
        return strip_internal(merged)

    refs = []
    for part, ks in sorted(by_part.items()):
        base, deltas = state.live_files(part, upto_epoch)
        if base is None and not deltas:
            continue
        refs.append(
            _lookup_one.remote(
                json.dumps(
                    {
                        "base": base.to_dict() if base else None,
                        "deltas": [d.to_dict() for d in deltas],
                        "keys": ks,
                    }
                )
            )
        )
    out_schema = schema
    if "op" in out_schema.names:
        out_schema = out_schema.remove(out_schema.get_field_index("op"))
    tables = ray.get(refs) if refs else []
    out = (
        pa.concat_tables([t.cast(out_schema) for t in tables])
        if tables
        else out_schema.empty_table()
    )
    if columns:
        out = out.select(columns)
    return out
