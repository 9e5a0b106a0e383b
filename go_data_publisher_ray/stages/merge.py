"""LWW merge kernels and the delta-writer / compactor stages.

The semantic core of the engine: last-writer-wins by ``(warc_ts, lsn)``
per ``url`` with delete tombstones — the Ray-Data re-expression of the
reference's idempotent keyed overwrite into Elasticsearch
(``transactions-consumer/extern/elastic_client.go:42-46``: bulk action
``index`` with explicit DocumentID = create-or-replace) combined with
its monotone interval merge (keep max ``to`` per ``epoch-from`` key,
``tick-intervals-consumer/consume/intervals_processor.go:103-149``).
Ties on ``warc_ts`` are broken by ``lsn`` so replay is deterministic
(the reference gets this "for free" from per-key overwrite order; we
define it).

Everything here is vectorized Arrow: sort_indices + adjacent-compare
masks, no Python row loops.  ``lww_collapse`` is associative and
commutative over row-sets, which is what makes the in-batch pre-combine
(combiner), hot-key salting (two-level collapse) and base+delta
compaction all correct.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import hash_and_partition, partition_for
from ..schema import PAGES_SPEC, MergeSpec
from ..state.manifest import FileEntry
from ..state.storage import get_storage

# LWW order: per url keep the row with max (warc_ts, lsn).
_LWW_SORT = [("url", "ascending"), ("warc_ts", "descending"), ("lsn", "descending")]


def _first_per_key_mask(keys: pa.Array) -> pa.Array:
    """Boolean mask selecting the first row of each run of equal keys in
    an array sorted by key (vectorized adjacent-compare)."""
    n = len(keys)
    if n == 0:
        return pa.array([], type=pa.bool_())
    neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
    return pa.concat_arrays(
        [pa.array([True]), neq.combine_chunks() if isinstance(neq, pa.ChunkedArray) else neq]
    )


def lww_collapse(table: pa.Table) -> pa.Table:
    """Keep the winning row per url: max (warc_ts, lsn).  Output is
    sorted by url (hash-first when a precomputed ``urlhash`` column is
    present: long url strings then only compare within hash-equal runs,
    which is markedly cheaper).  Tombstone rows (op='delete') survive —
    dropping them is a separate, later decision (snapshot/compaction)."""
    if table.num_rows == 0:
        return table
    # sort/take on many-chunked wide tables (binary html) is
    # pathologically slow (chunk-resolving per index); one contiguous
    # copy first is ~8x faster end-to-end on shuffle output
    table = table.combine_chunks()
    if "urlhash" in table.schema.names:
        sort_keys = [("urlhash", "ascending")] + _LWW_SORT
    else:
        sort_keys = _LWW_SORT
    idx = pc.sort_indices(table, sort_keys=sort_keys)
    table = table.take(idx)
    mask = _first_per_key_mask(table.column("url").combine_chunks())
    return table.filter(mask)


def keep_last_by(
    table: pa.Table, key_cols: list[str], order_cols: list[str],
    first_wins: bool = False,
) -> pa.Table:
    """Generalized LWW: keep one row per composite key, the max by
    ``order_cols`` (all descending).  ``first_wins=True`` inverts the
    direction (keep the MIN order tuple — the content-addressed
    immutable-store semantics).  Same vectorized sort +
    adjacent-compare approach as ``lww_collapse``; keys must be
    non-null."""
    if table.num_rows == 0:
        return table
    direction = "ascending" if first_wins else "descending"
    sort_keys = [(k, "ascending") for k in key_cols] + [
        (c, direction) for c in order_cols
    ]
    table = table.combine_chunks()
    table = table.take(pc.sort_indices(table, sort_keys=sort_keys))
    n = table.num_rows
    change = None
    for k in key_cols:
        keys = table.column(k).combine_chunks()
        neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
        if isinstance(neq, pa.ChunkedArray):
            neq = neq.combine_chunks()
        change = neq if change is None else pc.or_(change, neq)
    mask = pa.concat_arrays([pa.array([True]), change])
    return table.filter(mask)


def _pages_fast_path(spec: MergeSpec) -> bool:
    """The urlhash-accelerated LWW kernel applies to any spec with the
    pages merge SHAPE (key url, order (warc_ts, lsn), last-wins) —
    ``key_normalizer`` only changes what the key bytes are before
    hashing, not how rows merge, so a canonical-url pages lake keeps
    the fast path."""
    return (
        spec.key_cols == PAGES_SPEC.key_cols
        and spec.order_cols == PAGES_SPEC.order_cols
        and not spec.first_wins
    )


def collapse_table(table: pa.Table, spec: MergeSpec = PAGES_SPEC) -> pa.Table:
    """Spec-driven collapse: the pages entity keeps its urlhash-
    accelerated fast path; any other entity goes through the general
    ``keep_last_by`` kernel (same sort + adjacent-compare shape)."""
    if _pages_fast_path(spec):
        return lww_collapse(table)
    return keep_last_by(
        table, list(spec.key_cols), list(spec.order_cols), spec.first_wins
    )


def drop_tombstones(table: pa.Table) -> pa.Table:
    if "op" not in table.schema.names:
        return table
    return table.filter(pc.not_equal(table.column("op"), "delete"))


def strip_internal(table: pa.Table, extra: tuple[str, ...] = ()) -> pa.Table:
    from ..schema import INTERNAL_COLUMNS

    drop = [c for c in (*INTERNAL_COLUMNS, *extra) if c in table.schema.names]
    return table.drop_columns(drop) if drop else table


class AddPartitionAndCombine:
    """map_batches stage: normalize an event batch for the shuffle.

    - adds ``part = stable_hash64(url) % P`` (THE shuffle key;
      the url-hash analog of the reference's Kafka key partition
      affinity, ``computors-publisher/kafka/producer.go:40-42``);
    - optionally adds ``salt = lsn % S`` for two-level hot-key merge;
    - pre-combines: collapses multiple events per url *within the
      batch* (combiner) so the shuffle moves at most one row per
      (url, batch) — the partial-aggregation pattern;
    - optionally drops rows outside this ingester's key-space shard
      (``shard=(k, n)`` keeps ``part % n == k``) — horizontal service
      sharding: n independent drivers each own a disjoint partition
      subset of the same change log, the analog of the reference
      running one consumer service per entity/index shard.
    """

    def __init__(
        self,
        num_partitions: int,
        salt: int = 0,
        combine: bool = True,
        validate: bool = True,
        patch_rules: tuple = (),
        spec: MergeSpec = PAGES_SPEC,
        shard: tuple[int, int] | None = None,
    ):
        self.num_partitions = num_partitions
        self.salt = salt
        self.combine = combine
        self.validate = validate
        self.patch_rules = patch_rules
        self.spec = spec
        self.shard = shard

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        if self.patch_rules:
            # M6 analog: conditional rewrite of known-bad ranges BEFORE
            # the merge (`status-service/sync/tick_processor.go:210-214`)
            from .patch import apply_patch_rules

            batch = apply_patch_rules(batch, self.patch_rules)
        if spec.key_normalizer:
            # canonical-key ingest (e.g. url spelling variants of one
            # page): MUST run before the partition hash so variants
            # co-locate, and before validate (normalization never
            # introduces nulls but keeps the order explicit)
            from ..functions.url import normalize_key_column

            batch = normalize_key_column(
                batch, spec.partition_col, spec.key_normalizer
            )
        if self.validate:
            # M3 analog (`tick-data-consumer/kafka/client.go:72-79`):
            # reject records that cannot be keyed/ordered instead of
            # poisoning the partition merge
            mask = None
            for c in (*spec.key_cols, spec.lsn_col, *spec.order_cols):
                if c in batch.schema.names:
                    v = pc.is_valid(batch.column(c))
                    mask = v if mask is None else pc.and_(mask, v)
            if mask is not None and not pc.all(mask).as_py():
                batch = batch.filter(mask)
        key0 = batch.column(spec.partition_col)
        if pa.types.is_string(key0.type) or pa.types.is_large_string(key0.type):
            # string keys get the hash column as a sort accelerator too
            urlhash, part = hash_and_partition(key0, self.num_partitions)
            batch = batch.append_column("urlhash", pa.array(urlhash))
        else:
            part = partition_for(key0, self.num_partitions)
        if self.shard is not None:
            k, n = self.shard
            keep = (part % n) == k
            batch = batch.filter(pa.array(keep))
            part = part[keep]
        batch = batch.append_column("part", pa.array(part, type=pa.int32()))
        if self.combine:
            batch = collapse_table(batch, spec)
        if self.salt > 1:
            lsn = (
                batch.column(spec.lsn_col)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            batch = batch.append_column(
                "salt", pa.array((lsn % self.salt).astype("int32"))
            )
        return batch


def collapse_group(group: pa.Table, spec: MergeSpec = PAGES_SPEC) -> pa.Table:
    """map_groups UDF for the salted first pass: pure spec collapse."""
    return collapse_table(group, spec)


def atomic_write_parquet(table: pa.Table, path: str, storage_name: str | None = None) -> int:
    """Deterministic-content atomic parquet write; returns file bytes.

    Determinism matters: re-running an epoch (duplicate delivery, task
    retry, crash replay) must produce byte-identical files so commits
    are idempotent overwrites.  The final promotion goes through the
    storage adapter (POSIX rename / object-store upload completion);
    worker-side callers pass the name their stage captured on the
    driver (state/storage.py)."""
    tmp = f"{path}.tmp-{os.getpid()}-{np.random.randint(1 << 30)}"
    pq.write_table(table, tmp, compression="zstd", write_statistics=True)
    size = os.path.getsize(tmp)
    get_storage(storage_name).finalize_file(tmp, path)
    return size


class DeltaWriter:
    """map_groups sink stage: one group = one partition's epoch delta.

    Collapses the group (LWW within the epoch), sorts by url, writes
    ``part={P}/delta_{epoch}.parquet`` atomically, and returns a stats
    row — the data itself never flows back to the driver.  This is the
    LSM memtable flush of the north_star; the ES bulk-upsert analog
    (K3, ``transactions-consumer/extern/elastic_client.go:30-81``).

    Error policy (T2 analog, skip-and-record +
    `status-service/sync/tick_processor.go:238-249`, `361-369`):
    data-shaped errors (ArrowInvalid/ValueError/KeyError) in one
    partition's merge are recorded to ``deadletter/`` from the worker
    and reported via the stats row's ``error`` column — the epoch
    commit proceeds for healthy partitions and the poisoned one can be
    re-driven with ``force=True`` once fixed.  System errors (OSError,
    worker death) are NOT swallowed: Ray retries the task and the
    idempotent rewrite makes the retry safe.

    Test fault hooks: ``crash_marker`` makes the first task to reach it
    die with os._exit (real worker death, exercised by
    tests/test_failure_injection.py); ``poison_parts`` raises a data
    error for the listed partitions.
    """

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        drop_columns: tuple[str, ...] = ("epoch",),
        crash_marker: str | None = None,
        poison_parts: tuple[int, ...] = (),
        deadletter: bool = True,
        spec: MergeSpec = PAGES_SPEC,
        slice_tag: str = "",
        live_specs: dict | None = None,
        light_schema_json: str | None = None,
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.drop = drop_columns
        self.crash_marker = crash_marker
        self.poison_parts = tuple(poison_parts)
        self.deadletter = deadletter
        self.spec = spec
        # backlog-bounded sub-epoch slice (pipelines/apply.py): slices
        # of one epoch write delta_{epoch}_sNNN.parquet side by side and
        # commit together under the one epoch record
        self.slice_tag = slice_tag
        # no-op suppression (spec.suppress_unchanged): the driver ships
        # each partition's PRE-epoch live-file list + the light read
        # schema; the writer compares incoming winners' value_md5
        # against the current winners' via a pruned key_in read
        self.live_specs = live_specs or {}
        self.light_schema_json = light_schema_json
        self.storage_name = get_storage().name  # captured on the driver
        self.__name__ = f"DeltaWriter_e{epoch}{slice_tag}"  # ray map_groups wants a __name__

    def _finalize(self, out: pa.Table, part: int) -> pa.Table:
        """No-op update suppression + value_md5 stamping (both only when
        ``spec.suppress_unchanged``).  An incoming non-delete winner
        whose value_md5 equals the key's CURRENT winner (pre-epoch
        live files, pruned key_in read, tombstones dropped) is dropped:
        the lake row it would replace carries the same payload, so the
        write — and the changefeed diff and replica traffic behind it —
        is pure churn.  Rows that survive are stamped with their
        value_md5 so future epochs can compare against THIS delta
        without decoding payload bytes."""
        from ..functions.hashing import row_value_md5
        from ..schema import schema_from_json, value_columns

        spec = self.spec
        if not spec.suppress_unchanged or out.num_rows == 0:
            return out
        key0 = spec.key_cols[0]
        md5 = row_value_md5(out, value_columns(out.schema.names, spec))
        live = self.live_specs.get(part)
        if live and (live["base"] or live["deltas"]):
            from ..state.manifest import FileEntry

            keys = out.column(key0)
            if "op" in out.schema.names:
                keys = keys.filter(pc.not_equal(out.column("op"), "delete"))
            if len(keys):
                light = schema_from_json(self.light_schema_json)
                uniq = pc.unique(keys.combine_chunks())
                # the key_in parquet filter pays off only for SPARSE
                # touches: its per-row set probe over a large key list
                # costs more than just decoding the light columns once
                # the epoch touches a meaningful fraction of the
                # partition (a full re-crawl touches all of it —
                # measured 3x apply slowdown with the filter, none
                # without; tools/bench_suppress.py).  The key list is
                # materialized to Python only on the sparse branch.
                total = (live["base"]["rows"] if live["base"] else 0) + sum(
                    d["rows"] for d in live["deltas"]
                )
                sparse = len(uniq) * 20 < total
                cur = merge_partition_files(
                    self.lake_dir,
                    FileEntry.from_dict(live["base"]) if live["base"] else None,
                    [FileEntry.from_dict(d) for d in live["deltas"]],
                    light,
                    keep_tombstones=False,
                    spec=spec,
                    key_in=uniq.to_pylist() if sparse else None,
                    read_columns=light.names,
                )
                if cur.num_rows:
                    ki = pc.index_in(
                        out.column(key0), value_set=cur.column(key0).combine_chunks()
                    )
                    cur_md5 = pc.take(cur.column("value_md5").combine_chunks(), ki)
                    same = pc.and_kleene(
                        pc.is_valid(ki), pc.equal(md5, cur_md5)
                    )
                    if "op" in out.schema.names:
                        same = pc.and_kleene(
                            same, pc.not_equal(out.column("op"), "delete")
                        )
                    keep = pc.fill_null(pc.invert(same), True)
                    if isinstance(keep, pa.ChunkedArray):
                        keep = keep.combine_chunks()
                    out = out.filter(keep)
                    md5 = md5.filter(keep)
        if "value_md5" in out.schema.names:  # force-reapply of stamped rows
            out = out.drop_columns(["value_md5"])
        return out.append_column("value_md5", md5)

    def _stats(self, part: int, rel: str, rows: int, size: int, max_lsn: int, error: str) -> pa.Table:
        return pa.table(
            {
                "path": [rel],
                "partition": pa.array([part], type=pa.int32()),
                "rows": [rows],
                "bytes": [size],
                "max_lsn": [max_lsn],
                "error": [error],
            }
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        part = group.column("part")[0].as_py()
        if self.crash_marker is not None:
            try:
                fd = os.open(self.crash_marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)  # first task here dies mid-epoch; retry sees the marker
            except FileExistsError:
                pass
        try:
            if part in self.poison_parts:
                raise ValueError(f"injected poison partition {part}")
            out = collapse_table(group, self.spec)
            drop = [c for c in (*self.drop, "part", "salt", "urlhash") if c in out.schema.names]
            out = out.drop_columns(drop)
            out = self._finalize(out, part)
            if self.spec.suppress_unchanged and out.num_rows == 0:
                # every incoming row was a no-op re-publish: no delta
                # file, no manifest entry (apply skips empty-path rows)
                return self._stats(part, "", 0, 0, 0, "")
            rel = os.path.join(
                f"part={part:05d}", f"delta_{self.epoch:06d}{self.slice_tag}.parquet"
            )
            abspath = os.path.join(self.lake_dir, rel)
            os.makedirs(os.path.dirname(abspath), exist_ok=True)
            size = atomic_write_parquet(out, abspath, self.storage_name)
            max_lsn = pc.max(out.column(self.spec.lsn_col)).as_py() or 0
        except (pa.ArrowInvalid, ValueError, KeyError) as exc:
            if not self.deadletter:
                raise
            return self._record_deadletter(part, exc)
        return self._stats(part, rel, out.num_rows, size, max_lsn, "")

    def _record_deadletter(self, part: int, exc: Exception) -> pa.Table:
        import json as _json

        dl_dir = os.path.join(self.lake_dir, "deadletter")
        os.makedirs(dl_dir, exist_ok=True)
        dl_path = os.path.join(dl_dir, f"epoch_{self.epoch:06d}_part_{part:05d}.json")
        rec = {"epoch": self.epoch, "partition": part, "error": str(exc)}
        get_storage(self.storage_name).put_bytes(dl_path, _json.dumps(rec).encode())
        return self._stats(part, "", 0, 0, 0, str(exc))


class MultiPartDeltaWriter(DeltaWriter):
    """map_batches variant of DeltaWriter for the HASH exchange: the
    upstream ``repartition(keys=["part"])`` guarantees each partition's
    rows land wholly in one block, so one whole-block batch may carry
    several partitions — write one delta file per partition present.
    Avoids the global sort of payload rows that the groupby exchange
    performs (the sort is the memcpy-heavy step on wide binary rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        if batch.num_rows == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "partition": pa.array([], pa.int32()),
                    "rows": pa.array([], pa.int64()),
                    "bytes": pa.array([], pa.int64()),
                    "max_lsn": pa.array([], pa.int64()),
                    "error": pa.array([], pa.string()),
                }
            )
        outs = []
        for p in pc.unique(batch.column("part")).to_pylist():
            sub = batch.filter(pc.equal(batch.column("part"), p))
            outs.append(DeltaWriter.__call__(self, sub))
        return pa.concat_tables(outs)


class PayloadSpill:
    """map_batches stage of the PAYLOAD-REFERENCE exchange
    (GDP_EXCHANGE=ref): the classic lakehouse shuffle-bypass — the wide
    payload columns (html is the bulk) never enter the sort shuffle.

    Per batch (already pre-combined + partitioned), the payload columns
    are written to per-(task, partition) spill files on the lake's
    shared storage — exactly a map-side shuffle file layout (M x R
    files) — and only LIGHT rows (keys, order columns, op, part,
    urlhash + a blob path/row reference) flow through the groupby
    exchange.  The reducer reads only its own partition's blobs, so
    payload bytes are written once and read once, while the sort
    handles ~10x fewer bytes.  On a multi-node cluster the spill dir is
    the shared lake storage (S3/HDFS) — no cross-node payload traffic
    through the object store at all."""

    def __init__(self, spill_dir: str, spec: MergeSpec = PAGES_SPEC):
        self.spill_dir = spill_dir
        self.spec = spec

    def light_cols(self, names: list[str]) -> list[str]:
        keep = {
            *self.spec.key_cols,
            *self.spec.order_cols,
            self.spec.lsn_col,
            "op",
            "part",
            "salt",
            "urlhash",
            "epoch",
        }
        return [n for n in names if n in keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid as _uuid

        light = self.light_cols(batch.schema.names)
        payload_cols = [n for n in batch.schema.names if n not in light]
        outs = []
        parts = pc.unique(batch.column("part")).to_pylist()
        for p in parts:
            sub = batch.filter(pc.equal(batch.column("part"), p))
            pdir = os.path.join(self.spill_dir, f"part={p:05d}")
            os.makedirs(pdir, exist_ok=True)
            rel = os.path.join(f"part={p:05d}", f"b-{_uuid.uuid4().hex}.parquet")
            pq.write_table(
                sub.select(payload_cols),
                os.path.join(self.spill_dir, rel),
                compression="zstd",
            )
            lt = sub.select(light)
            lt = lt.append_column(
                "blob", pa.nulls(lt.num_rows, pa.string()).fill_null(rel)
            )
            lt = lt.append_column(
                "bidx", pa.array(np.arange(lt.num_rows, dtype=np.int64))
            )
            outs.append(lt)
        return pa.concat_tables(outs) if outs else batch.slice(0, 0)


class RefDeltaWriter(DeltaWriter):
    """map_groups reducer of the payload-reference exchange: collapses
    the LIGHT rows (LWW needs only keys + order columns), then fetches
    ONLY the winning rows' payloads from this partition's spill blobs
    and writes the same delta file the direct writer would."""

    def __init__(self, *args, spill_dir: str, column_order: list[str], **kwargs):
        super().__init__(*args, **kwargs)
        self.spill_dir = spill_dir
        self.column_order = column_order

    def __call__(self, group: pa.Table) -> pa.Table:  # type: ignore[override]
        part = group.column("part")[0].as_py()
        if self.crash_marker is not None:
            try:
                fd = os.open(self.crash_marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)  # first task here dies mid-epoch; retry sees the marker
            except FileExistsError:
                pass
        try:
            if part in self.poison_parts:
                raise ValueError(f"injected poison partition {part}")
            w = collapse_table(group, self.spec)
            blobs = w.column("blob").to_pylist()
            bidx = w.column("bidx").to_numpy(zero_copy_only=False)
            order = np.argsort(np.asarray(blobs, dtype=object), kind="stable")
            payload_parts = []
            positions = []
            i = 0
            while i < len(order):
                j = i
                b = blobs[order[i]]
                while j < len(order) and blobs[order[j]] == b:
                    j += 1
                idxs = order[i:j]
                t = pq.read_table(os.path.join(self.spill_dir, b))
                payload_parts.append(t.take(pa.array(bidx[idxs])))
                positions.extend(idxs.tolist())
                i = j
            if payload_parts:
                payload = pa.concat_tables(payload_parts)
                inv = np.empty(len(positions), dtype=np.int64)
                inv[np.asarray(positions, dtype=np.int64)] = np.arange(len(positions))
                payload = payload.take(pa.array(inv))
            else:
                payload = None
            cols = {}
            for name in self.column_order:
                if name in w.schema.names:
                    cols[name] = w.column(name)
                elif payload is not None and name in payload.schema.names:
                    cols[name] = payload.column(name)
            out = pa.table(cols)
            out = self._finalize(out, part)
            if self.spec.suppress_unchanged and out.num_rows == 0:
                return self._stats(part, "", 0, 0, 0, "")
            rel = os.path.join(
                f"part={part:05d}", f"delta_{self.epoch:06d}{self.slice_tag}.parquet"
            )
            abspath = os.path.join(self.lake_dir, rel)
            os.makedirs(os.path.dirname(abspath), exist_ok=True)
            size = atomic_write_parquet(out, abspath, self.storage_name)
            max_lsn = pc.max(out.column(self.spec.lsn_col)).as_py() or 0
        except (pa.ArrowInvalid, ValueError, KeyError) as exc:
            if not self.deadletter:
                raise
            return self._record_deadletter(part, exc)
        return self._stats(part, rel, out.num_rows, size, max_lsn, "")


def stamp_value_md5(out: pa.Table, spec: MergeSpec) -> pa.Table:
    """(Re)compute the internal ``value_md5`` column for a base-file
    write — bootstrap and compaction both stamp it when the entity
    suppresses unchanged updates.  Recomputing (rather than carrying)
    is self-healing: files written before the feature, or before a
    schema evolution changed the value-column set, get a fresh digest
    over the CURRENT unified value columns."""
    if not spec.suppress_unchanged or out.num_rows == 0:
        return out
    from ..functions.hashing import row_value_md5
    from ..schema import value_columns

    if "value_md5" in out.schema.names:
        out = out.drop_columns(["value_md5"])
    md5 = row_value_md5(out, value_columns(out.schema.names, spec))
    return out.append_column("value_md5", md5)


class BaseWriter:
    """map_groups sink stage for bootstrap: writes one partition's base
    file ``part={P}/base_{tag}.parquet`` (live rows only, sorted by url,
    no op column)."""

    def __init__(self, lake_dir: str, tag: str, spec: MergeSpec = PAGES_SPEC):
        self.lake_dir = lake_dir
        self.tag = tag
        self.spec = spec
        self.storage_name = get_storage().name  # captured on the driver
        self.__name__ = f"BaseWriter_{tag}"  # ray map_groups wants a __name__

    def __call__(self, group: pa.Table) -> pa.Table:
        part = group.column("part")[0].as_py()
        out = collapse_table(group, self.spec)
        out = strip_internal(out)
        out = stamp_value_md5(out, self.spec)
        rel = os.path.join(f"part={part:05d}", f"base_{self.tag}.parquet")
        abspath = os.path.join(self.lake_dir, rel)
        os.makedirs(os.path.dirname(abspath), exist_ok=True)
        size = atomic_write_parquet(out, abspath, self.storage_name)
        max_lsn = pc.max(out.column(self.spec.lsn_col)).as_py() or 0
        return pa.table(
            {
                "path": [rel],
                "partition": pa.array([part], type=pa.int32()),
                "rows": [out.num_rows],
                "bytes": [size],
                "max_lsn": [max_lsn],
            }
        )


def merge_partition_files(
    lake_dir: str,
    base: FileEntry | None,
    deltas: list[FileEntry],
    unified_schema: pa.Schema,
    *,
    keep_tombstones: bool,
    columns: list[str] | None = None,
    spec: MergeSpec = PAGES_SPEC,
    key_in: list | None = None,
    read_columns: list | None = None,
) -> pa.Table:
    """Read one partition's live base+delta files and produce its merged
    view (vectorized concat -> spec-driven collapse).  Used by both the
    snapshot reader and the compactor.

    For tombstoned entities, base rows have no ``op`` column (base
    files only hold live rows); they are treated as op='insert' during
    the merge.

    ``key_in`` restricts the read to the given primary-key values with
    parquet predicate pushdown (files are key-sorted, so only matching
    row groups decode) — the point-lookup path.  Collapsing a key's full
    version set is unaffected: every version of a kept key passes the
    filter, so the LWW winner is identical to the full merge's.

    ``read_columns`` prunes the read itself (columns absent from a file
    are skipped there and null-filled by conform) — the light-read path
    of no-op suppression, where only keys + order + value_md5 are
    needed and the wide payload must never decode.
    """
    from ..schema import conform

    filters = [(spec.key_cols[0], "in", list(key_in))] if key_in is not None else None
    tables = []
    for fe, is_base in ([(base, True)] if base else []) + [(f, False) for f in deltas]:
        path = os.path.join(lake_dir, fe.path)
        cols = None
        if read_columns is not None:
            have = set(pq.read_schema(path).names)
            cols = [c for c in read_columns if c in have]
        t = pq.read_table(path, columns=cols, filters=filters)
        if spec.has_tombstones and "op" not in t.schema.names:
            op = pa.nulls(t.num_rows, pa.string()).fill_null("insert")
            t = t.append_column("op", op)
        tables.append(conform(t, unified_schema))
    if not tables:
        return unified_schema.empty_table()
    merged = pa.concat_tables(tables)
    if _pages_fast_path(spec):
        # hash-accelerated collapse (the hash column is internal,
        # stripped by callers via strip_internal)
        from ..functions.hashing import stable_hash64

        merged = merged.append_column(
            "urlhash", pa.array(stable_hash64(merged.column("url")).astype("int64"))
        )
        merged = lww_collapse(merged).drop_columns(["urlhash"])
    else:
        merged = collapse_table(merged, spec)
    if not keep_tombstones:
        merged = drop_tombstones(merged)
    if columns:
        merged = merged.select(columns)
    return merged
