"""The flagship pipeline: epoch-fenced CDC upsert-apply into the lake.

Shape (idiomatic Ray Data, one shuffle, streaming end to end):

    read_parquet(events/epoch=E)                  # prune at the read
      -> map_batches(AddPartitionAndCombine)      # vectorized normalize +
                                                  # url-hash part + in-batch
                                                  # LWW pre-combine (combiner)
      [-> groupby(part, salt).map_groups(collapse)]   # hot-key salting pass
      -> groupby(part).map_groups(DeltaWriter)    # per-partition sorted
                                                  # delta parquet (LSM flush)
      -> driver: manifest commit (atomic)         # THE commit point

This mirrors the reference's publisher->consumer path
(`transactions-producer/domain/processor.go:98-155` fetch/publish loop,
`transactions-consumer/consume/transaction_consumer.go:93-155` bulk
upsert then offset commit) with the epoch as the batch fence: the delta
files are idempotent (deterministic names + contents), the manifest
append is the offset commit, and re-applying an epoch is a no-op
overwrite — at-least-once + idempotence = effectively-once.

Scale notes (100 TB): the shuffle moves only one epoch's *collapsed*
events (the pre-combine drops within-batch losers before the exchange);
the base table never moves — each partition's base is read only by its
own merge/compact task.  Epochs are applied serially (they are the
commit fences) but everything inside an epoch streams with backpressure.
"""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq

from ..stages.merge import AddPartitionAndCombine, BaseWriter, DeltaWriter, collapse_group
from ..state.manifest import FileEntry, Manifest


def _ray_data():
    import ray.data as rd

    return rd


def _stats_to_entries(rows: list[dict]) -> tuple[list[FileEntry], list[dict]]:
    """Split writer stats rows into committed FileEntries and
    deadlettered (error) rows."""
    entries, errors = [], []
    for r in rows:
        if r.get("error"):
            errors.append({"partition": int(r["partition"]), "error": r["error"]})
            continue
        if not r["path"]:
            # fully-suppressed partition (every incoming row was a
            # no-op re-publish): no delta file exists, nothing to commit
            continue
        entries.append(
            FileEntry(
                path=r["path"],
                partition=int(r["partition"]),
                rows=int(r["rows"]),
                bytes=int(r["bytes"]),
                max_lsn=int(r["max_lsn"]),
            )
        )
    return entries, errors


_TARGET_SHUFFLE_BLOCK = 32 << 20  # ~32 MiB of input per sort-map task


def _read_blocks_for(total_bytes: int) -> int:
    """Choose override_num_blocks for the epoch read: 2 blocks per core
    keeps every core busy through both sides of the sort shuffle
    (measured best at 8 and 32 cpus on 0.5-2.5 GiB epochs), floored so
    tiny epochs don't get sliced below ~4 MiB blocks, and raised so no
    block exceeds ~128 MiB — at low cpu counts a multi-GiB epoch would
    otherwise land in a handful of near-GiB blocks that pipeline poorly
    and squeeze the object store."""
    import ray

    fixed = os.environ.get("GDP_READ_BLOCKS")
    if fixed:
        return int(fixed)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    by_bytes = max(1, total_bytes // (4 << 20))
    block_cap_floor = -(-total_bytes // (128 << 20))  # ceil: no block > ~128 MiB
    return int(max(1, block_cap_floor, min(cpus * 2, by_bytes)))


def _resolve_slice_bytes(value) -> int | None:
    """Resolve slice_bytes / GDP_SLICE_BYTES: an int(-like) passes
    through; ``"auto"`` derives the backlog bound from the live object
    store — a quarter of its capacity, the ratio the design-point demo
    validated (tools/bench_backlog.py: 1.5 GiB slices on a 6 GiB
    store completed with zero spill), leaving headroom for the
    exchange's in-flight blocks on both sides."""
    if not value:
        return None
    if str(value).strip().lower() == "auto":
        import ray

        if not ray.is_initialized():
            return None
        store = ray.cluster_resources().get("object_store_memory", 0)
        return int(store // 4) or None
    return int(value) or None


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def _parquet_dir_schema(path: str):
    """Unified Arrow schema of all parquet files in a directory (driver
    side, metadata only)."""
    import pyarrow as pa

    from .. import schema as schema_mod

    schemas = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            schemas.append(pq.read_schema(os.path.join(path, name)))
    if not schemas:
        return pa.schema([])
    return schema_mod.unify(*schemas)


def parse_shard(s: str) -> tuple[int, int]:
    """Parse and validate ``k/n`` (0-indexed, 0 <= k < n).  Shared by
    every CLI/env entry point: an unvalidated 1-indexed ``2/2`` would
    own no partition and silently drop every row at the exchange."""
    parts = s.split("/")
    if len(parts) != 2:
        raise ValueError(f"shard must be K/N, got {s!r}")
    k, n = int(parts[0]), int(parts[1])
    if not (0 <= k < n):
        raise ValueError(
            f"shard {k}/{n} is out of range: shards are 0-indexed, "
            f"need 0 <= k < n"
        )
    return (k, n)


def _shard_from_env() -> tuple[int, int] | None:
    """Optional key-space shard ``GDP_SHARD=k/n``: this driver ingests
    only partitions with ``part % n == k`` — n independent driver
    processes (each with its own lake, object store and Ray session)
    cover the full key space, the horizontal-sharding analog of the
    reference running one consumer service per index shard."""
    s = os.environ.get("GDP_SHARD")
    if not s:
        return None
    return parse_shard(s)


def _resolve_shard(
    man: Manifest, shard: tuple[int, int] | None
) -> tuple[int, int] | None:
    """The lake's persisted shard (lake.json) is authoritative: callers
    may omit it (it is read back) but may not contradict it — applying
    shard 1/2 into a lake bootstrapped as 0/2 (or into an UNSHARDED
    lake) would silently corrupt the key-space ownership invariant
    verify relies on."""
    persisted = man.shard
    if shard is None:
        return persisted
    shard = tuple(shard)
    if not (0 <= shard[0] < shard[1]):
        raise ValueError(f"shard {shard[0]}/{shard[1]}: need 0 <= k < n")
    if persisted is None:
        # a fresh bootstrap persists the shard at lake creation, so by
        # resolve time persisted == shard; None here means an EXISTING
        # unsharded lake — filtering it by a shard would silently drop
        # the other shards' keys from a lake that owns the full space
        raise ValueError(
            f"lake {man.lake_dir} is unsharded but got shard "
            f"{shard[0]}/{shard[1]}: a shard is fixed at bootstrap "
            "(re-bootstrap, or grow a fleet with split_shard)"
        )
    if shard != persisted:
        raise ValueError(
            f"lake {man.lake_dir} is shard {persisted[0]}/{persisted[1]}, "
            f"got --shard {shard[0]}/{shard[1]}"
        )
    return shard


def bootstrap(
    base_dir: str,
    lake_dir: str,
    num_partitions: int,
    *,
    batch_size: int = 65536,
    merge_spec=None,
    shard: tuple[int, int] | None = None,
) -> dict:
    """Load the initial base table (F1) into the partitioned lake as
    compaction record 0 (``upto_epoch=-1``).  ``merge_spec`` fixes the
    entity's merge semantics at creation (default: pages LWW); it is
    persisted in lake.json and every later stage reads it from there."""
    rd = _ray_data()
    shard = shard if shard is not None else _shard_from_env()
    man = Manifest(lake_dir, num_partitions, merge_spec=merge_spec, shard=shard)
    spec = man.merge_spec
    shard = _resolve_shard(man, shard)
    if man.load_state().base:
        # _resolve_shard above already refused a shard contradicting (or
        # absent from) the existing lake.json; nothing to re-load
        return {"skipped": True}
    t0 = time.perf_counter()
    ds = rd.read_parquet(
        base_dir, override_num_blocks=_read_blocks_for(_dir_bytes(base_dir))
    )
    ds = ds.map_batches(
        AddPartitionAndCombine(num_partitions, combine=False, spec=spec, shard=shard),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    stats = ds.groupby("part").map_groups(
        BaseWriter(lake_dir, tag="c000000", spec=spec), batch_format="pyarrow"
    )
    entries, _ = _stats_to_entries(stats.take_all())
    man.commit_compaction(-1, entries, _parquet_dir_schema(base_dir), cid=0)
    return {
        "skipped": False,
        "partitions": len(entries),
        "rows": sum(e.rows for e in entries),
        "sec": time.perf_counter() - t0,
    }


def apply_epoch(
    events_dir: str,
    lake_dir: str,
    epoch: int,
    *,
    salt: int = 0,
    batch_size: int = 65536,
    force: bool = False,
    patch_rules: tuple = (),
    fault: dict | None = None,
    shard: tuple[int, int] | None = None,
    parallelism_scale: float = 1.0,
    slice_bytes: int | None = None,
) -> dict:
    """Apply one epoch of change events; idempotent (skip if committed).

    ``slice_bytes`` (or env ``GDP_SLICE_BYTES``) bounds the backlog
    INSIDE an epoch: a catch-up epoch larger than the bound is applied
    as several file-granular passes, each writing its own
    ``delta_{epoch}_sNNN`` files, with ONE manifest commit listing them
    all — the exchange working set never exceeds one slice.

    ``force=True`` re-applies a committed epoch from its current files —
    the late-data/backfill path (the analog of re-publishing old ticks,
    `transactions-producer/domain/processor.go:76-96` PublishSingleTicks):
    if the epoch directory gained late event files, the delta and the
    manifest record are rebuilt; if nothing changed, the rewrite is
    byte-identical (idempotent overwrite).

    Force is refused once the epoch has been folded into a compacted
    base for any partition: the rebuilt delta would be invisible to
    ``LakeState.live_files`` (it only serves deltas newer than the
    base), so the late rows would be silently lost.  Late data for a
    compacted epoch must be re-submitted as a NEW epoch instead."""
    rd = _ray_data()
    man = Manifest(lake_dir)
    if man.has_epoch(epoch) and not force:
        return {"epoch": epoch, "skipped": True}
    if force:
        state = man.load_state()
        folded = [
            p
            for p in range(man.num_partitions)
            if state.base_upto_epoch.get(p, -1) >= epoch
        ]
        if folded:
            raise ValueError(
                f"cannot force-reapply epoch {epoch}: already folded into the "
                f"compacted base of partition(s) {folded[:8]} "
                f"(base_upto_epoch >= {epoch}); re-submit late data as a new "
                f"epoch (see pipelines/apply.py docstring)"
            )
    if epoch <= man.compaction_horizon():
        # fully folded into every partition's base (e.g. a lake
        # repartitioned from a source that had already ingested this
        # epoch): the delta would be invisible to live_files — skip
        return {"epoch": epoch, "skipped": True, "folded": True}
    t0 = time.perf_counter()
    edir = os.path.join(events_dir, f"epoch={epoch}")
    if not os.path.isdir(edir) or not any(
        f.endswith(".parquet") for f in os.listdir(edir)
    ):
        # empty epoch: commit an empty fence so resume logic stays simple
        # (src_files/src_bytes recorded so tail() can detect late growth)
        man.commit_epoch(
            epoch,
            [],
            man.load_state().schema,
            metrics={"events": 0, "src_files": 0, "src_bytes": 0},
            overwrite=force,
        )
        return {"epoch": epoch, "skipped": False, "events": 0, "sec": 0.0}

    src_files = sorted(f for f in os.listdir(edir) if f.endswith(".parquet"))
    n_events = sum(
        pq.ParquetFile(os.path.join(edir, f)).metadata.num_rows for f in src_files
    )
    src_bytes = sum(os.path.getsize(os.path.join(edir, f)) for f in src_files)
    spec = man.merge_spec
    shard = _resolve_shard(man, shard if shard is not None else _shard_from_env())
    use_hash_exchange = os.environ.get("GDP_EXCHANGE") == "hash" and salt <= 1
    suppress_kw: dict = {}
    if spec.suppress_unchanged:
        # ship each partition's PRE-epoch live-file list + the light
        # read schema to the delta writers (stages/merge.py _finalize).
        # force=True compares against the view AS OF epoch-1 — the
        # current view includes this epoch's own old delta, and
        # comparing against oneself would suppress every unchanged row
        # and replace the old delta with nothing (data loss)
        import pyarrow as pa

        from .. import schema as schema_mod

        state = man.load_state()
        upto = epoch - 1 if force else None
        live_specs = {}
        for p in range(man.num_partitions):
            b, ds_ = state.live_files(p, upto)
            if b or ds_:
                live_specs[p] = {
                    "base": b.to_dict() if b else None,
                    "deltas": [d.to_dict() for d in ds_],
                }
        names = [spec.key_cols[0], *spec.order_cols]
        if spec.lsn_col not in names:
            names.append(spec.lsn_col)
        fields = [state.schema.field(nm) for nm in names]
        fields += [pa.field("op", pa.string()), pa.field("value_md5", pa.string())]
        suppress_kw = {
            "live_specs": live_specs,
            "light_schema_json": schema_mod.schema_to_json(pa.schema(fields)),
        }
    fault = fault or {}
    # test hook for the adaptive-retry path: a mutable countdown that
    # makes the next N applies fail like a transient job error
    _times = fault.get("raise_times")
    if _times and _times[0] > 0:
        _times[0] -= 1
        raise RuntimeError("injected transient apply failure (fault.raise_times)")

    def _one_pass(paths: list[str], nbytes: int, slice_tag: str) -> list[dict]:
        """One read→normalize→exchange→delta-write pass over a file
        subset of the epoch; returns the writer stats rows."""

        def _normalized():
            blocks = max(1, int(_read_blocks_for(nbytes) * parallelism_scale))
            ds = rd.read_parquet(paths, override_num_blocks=blocks)
            ds = ds.map_batches(
                AddPartitionAndCombine(
                    man.num_partitions,
                    salt=salt,
                    patch_rules=patch_rules,
                    spec=spec,
                    shard=shard,
                ),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
            if salt > 1:
                import functools

                salted = functools.partial(collapse_group, spec=spec)
                ds = ds.groupby(["part", "salt"]).map_groups(
                    salted, batch_format="pyarrow"
                )
            return ds

        writer_kw = dict(
            crash_marker=fault.get("crash_marker"),
            poison_parts=tuple(fault.get("poison_parts", ())),
            spec=spec,
            slice_tag=slice_tag,
            **suppress_kw,
        )
        # Exchange choice (GDP_EXCHANGE): "sort" (default) = groupby(part)
        # sort shuffle; "hash" = hash repartition on part + whole-block
        # multi-partition writer — no global sort of payload rows (the sort
        # is the memcpy-heavy step on wide binary rows; a hash exchange only
        # moves each row once).  Requires DataContext.shuffle_strategy =
        # HASH_SHUFFLE to take effect (see bench.py).
        if use_hash_exchange:
            # NOTE: HASH_SHUFFLE is scoped to this epoch's dataset —
            # groupby().map_groups hangs under it in ray 2.49, so the
            # strategy must not leak to other pipelines in the session.  The
            # Dataset snapshots DataContext at CREATION, so the scoped switch
            # wraps the read/map construction too — and sits inside the same
            # try/finally so an exception while BUILDING the pipeline (not
            # just executing it) cannot leak HASH_SHUFFLE session-wide.
            from ray.data import DataContext
            from ray.data.context import ShuffleStrategy

            from ..stages.merge import MultiPartDeltaWriter

            _ctx = DataContext.get_current()
            _prev_strategy = _ctx.shuffle_strategy
            try:
                _ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
                stats = _normalized().repartition(
                    num_blocks=man.num_partitions, keys=["part"]
                ).map_batches(
                    MultiPartDeltaWriter(lake_dir, epoch, **writer_kw),
                    batch_format="pyarrow",
                    batch_size=None,
                )
                return stats.take_all()
            finally:
                _ctx.shuffle_strategy = _prev_strategy
        elif os.environ.get("GDP_EXCHANGE") == "ref" and salt <= 1:
            # payload-reference exchange: only light key rows go through
            # the sort shuffle; payload bytes take the map-side spill-file
            # path (written once, read once, per-partition files on shared
            # lake storage).  See stages/merge.py PayloadSpill/RefDeltaWriter.
            import shutil as _shutil

            from ..stages.merge import PayloadSpill, RefDeltaWriter

            column_order = [
                n for n in epoch_schema.names if n not in ("epoch", "part")
            ]
            spill_dir = os.path.join(
                lake_dir, "spill", f"epoch={epoch:06d}{slice_tag}"
            )
            _shutil.rmtree(spill_dir, ignore_errors=True)  # orphans from a crash
            os.makedirs(spill_dir, exist_ok=True)
            light = _normalized().map_batches(
                PayloadSpill(spill_dir, spec=spec), batch_format="pyarrow"
            )
            stats = light.groupby("part").map_groups(
                RefDeltaWriter(
                    lake_dir,
                    epoch,
                    spill_dir=spill_dir,
                    column_order=column_order,
                    **writer_kw,
                ),
                batch_format="pyarrow",
            )
            rows = stats.take_all()
            _shutil.rmtree(spill_dir, ignore_errors=True)  # transient shuffle files
            return rows
        else:
            stats = _normalized().groupby("part").map_groups(
                DeltaWriter(lake_dir, epoch, **writer_kw),
                batch_format="pyarrow",
            )
            return stats.take_all()

    # Sub-epoch backlog bound (the MaxPollRecords analog,
    # `transactions-consumer/main.go:56`): an oversized catch-up epoch
    # (upstream outage -> one giant epoch) is applied in file-granular
    # slices of <= slice_bytes each, so the exchange working set is
    # bounded by the slice size regardless of backlog.  Slices write
    # delta_{epoch}_sNNN files side by side and commit under ONE epoch
    # record — the LWW merge kernels are associative (unique lsn
    # tie-breaker), so slice boundaries cannot change the merged state.
    # ONE whole-epoch schema probe (footer metadata), shared by every
    # slice's ref-exchange column_order and by the commit below — a
    # per-slice probe would re-open every footer of exactly the
    # oversized epochs slicing targets
    epoch_schema = _parquet_dir_schema(edir)
    if os.environ.get("GDP_EXCHANGE") == "ref" and salt <= 1:
        # pre-sweep ALL spill dirs of this epoch regardless of slice tag:
        # a crashed earlier attempt may have sliced differently, and the
        # per-pass rmtree only covers the current tags
        import shutil as _shutil

        spill_root = os.path.join(lake_dir, "spill")
        if os.path.isdir(spill_root):
            for name in os.listdir(spill_root):
                if name == f"epoch={epoch:06d}" or name.startswith(
                    f"epoch={epoch:06d}_s"
                ):
                    _shutil.rmtree(os.path.join(spill_root, name), ignore_errors=True)

    slice_bytes = _resolve_slice_bytes(
        slice_bytes or os.environ.get("GDP_SLICE_BYTES")
    )
    groups: list[list[str]] = [src_files]
    if slice_bytes and src_bytes > slice_bytes and len(src_files) > 1:
        groups, cur, cur_b = [], [], 0
        for f in src_files:
            sz = os.path.getsize(os.path.join(edir, f))
            if cur and cur_b + sz > slice_bytes:
                groups.append(cur)
                cur, cur_b = [], 0
            cur.append(f)
            cur_b += sz
        groups.append(cur)
    if len(groups) > 1 and spec.suppress_unchanged:
        # UNSOUND together: slices collapse per-slice and compare
        # against the PRE-epoch view, so a later slice's no-op row can
        # be suppressed while an earlier slice's mid-epoch value
        # survives and wins LWW — the final payload would differ from
        # replay.  Suppression requires whole-epoch collapse; apply an
        # oversized backlog epoch unsuppressed (or renumber it).  The
        # guard fires only when slicing actually engages, so
        # GDP_SLICE_BYTES=auto stays usable on suppressed lakes whose
        # epochs fit one slice.
        raise ValueError(
            "slice_bytes cannot be combined with a suppress_unchanged "
            "entity: per-slice collapse breaks the epoch-winner-vs-"
            "current-view comparison (see apply_epoch docstring)"
        )

    entries, errors = [], []
    for i, group in enumerate(groups):
        tag = f"_s{i:03d}" if len(groups) > 1 else ""
        paths = [os.path.join(edir, f) for f in group]
        nbytes = sum(os.path.getsize(p) for p in paths)
        e2, r2 = _stats_to_entries(_one_pass(paths, nbytes, tag))
        entries += e2
        errors += r2
    if errors:
        # skip-and-record is ALL-or-nothing per partition: a partition
        # deadlettered in any slice is excluded from this commit entirely
        # (other slices' files for it are never referenced by a manifest
        # record — vacuum(include_orphans=True) reclaims them; plain
        # vacuum() only sweeps superseded manifest history) — a
        # half-applied partition would serve wrong reads until the
        # operator force-reapplies.  Deadletter one record per partition.
        bad = {err["partition"] for err in errors}
        entries = [fe for fe in entries if fe.partition not in bad]
        errors = [
            next(err for err in errors if err["partition"] == p) for p in sorted(bad)
        ]

    if "epoch" in epoch_schema.names:
        epoch_schema = epoch_schema.remove(epoch_schema.get_field_index("epoch"))
    sec = time.perf_counter() - t0
    man.commit_epoch(
        epoch,
        entries,
        epoch_schema,
        metrics={
            "events": n_events,
            # source-directory size at apply time — tail() compares these
            # to detect epochs that grew after commit (late files)
            "src_files": len(src_files),
            "src_bytes": src_bytes,
            "sec": round(sec, 4),
            "events_per_sec": round(n_events / sec, 1) if sec > 0 else None,
            "delta_rows": sum(e.rows for e in entries),
            "delta_bytes": sum(e.bytes for e in entries),
            # skip-and-record: poisoned partitions excluded from this
            # commit, recorded here and under deadletter/
            "deadletter_parts": sorted(e["partition"] for e in errors),
            # recorded when the adaptive-retry path shrank this epoch's
            # task width after consecutive errors
            **(
                {"parallelism_scale": parallelism_scale}
                if parallelism_scale != 1.0
                else {}
            ),
            # recorded when the sub-epoch backlog bound sliced this epoch
            **({"slices": len(groups)} if len(groups) > 1 else {}),
        },
        overwrite=force,
    )
    return {
        "epoch": epoch,
        "skipped": False,
        "events": n_events,
        "sec": sec,
        "deadletter_parts": sorted(e["partition"] for e in errors),
    }


def apply_epoch_adaptive(
    events_dir: str,
    lake_dir: str,
    epoch: int,
    *,
    retries: int = 2,
    backoff_sec: float = 0.0,
    **kw,
) -> dict:
    """Adaptive degradation on consecutive errors — the Ray-native
    analog of the reference shrinking its worker pool after repeated
    tick failures and growing it back on success
    (`status-service/sync/tick_processor.go:361-369`): each retry of a
    failed epoch HALVES the task parallelism (fewer, larger read blocks
    -> fewer concurrent tasks -> less peak memory/IO pressure, the usual
    cause of transient batch-job failure) after an exponential-backoff
    sleep.  A success returns immediately; the caller's next epoch runs
    at full width again (shrink is per-epoch, recovery is instant, like
    the reference's pool regrowth).  Config errors (``ValueError``:
    folded-epoch refusal, shard conflict) are never retried — they
    cannot succeed at any width.
    """
    scale = 1.0
    last: Exception | None = None
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(backoff_sec * (2 ** (attempt - 1)))
        try:
            out = apply_epoch(
                events_dir, lake_dir, epoch, parallelism_scale=scale, **kw
            )
            if attempt:
                out["attempts"] = attempt + 1
                out["parallelism_scale"] = scale
            return out
        except ValueError:
            raise
        except Exception as e:  # noqa: BLE001 — transient job failure
            last = e
            scale /= 2
    raise RuntimeError(
        f"epoch {epoch} failed after {retries + 1} attempts "
        f"(final parallelism_scale {scale * 2})"
    ) from last


def sweep_orphan_spill(lake_dir: str, man: Manifest | None = None) -> list[str]:
    """Startup GC for the ref exchange's transient shuffle files: a
    driver that crashes mid-``take_all`` leaves ``spill/epoch=E`` behind.
    An UNcommitted epoch's spill is rebuilt (rmtree'd) when the epoch is
    retried, but a crash during a ``force=True`` reapply of an already
    COMMITTED epoch orphans the dir forever — nothing would retry it.
    Sweep spill dirs whose epoch is committed; returns removed names."""
    import shutil

    man = man or Manifest(lake_dir)
    spill_root = os.path.join(lake_dir, "spill")
    if not os.path.isdir(spill_root):
        return []
    done = set(man.committed_epochs())
    removed = []
    for name in sorted(os.listdir(spill_root)):
        if not name.startswith("epoch="):
            continue
        try:
            # slice-tagged spill dirs (epoch=000005_s001) parse too
            e = int(name.split("=", 1)[1].split("_s", 1)[0])
        except ValueError:
            continue
        if e in done:
            shutil.rmtree(os.path.join(spill_root, name), ignore_errors=True)
            removed.append(name)
    return removed


def discover_epochs(events_dir: str) -> list[int]:
    out = []
    for name in os.listdir(events_dir):
        if not name.startswith("epoch="):
            continue
        try:
            out.append(int(name.split("=", 1)[1]))
        except ValueError:
            continue  # temp/crash leftovers (epoch=N.tmp-replica etc.)
    return sorted(out)


def apply_log(
    events_dir: str,
    lake_dir: str,
    *,
    salt: int = 0,
    stop_after: int | None = None,
    batch_size: int = 65536,
    compact_every: int | None = None,
    compact_min_deltas: int = 2,
    compact_delta_ratio: float | None = None,
    patch_rules: tuple = (),
    shard: tuple[int, int] | None = None,
    retries: int = 0,
    fault: dict | None = None,
    slice_bytes: int | None = None,
) -> list[dict]:
    """Serial epoch loop with resume: committed epochs are skipped (the
    watermark+1 resume of `transactions-producer/domain/processor.go:194-210`,
    realized structurally instead of via a stored tick).

    ``compact_every=K`` folds deltas into new bases after every K
    applied epochs — the LSM maintenance policy bounding per-partition
    read amplification (live files per partition stays <= K+1).
    ``compact_delta_ratio`` makes each sweep size-tiered (see
    ``compact``): cold partitions with one tiny delta atop a huge base
    skip the rewrite until the ratio or the ``compact_min_deltas``
    count backstop trips.
    """
    man = Manifest(lake_dir)
    # validate up front even if every epoch turns out committed: a
    # misconfigured shard should fail loudly, not no-op
    shard = _resolve_shard(man, shard if shard is not None else _shard_from_env())
    sweep_orphan_spill(lake_dir, man)
    done = set(man.committed_epochs())
    horizon = man.compaction_horizon()  # once per run, not per epoch
    admin = man.admin_epochs
    results = []
    applied = 0
    for epoch in discover_epochs(events_dir):
        if epoch in admin:
            # an upstream epoch dir colliding with an administrative
            # (erasure) epoch would be silently swallowed by the
            # skip-committed check — that is upstream data LOSS, so fail
            # loudly instead (see maintain.erase_keys docstring)
            raise ValueError(
                f"upstream epoch {epoch} collides with administrative "
                f"epoch {epoch} (key erasure); renumber upstream epochs "
                f"past {max(admin)} or re-submit this epoch under a new "
                "number"
            )
        if epoch in done:
            results.append({"epoch": epoch, "skipped": True})
            continue
        if epoch <= horizon:
            results.append({"epoch": epoch, "skipped": True, "folded": True})
            continue
        results.append(
            apply_epoch_adaptive(
                events_dir,
                lake_dir,
                epoch,
                retries=retries,
                salt=salt,
                batch_size=batch_size,
                patch_rules=patch_rules,
                shard=shard,
                fault=fault,
                slice_bytes=slice_bytes,
            )
        )
        applied += 1
        if compact_every and applied % compact_every == 0:
            from .compact import compact

            results.append(
                {
                    "compaction": compact(
                        lake_dir,
                        min_deltas=compact_min_deltas,
                        delta_ratio=compact_delta_ratio,
                    )
                }
            )
        if stop_after is not None and applied >= stop_after:
            break
    return results
