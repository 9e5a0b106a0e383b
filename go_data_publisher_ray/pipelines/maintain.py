"""Lake maintenance: physical file GC (vacuum) and partition-count
rewrite (repartition) — the operability half of the LSM lakehouse.

``vacuum`` is the Delta-Lake-VACUUM analog for the manifest-log lake:
compaction (`compact.py`) folds deltas into a new base but leaves the
superseded base and the folded delta files on disk (the manifest simply
stops serving them).  Vacuum deletes every data file that the CURRENT
live view can no longer reach.  The reference never needs this — its
state lives in ES/Kafka with their own retention — but a 100 TB parquet
lake that compacts hourly would otherwise double its footprint per
compaction cycle.

``repartition_lake`` rewrites a lake into a NEW lake with a different
partition count — the grow-the-cluster operation (4N nodes want 4P
partitions so per-partition merge tasks stay right-sized).  It streams
the merged snapshot through the standard url-hash exchange into fresh
base files and stamps the new lake's bootstrap compaction with the
source's committed-epoch watermark, so ``apply_log`` on the new lake
resumes the SAME change log from the next epoch (folded epochs are
skipped, not re-applied).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa

from .. import schema as schema_mod
from ..stages.merge import AddPartitionAndCombine, BaseWriter, atomic_write_parquet
from ..state.manifest import FileEntry, Manifest, atomic_write_json, read_json
from .apply import _stats_to_entries
from .snapshot import snapshot


def _data_files_on_disk(lake_dir: str) -> list[str]:
    """All parquet (and leftover write-temp) files under part=*/,
    lake-relative."""
    out = []
    for d in sorted(os.listdir(lake_dir)):
        if not d.startswith("part="):
            continue
        pdir = os.path.join(lake_dir, d)
        if not os.path.isdir(pdir):
            continue
        for f in sorted(os.listdir(pdir)):
            out.append(os.path.join(d, f))
    return out


def vacuum(lake_dir: str, *, include_orphans: bool = False) -> dict:
    """Delete data files unreachable from the lake's live view.

    Removes (a) base files superseded by a later compaction and
    (b) delta files at or below the compaction horizon (already folded
    into a base).  Time-travel / changefeed reads behind the compaction
    horizon were ALREADY refused by ``LakeState.live_files`` (compaction
    is the retention horizon), so vacuum only reclaims bytes — it never
    tightens a read that was previously possible.

    ``include_orphans=True`` additionally sweeps files no manifest
    record references at all (leftovers of a crashed pre-commit apply)
    including ``.tmp-*`` write-temps.  Orphan sweeping must not run
    concurrently with an in-flight apply on the same lake — a not-yet-
    committed epoch's freshly written deltas look exactly like orphans
    (same caveat as the reference's offset-before-index crash window,
    `transactions-consumer/consume/transaction_consumer.go:150-154`).

    Driver-side, O(files) metadata work; no Ray tasks.
    """
    man = Manifest(lake_dir)
    state = man.load_state()
    live: set[str] = set()
    for part in range(man.num_partitions):
        base, deltas = state.live_files(part)
        if base is not None:
            live.add(base.path)
        live.update(d.path for d in deltas)
    referenced: set[str] = set()
    for name in os.listdir(man.manifest_dir):
        if name.endswith(".json"):
            rec = read_json(os.path.join(man.manifest_dir, name))
            referenced.update(f["path"] for f in rec.get("files", []))

    deleted, reclaimed, orphans = [], 0, []
    for rel in _data_files_on_disk(lake_dir):
        if rel in live:
            continue
        abspath = os.path.join(lake_dir, rel)
        if rel in referenced:
            reclaimed += os.path.getsize(abspath)
            os.remove(abspath)
            deleted.append(rel)
        elif include_orphans:
            reclaimed += os.path.getsize(abspath)
            os.remove(abspath)
            orphans.append(rel)

    # replica lakes keep the converted feed events under _replica_events
    # until their epoch commits; after that the chunks are dead bytes
    # (replicate() skips committed epochs by fingerprint alone) — and
    # they would otherwise survive erase_keys, breaking its "no byte of
    # the key survives under the lake root" claim.  The _feed.json
    # fingerprints stay so replicate() still recognizes the epochs.
    replica_events = 0
    ev_root = os.path.join(lake_dir, "_replica_events")
    if os.path.isdir(ev_root):
        done = set(state.committed_epochs)
        for d in sorted(os.listdir(ev_root)):
            if not d.startswith("epoch="):
                continue
            try:
                e = int(d.split("=", 1)[1])
            except ValueError:
                continue
            if e not in done:
                continue
            edir = os.path.join(ev_root, d)
            # an epoch whose force-reapply is still owed (replicate()
            # crashed between conversion and apply) needs its chunks:
            # sweeping them would make the force-apply commit an EMPTY
            # epoch and silently drop the republished changes
            fp_path = os.path.join(edir, "_feed.json")
            if os.path.exists(fp_path) and read_json(fp_path).get("force_pending"):
                continue
            for f in sorted(os.listdir(edir)):
                if f.endswith(".parquet"):
                    p = os.path.join(edir, f)
                    reclaimed += os.path.getsize(p)
                    os.remove(p)
                    replica_events += 1
    return {
        "files_deleted": len(deleted),
        "orphans_deleted": len(orphans),
        "replica_event_files_deleted": replica_events,
        "bytes_reclaimed": reclaimed,
    }


def repartition_lake(
    src_lake: str,
    dst_lake: str,
    num_partitions: int,
    *,
    batch_size: int = 65536,
) -> dict:
    """Rewrite ``src_lake`` into ``dst_lake`` with a new partition count.

    One streaming pass: per-partition snapshot merge (tombstones
    resolved, so the new base starts clean) -> the standard url-hash
    exchange keyed to the NEW partition count -> per-partition sorted
    base writes from the workers.  The destination's bootstrap
    compaction record carries ``upto_epoch = source watermark``, so
    ``apply_log`` of the same change log resumes at the next epoch —
    already-ingested epochs are skipped as folded, not re-applied.

    Sharded lakes are refused: key ownership is ``hash(key) % P % n``,
    so changing P silently re-deals the key space across a shard fleet;
    repartitioning a sharded deployment means re-bootstrapping every
    shard with the same new P (see ``pipelines/shard.py``).
    """
    t0 = time.perf_counter()
    man_src = Manifest(src_lake)
    if man_src.shard is not None:
        raise ValueError(
            f"cannot repartition sharded lake {src_lake} (shard "
            f"{man_src.shard[0]}/{man_src.shard[1]}): changing the partition "
            "count re-deals key ownership across the shard fleet; "
            "re-bootstrap every shard with the new partition count instead"
        )
    state = man_src.load_state()
    watermark = max(state.committed_epochs, default=-1)
    spec = man_src.merge_spec

    if os.path.exists(os.path.join(dst_lake, "lake.json")):
        raise ValueError(f"destination lake {dst_lake} already exists")
    man_dst = Manifest(dst_lake, num_partitions, merge_spec=spec)
    # administrative (erasure) epoch claims are part of the log's
    # identity, not the physical layout: without them the new lake's
    # apply_log would silently skip-as-folded an upstream epoch that
    # collides with an erasure number instead of refusing it
    if man_src.admin_epochs:
        man_dst.meta["admin_epochs"] = sorted(man_src.admin_epochs)
        atomic_write_json(os.path.join(dst_lake, "lake.json"), man_dst.meta)

    ds = snapshot(src_lake)  # merged live rows, lineage (lsn) kept
    ds = ds.map_batches(
        AddPartitionAndCombine(num_partitions, combine=False, spec=spec),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    stats = ds.groupby("part").map_groups(
        BaseWriter(dst_lake, tag="c000000", spec=spec), batch_format="pyarrow"
    )
    entries, _ = _stats_to_entries(stats.take_all())

    base_schema = state.schema if state.schema is not None else pa.schema([])
    if "op" in base_schema.names:
        base_schema = base_schema.remove(base_schema.get_field_index("op"))
    # partitions that received zero rows still need a (zero-row) base
    # entry: compaction_horizon() is the min over ALL partitions, so one
    # absent partition would silently drop the resume fence to -1 and
    # apply_log would re-apply the entire already-ingested change log
    present = {e.partition for e in entries}
    for part in range(num_partitions):
        if part in present:
            continue
        rel = os.path.join(f"part={part:05d}", "base_c000000.parquet")
        abspath = os.path.join(dst_lake, rel)
        os.makedirs(os.path.dirname(abspath), exist_ok=True)
        size = atomic_write_parquet(base_schema.empty_table(), abspath)
        entries.append(
            FileEntry(path=rel, partition=part, rows=0, bytes=size, max_lsn=0)
        )
    man_dst.commit_compaction(watermark, entries, base_schema, cid=0)
    return {
        "partitions": len(entries),
        "rows": sum(e.rows for e in entries),
        "bytes": sum(e.bytes for e in entries),
        "resumes_after_epoch": watermark,
        "sec": time.perf_counter() - t0,
    }


def erase_keys(
    lake_dir: str,
    keys: list,
    *,
    vacuum_after: bool = True,
    feed_dirs: tuple[str, ...] = (),
) -> dict:
    """Right-to-be-forgotten erasure: physically remove every byte of
    the given keys from the lake — current state AND history — and,
    for each published changefeed in ``feed_dirs``, from the feed's
    published history too.

    Composed from the engine's own primitives, in order:

    1. an administrative tombstone epoch (``max committed + 1``) whose
       order columns are bumped past the keys' current winners, applied
       through the normal idempotent path (so the erasure itself is
       crash-safe and replayable);
    2. for each feed dir: ``publish_changefeed`` (so the tombstone
       epoch reaches downstream replicas as an ordinary delete — this
       must happen BEFORE the compaction below folds the history the
       diff needs) then ``publish.erase_feed_keys`` (drops the keys'
       upsert rows from every published epoch and nulls the payload of
       their delete tombstones — Kafka-compaction semantics; see its
       docstring for the retention step that removes the key identifier
       itself);
    3. a TARGETED compaction of only the touched partitions — folding
       drops tombstones and every historical version, and raises those
       partitions' compaction horizon past all prior epochs, so
       time-travel/changefeed reads that could resurface the key are
       refused from now on;
    4. ``vacuum`` to delete the superseded files that still hold the
       key's bytes.

    Scope: steps 1+3+4 guarantee no byte of the key survives under the
    LAKE root.  Published feeds are durable downstream copies and are
    only cleaned when passed via ``feed_dirs`` (or by running
    ``erase_feed_keys`` + ``retire_feed_epochs`` on them directly);
    replica lakes and bootstrap exports are further copies that need
    their own erase_keys / re-export, exactly as in the reference's
    Kafka->ES fan-out, where each store deletes separately.

    The tombstone epoch claims a position in the lake's epoch sequence:
    run erasure on a caught-up lake (or renumber upstream epochs past
    it), exactly like any administrative commit in a log-ordered system.
    Entities without tombstone semantics cannot be erased this way and
    raise.
    """
    import pyarrow.parquet as pq

    from ..functions.hashing import partition_for
    from .apply import apply_epoch
    from .compact import compact
    from .snapshot import lookup_keys

    man = Manifest(lake_dir)
    spec = man.merge_spec
    if not spec.has_tombstones:
        raise ValueError(
            f"entity with merge spec {spec.to_dict()} has no tombstone "
            "semantics; key erasure is undefined for it"
        )
    # a replica with a pending force-reapply holds event chunks vacuum
    # deliberately will NOT sweep (they are owed to the force) — erasing
    # now would report success while the key's bytes survive in them;
    # refuse until replicate() completes the owed apply
    ev_root = os.path.join(lake_dir, "_replica_events")
    if os.path.isdir(ev_root):
        pending = [
            d
            for d in sorted(os.listdir(ev_root))
            if os.path.exists(os.path.join(ev_root, d, "_feed.json"))
            and read_json(os.path.join(ev_root, d, "_feed.json")).get("force_pending")
        ]
        if pending:
            raise ValueError(
                f"replica has pending force-reapply for {pending}: run "
                "replicate() to completion before erasing keys (vacuum "
                "cannot sweep chunks owed to a pending force)"
            )
    state = man.load_state()
    epochs = state.committed_epochs
    kcol = spec.key_cols[0]
    if spec.key_normalizer:
        # the lake stores CANONICAL keys: an erase requested under a
        # variant spelling must fold/vacuum the canonical key's
        # partition, not the raw spelling's hash target
        from ..functions.url import normalize_keys

        keys = normalize_keys(keys, spec.key_normalizer)
    # partitions of EVERY requested key: a key the upstream log already
    # tombstoned has no live row but its historical versions still sit
    # in that partition's delta files — they must fold and vacuum too
    parts = {int(p) for p in partition_for(pa.array(keys), man.num_partitions)}
    current = lookup_keys(lake_dir, keys)
    erase_epoch = None

    if current.num_rows:
        erase_epoch = max(epochs, default=-1) + 1
        # tombstones that win the merge: bump every order column of the
        # current winner past it in the WINNING direction — +1 (us) for
        # last-writer-wins, -1 for a first_wins (content-addressed)
        # entity where lower order tuples win
        step = -1 if spec.first_wins else 1
        cols = {kcol: current.column(kcol)}
        for oc in spec.order_cols:
            col = current.column(oc)
            if pa.types.is_timestamp(col.type):
                bumped = pa.compute.add(col, pa.scalar(step, pa.duration(col.type.unit)))
            else:
                bumped = pa.compute.add(col, step)
            cols[oc] = bumped.cast(col.type)
        cols["op"] = pa.array(["delete"] * current.num_rows, pa.string())
        tomb = pa.table(cols)

        edir = os.path.join(lake_dir, "_erasure", f"epoch={erase_epoch}")
        os.makedirs(edir, exist_ok=True)
        pq.write_table(tomb, os.path.join(edir, "part-0.parquet"))
        # register the claimed number FIRST: if the upstream log later
        # produces an epoch with this number, apply_log refuses loudly
        # instead of silently skipping it as already-committed
        man.record_admin_epoch(erase_epoch)
        apply_epoch(os.path.join(lake_dir, "_erasure"), lake_dir, erase_epoch)

    # feed-side erasure runs BEFORE the compaction below: publishing the
    # tombstone epoch needs diff endpoints the fold is about to retire
    feed_results = {}
    if feed_dirs:
        from .publish import erase_feed_keys, feed_value_cols, publish_changefeed

        for fd in feed_dirs:
            # publish with the feed's recorded payload contract so the
            # erasure epoch is as replicable as every other epoch; a
            # legacy feed with no recorded contract gets the lake's full
            # payload universe — the safe superset (an epoch published
            # with FEWER new_* than its payload_cols_asof wedges
            # replication permanently)
            vcols = feed_value_cols(fd)
            if vcols is None:
                sch = man.load_state().schema
                ko = set(man.merge_spec.key_cols) | set(man.merge_spec.order_cols)
                vcols = tuple(
                    n for n in (sch.names if sch is not None else []) if n not in ko and n != "op"
                )
            pub = publish_changefeed(lake_dir, fd, value_cols=vcols)
            feed_results[fd] = {
                "published_upto": pub["upto"],
                **erase_feed_keys(fd, keys),
            }

    comp = compact(lake_dir, parts=parts, min_deltas=1)
    # the administrative epoch dir itself holds the keys (as tombstone
    # rows) — once committed and folded it has no further use; remove it
    # so no byte of the key survives anywhere under the lake root
    import shutil

    shutil.rmtree(os.path.join(lake_dir, "_erasure"), ignore_errors=True)
    out = {
        "erased": current.num_rows,
        "epoch": erase_epoch,
        "compacted_partitions": comp["compacted_partitions"],
    }
    if feed_dirs:
        out["feeds"] = feed_results
    if vacuum_after:
        out["vacuum"] = vacuum(lake_dir)
    return out
