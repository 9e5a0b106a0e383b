"""Outgoing change-stream: publish per-epoch changefeeds from the lake.

This is the PRODUCER half of the reference (it is, after all, a data
*publisher*: `transactions-producer/domain/processor.go:98-155` tails
upstream state and re-publishes full documents to Kafka).  Here the
lake's manifest log plays the upstream, and the feed is a directory of
epoch-partitioned parquet "topics" a downstream consumer tails:

    out_dir/
      _cursor.json        # publisher watermark (last published epoch)
      epoch=E/*.parquet   # diff(prev committed epoch, E)

Contract (mirrors the apply side's effectively-once recipe):
- a downstream consumer bootstraps from ``snapshot(upto_epoch=first)``
  and then applies feeds in epoch order: change='deleted' removes the
  key, anything else upserts the ``new_*`` values;
- each epoch's feed is written to a temp dir and atomically renamed —
  the rename is the publish point, and an existing ``epoch=E`` dir is
  skipped (idempotent re-run), so crash-between-write-and-cursor just
  re-advances the cursor;
- feeds are only derivable while both diff endpoints are at or after
  the compaction horizon: a lake compacted past the cursor raises, and
  the operator re-bootstraps downstream from a fresh snapshot (the
  standard retention trade — same reason `vacuum` is safe).

Storage note: the per-epoch dir renames here assume a rename-capable
substrate (shared POSIX fs).  On an object store the equivalent
protocol is marker-based — write the epoch's objects under the final
prefix, then commit via conditional put of a marker object
(``_epoch_meta.json`` is already positioned to be it) — see
``state/storage.py`` for the adapter the lake-core commit points
already use and the documented seam.
"""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq

from .. import schema as schema_mod
from ..state.manifest import Manifest, atomic_write_json, read_json
from .snapshot import snapshot_diff


def _cursor_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_cursor.json")


def publish_changefeed(
    lake_dir: str,
    out_dir: str,
    *,
    value_cols: tuple[str, ...] = (),
) -> dict:
    """Publish one feed directory per committed epoch beyond the cursor.

    First run records ``bootstrap_epoch`` (the earliest committed
    epoch): the downstream consumer syncs ``snapshot(upto_epoch=
    bootstrap_epoch)`` once, then consumes ``epoch=E`` feeds in order.
    Subsequent runs are incremental — call after every apply/tail round.
    """
    t0 = time.perf_counter()
    man = Manifest(lake_dir)
    epochs = man.committed_epochs()
    os.makedirs(out_dir, exist_ok=True)
    if not epochs:
        return {"published": [], "upto": None, "sec": 0.0}

    # sweep crashed-attempt temp dirs: the rename is the publish point,
    # so anything still *.tmp-publish was never published and rebuilds
    import shutil

    for name in os.listdir(out_dir):
        if name.endswith(".tmp-publish"):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    # likewise finish a feed-erase swap that crashed mid-rename (the
    # producer owns this directory; consumers only fail loudly on it)
    _recover_crashed_feed_erase(out_dir)

    # feeds are diffs between as-of views, which are only servable at
    # committed epochs >= the retention floor (compaction folds history)
    floor = man.retention_floor()
    servable = [e for e in epochs if e >= floor]

    cpath = _cursor_path(out_dir)
    if os.path.exists(cpath):
        cursor = read_json(cpath)
        # reconcile with the publish truth FIRST: epoch dirs on disk
        # (the rename is the publish point) may be ahead of the cursor
        # after a crash between rename and cursor write — those diffs
        # need no re-deriving, so they must not trip the floor check
        on_disk = [
            int(d.split("=")[1])
            for d in os.listdir(out_dir)
            if d.startswith("epoch=") and not d.endswith(".tmp-publish")
        ]
        if on_disk and max(on_disk) > cursor["upto"]:
            cursor["upto"] = max(on_disk)
            atomic_write_json(cpath, cursor)
        if cursor["upto"] < floor:
            raise ValueError(
                f"feed cursor is at epoch {cursor['upto']} but compaction "
                f"has folded history up to {floor}: the missing diffs are "
                "no longer derivable. Publish after every apply round (or "
                "before compacting), or start a fresh feed dir and have "
                "the downstream re-bootstrap from a current snapshot."
            )
        # refresh the recorded payload contract to THIS publisher's: the
        # erasure hook replays the contract of the latest publishes, and
        # a legacy cursor (predating the field) gets it backfilled
        cursor["value_cols"] = sorted(value_cols)
    else:
        # first publish: downstream bootstraps from snapshot(as of the
        # earliest SERVABLE committed epoch) — on a freshly compacted
        # lake that is the newest epoch and feeds start after it
        boot = min(servable) if servable else epochs[-1]
        state = man.load_state()
        boot_max_lsn = 0
        for part in range(man.num_partitions):
            b, ds_ = state.live_files(part, upto_epoch=boot)
            for fe in ([b] if b else []) + ds_:
                boot_max_lsn = max(boot_max_lsn, fe.max_lsn)
        cursor = {
            "upto": boot,
            "bootstrap_epoch": boot,
            # feed metadata the downstream consumer needs: the entity's
            # merge semantics and an integrity stamp for the bootstrap
            # export (metadata-only to compute: file entries carry lsn)
            "merge_spec": man.merge_spec.to_dict(),
            "bootstrap_max_lsn": boot_max_lsn,
            # the feed's payload contract: later publishers (e.g. the
            # erasure hook in maintain.erase_keys) re-read it so every
            # epoch carries the same new_* columns
            "value_cols": sorted(value_cols),
        }
        atomic_write_json(cpath, cursor)

    published = []
    prev = cursor["upto"]
    keys_orders = set(man.merge_spec.key_cols) | set(man.merge_spec.order_cols)
    for e in [x for x in epochs if x > cursor["upto"]]:
        edir = os.path.join(out_dir, f"epoch={e}")
        if not os.path.isdir(edir):
            tmp = f"{edir}.tmp-publish"
            ds = snapshot_diff(lake_dir, prev, e, value_cols=value_cols)
            ds.write_parquet(tmp)
            # an all-no-op diff (e.g. a content-addressed entity's pure
            # re-publish epoch) writes zero files — the empty feed dir
            # is still the publish fence
            os.makedirs(tmp, exist_ok=True)
            # record the payload universe AS OF this epoch (the TO
            # endpoint's cumulative unified schema): the replica
            # consumer validates feed completeness against THIS set —
            # a pre-evolution epoch legitimately lacks new_* for a
            # column added in a later epoch, and checking it against
            # the replica's current schema would wedge replication
            # after a late-data invalidation reached behind the
            # evolution point
            asof = schema_mod.schema_from_json(man.epoch_record(e)["schema"])
            payload_asof = sorted(
                n for n in asof.names if n not in keys_orders and n != "op"
            )
            atomic_write_json(
                os.path.join(tmp, "_epoch_meta.json"),
                {
                    "payload_cols_asof": payload_asof,
                    "published_value_cols": sorted(value_cols),
                },
            )
            os.rename(tmp, edir)  # THE publish point
        rows = sum(
            pq.ParquetFile(os.path.join(edir, f)).metadata.num_rows
            for f in os.listdir(edir)
            if f.endswith(".parquet")
        )
        published.append({"epoch": e, "from_epoch": prev, "rows": rows})
        cursor["upto"] = e
        atomic_write_json(cpath, cursor)
        prev = e
    return {
        "published": published,
        "upto": cursor["upto"],
        "bootstrap_epoch": cursor["bootstrap_epoch"],
        "sec": time.perf_counter() - t0,
    }


def feed_value_cols(out_dir: str) -> tuple[str, ...] | None:
    """The feed's payload contract for re-publishers (the erasure hook):
    the cursor's recorded ``value_cols``, falling back for legacy
    cursors (predating the field) to the newest published epoch's
    ``_epoch_meta.json`` record.  None when unknowable — the caller
    should substitute the lake's full payload universe, the safe
    superset (publishing an erasure epoch with FEWER new_* columns than
    ``payload_cols_asof`` wedges replication permanently: the defective
    dir is already renamed into place and re-publish skips existing
    dirs)."""
    cursor = read_json(_cursor_path(out_dir))
    if "value_cols" in cursor:
        return tuple(cursor["value_cols"])
    epochs = sorted(
        (int(d.split("=", 1)[1]), d)
        for d in os.listdir(out_dir)
        if d.startswith("epoch=") and not d.endswith(".tmp-publish")
    )
    for _e, d in reversed(epochs):
        mp = os.path.join(out_dir, d, "_epoch_meta.json")
        if os.path.exists(mp):
            return tuple(read_json(mp).get("published_value_cols", ()))
    return None


def _feed_retention_floor(out_dir: str) -> int:
    """The feed's committed retention floor (epochs at/below it are
    retired); -2**63 when no cursor or floor exists yet."""
    cpath = _cursor_path(out_dir)
    if not os.path.exists(cpath):
        return -(2**63)
    cursor = read_json(cpath)
    return cursor.get("retention_floor", -(2**63))


def _recover_crashed_feed_erase(out_dir: str) -> None:
    """Finish (or roll back) a feed-epoch rewrite that crashed mid-swap.

    ``erase_feed_keys`` swaps each rewritten epoch dir in three steps:
    build ``_erase-tmp-epoch=E`` -> rename the live dir to
    ``_erase-old-epoch=E`` -> rename tmp into place -> rmtree old.  A
    crash can leave old/tmp dirs behind; this preamble restores the
    invariant that every published epoch has exactly one live dir:
    if the live dir exists the old/tmp leftovers are garbage (swap
    completed or never started), else the old dir IS the epoch and is
    renamed back so a re-run redoes the rewrite from scratch — UNLESS
    the epoch is at/below the retention floor: resurrecting a retired
    epoch from its parked pre-erase copy would re-materialize the very
    bytes retention destroyed, so those leftovers are deleted."""
    import shutil

    floor = _feed_retention_floor(out_dir)
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("_erase-old-epoch="):
            e = name.split("=", 1)[1]
            live = os.path.join(out_dir, f"epoch={e}")
            if os.path.isdir(live) or int(e) <= floor:
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            else:
                os.rename(os.path.join(out_dir, name), live)
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("_erase-tmp-epoch="):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)


def _sweep_retired_epochs(out_dir: str, floor: int) -> list[int]:
    """Remove every feed dir belonging to an epoch at/below ``floor`` —
    live ``epoch=E`` dirs AND crashed-erase leftovers
    (``_erase-old-epoch=E`` parked pre-erase copies,
    ``_erase-tmp-epoch=E`` build dirs), which hold the same bytes.
    Idempotent; runs on EVERY retire call (including the already-at-
    floor early return) so a crash between the cursor commit and the
    sweep cannot strand retired bytes forever."""
    import shutil

    retired = []
    for d in sorted(os.listdir(out_dir)):
        if d.endswith(".tmp-publish"):
            continue
        if d.startswith("epoch="):
            e = int(d.split("=", 1)[1])
            if e <= floor:
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
                retired.append(e)
        elif d.startswith(("_erase-old-epoch=", "_erase-tmp-epoch=")):
            if int(d.split("=", 1)[1]) <= floor:
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    return retired


def erase_feed_keys(out_dir: str, keys: list) -> dict:
    """Erase the given keys' DATA from every published feed epoch — the
    feed-side half of right-to-be-forgotten (``maintain.erase_keys``
    cleans the lake root; this cleans the published history, which is
    otherwise a durable copy of every erased value.  Reference analog:
    Kafka log compaction, `tick-intervals-consumer/elastic/client.go:97-147`
    for the absolute ES delete).

    Per feed epoch: rows of the key with ``change`` added/changed are
    DROPPED (the historical values vanish); ``change='deleted'`` rows
    are KEPT with every old_*/new_* payload column nulled — exactly a
    Kafka compacted-topic tombstone (key + null value), so a lagging
    consumer still learns the delete and converges.  The key identifier
    itself survives only in those tombstone rows; ``retire_feed_epochs``
    past the erasure epoch removes it too (Kafka retention), after
    which no byte of the key exists under the feed dir.

    Rewritten epochs get new content fingerprints, so existing replicas
    force-reapply them on the next ``replicate()`` and reconverge (the
    same machinery as late-data feed invalidation); untouched epochs
    keep their fingerprint and skip.  Each rewrite is a distributed
    ``map_batches`` pass committed by an atomic dir swap (crash-safe —
    see ``_recover_crashed_feed_erase``).

    Scope note (same as any log-shipping system): bootstrap snapshot
    exports and the replica lakes themselves are separate copies — run
    ``erase_keys`` on each replica lake (and re-export bootstraps) to
    erase them."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..schema import MergeSpec

    t0 = time.perf_counter()
    meta = read_json(_cursor_path(out_dir))
    spec = MergeSpec.from_dict(meta["merge_spec"])
    kcol = spec.key_cols[0]
    keep_cols = (
        set(spec.key_cols)
        | {"change"}
        | {f"{side}_{oc}" for side in ("old", "new") for oc in spec.order_cols}
    )
    keys_arr = pa.array(keys)

    _recover_crashed_feed_erase(out_dir)

    def rewrite(t: pa.Table) -> pa.Table:
        hit = pc.is_in(t.column(kcol), value_set=keys_arr)
        deleted = pc.equal(t.column("change"), "deleted")
        t = t.filter(pc.invert(pc.and_(hit, pc.invert(deleted))))
        hit = pc.is_in(t.column(kcol), value_set=keys_arr)
        for i, name in enumerate(t.column_names):
            if name in keep_cols or not name.startswith(("old_", "new_")):
                continue
            col = t.column(i)
            t = t.set_column(
                i, name, pc.if_else(hit, pa.scalar(None, col.type), col)
            )
        return t

    rewritten, skipped = [], []
    epochs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("epoch=") and not d.endswith(".tmp-publish")
    )
    import shutil

    for e in epochs:
        edir = os.path.join(out_dir, f"epoch={e}")
        files = sorted(
            os.path.join(edir, n) for n in os.listdir(edir) if n.endswith(".parquet")
        )
        # cheap touch probe: one key-column read per file, no rewrite
        # (and no fingerprint churn -> no replica force-reapply) for
        # epochs that never saw the key
        touched = any(
            pc.any(
                pc.is_in(pq.read_table(f, columns=[kcol]).column(kcol), value_set=keys_arr)
            ).as_py()
            for f in files
        )
        if not touched:
            skipped.append(e)
            continue
        tmp = os.path.join(out_dir, f"_erase-tmp-epoch={e}")
        old = os.path.join(out_dir, f"_erase-old-epoch={e}")
        shutil.rmtree(tmp, ignore_errors=True)
        rd.read_parquet(files).map_batches(rewrite, batch_format="pyarrow").write_parquet(
            tmp
        )
        os.makedirs(tmp, exist_ok=True)  # all-dropped epoch -> empty fence
        emeta = os.path.join(edir, "_epoch_meta.json")
        if os.path.exists(emeta):
            shutil.copy(emeta, os.path.join(tmp, "_epoch_meta.json"))
        os.rename(edir, old)
        os.rename(tmp, edir)  # the swap commit point
        shutil.rmtree(old, ignore_errors=True)
        rewritten.append(e)
    return {
        "rewritten_epochs": rewritten,
        "untouched_epochs": skipped,
        "sec": time.perf_counter() - t0,
    }


def retire_feed_epochs(lake_dir: str, out_dir: str, upto_epoch: int) -> dict:
    """Feed retention (the Kafka ``retention.ms`` analog): remove every
    published ``epoch<=upto_epoch`` dir and advance the feed's bootstrap
    point to ``upto_epoch`` — new consumers bootstrap from
    ``snapshot(upto_epoch=<floor>)`` and consume feeds after it; an
    existing replica whose watermark is behind the floor gets a LOUD
    resync error from ``replicate()`` instead of silently skipping the
    retired changes.  Retiring past an erasure epoch is the second half
    of feed-side right-to-be-forgotten: the tombstone rows
    ``erase_feed_keys`` kept (key identifier + nulls) are deleted with
    their epoch dirs, so no byte of the key survives under the feed.

    The floor must be published and still servable by the lake (at or
    after the lake's compaction retention floor) so the new bootstrap
    export and its integrity watermark can be derived.  Crash-safe
    ordering: the cursor (bootstrap point + ``retention_floor``) commits
    FIRST, then dirs are removed — a consumer racing a retention sweep
    either sees the old cursor with all dirs intact or the new floor
    (and re-checks its watermark against it); it can never silently
    skip a retired epoch."""
    t0 = time.perf_counter()
    man = Manifest(lake_dir)
    cpath = _cursor_path(out_dir)
    cursor = read_json(cpath)
    if upto_epoch > cursor["upto"]:
        raise ValueError(
            f"cannot retire epoch {upto_epoch}: feed is only published "
            f"up to {cursor['upto']}"
        )
    if not man.has_epoch(upto_epoch):
        raise ValueError(f"retention floor {upto_epoch} is not a committed epoch")
    if upto_epoch < man.retention_floor():
        raise ValueError(
            f"retention floor {upto_epoch} is behind the lake's compaction "
            f"floor {man.retention_floor()}: the new bootstrap snapshot "
            "would not be servable"
        )
    if upto_epoch <= cursor.get("retention_floor", cursor["bootstrap_epoch"] - 1):
        # already at/above this floor — but a prior run may have crashed
        # between its cursor commit and its sweep, so re-sweep (idempotent)
        # instead of returning with retired bytes still on disk
        swept = _sweep_retired_epochs(out_dir, cursor.get("retention_floor", -(2**63)))
        return {
            "retired": swept,
            "floor": cursor.get("retention_floor"),
            "sec": round(time.perf_counter() - t0, 3),
        }

    # the new bootstrap integrity watermark, same derivation as the
    # first publish (metadata-only: file entries carry lsn)
    state = man.load_state()
    boot_max_lsn = 0
    for part in range(man.num_partitions):
        b, ds_ = state.live_files(part, upto_epoch=upto_epoch)
        for fe in ([b] if b else []) + ds_:
            boot_max_lsn = max(boot_max_lsn, fe.max_lsn)
    cursor["bootstrap_epoch"] = upto_epoch
    cursor["bootstrap_max_lsn"] = boot_max_lsn
    cursor["retention_floor"] = upto_epoch
    atomic_write_json(cpath, cursor)  # THE retention commit point

    retired = _sweep_retired_epochs(out_dir, upto_epoch)
    return {"retired": retired, "floor": upto_epoch, "sec": time.perf_counter() - t0}


def invalidate_feeds_from(out_dir: str, epoch: int) -> dict:
    """Invalidate published feeds from ``epoch`` onward after a
    force-reapply (late data) changed the lake's as-of state at that
    epoch and beyond: deletes the stale ``epoch>=E`` feed dirs and rolls
    the cursor back so the next ``publish_changefeed`` rebuilds them as
    fresh diffs.  The downstream contract is replay-from-offset: a
    republished epoch dir means re-consume from there (consumption is
    keyed upserts/deletes, so re-consuming converges).

    If ``epoch`` is at or before the feed's bootstrap epoch the initial
    snapshot itself is stale — everything is removed (cursor included)
    and ``resync_required`` tells the operator the downstream must
    re-bootstrap from a fresh snapshot.
    """
    import shutil

    cpath = _cursor_path(out_dir)
    if not os.path.exists(cpath):
        return {"invalidated": []}
    cursor = read_json(cpath)

    published = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("epoch=") and not d.endswith(".tmp-publish")
    )
    stale = [e for e in published if e >= epoch]
    for e in stale:
        shutil.rmtree(os.path.join(out_dir, f"epoch={e}"), ignore_errors=True)

    if epoch <= cursor["bootstrap_epoch"]:
        os.remove(cpath)
        return {"invalidated": stale, "resync_required": True}

    remaining = [e for e in published if e < epoch]
    cursor["upto"] = max(remaining, default=cursor["bootstrap_epoch"])
    atomic_write_json(cpath, cursor)
    return {"invalidated": stale, "cursor_upto": cursor["upto"]}


def _make_feed_to_events(
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str],
    first_wins: bool = False,
):
    """Factory for the per-batch feed→change-event transform replicate()
    runs as a ``map_batches`` stage (pure Arrow, batch-local — no state,
    no driver materialization).

    Delete tombstones carry the old winner's order tuple with ONLY the
    final tie-breaker (lsn) bumped one step in the WINNING direction:
    (old_ts, old_lsn+1) beats exactly the versions the source delete
    beat and loses to everything that beat it — bumping the timestamp
    instead would let the tombstone wrongly outrank a later re-insert
    that TIED the source delete on timestamp and won on lsn.  For a
    ``first_wins`` (content-addressed) entity lower tuples win, so the
    step is -1."""
    import pyarrow as pa
    import pyarrow.compute as pc

    step = -1 if first_wins else 1

    def convert(t: pa.Table) -> pa.Table:
        deleted = pc.equal(t.column("change"), "deleted")
        cols: dict = {k: t.column(k) for k in key_cols}
        for oc in order_cols[:-1]:
            cols[oc] = pc.if_else(deleted, t.column(f"old_{oc}"), t.column(f"new_{oc}"))
        last = order_cols[-1]
        cols[last] = pc.if_else(
            deleted,
            pc.add(t.column(f"old_{last}"), step).cast(t.column(f"new_{last}").type),
            t.column(f"new_{last}"),
        )
        for vcol in payload_cols:
            cols[vcol] = t.column(f"new_{vcol}")
        cols["op"] = pc.if_else(
            deleted,
            pa.scalar("delete", pa.string()),
            pa.scalar("upsert", pa.string()),
        )
        return pa.table(cols)

    return convert


def _parquet_dir_col_max(dirpath: str, col: str):
    """Max of one column over a parquet directory from row-group
    statistics alone (driver-side metadata read; None when no file
    carries the column or the directory holds no rows).  Files lacking
    the column are skipped — not a short-circuit — so the bound check is
    order-independent and still sees the max the other files prove.
    Falls back to reading just that column of a file whose stats are
    missing."""
    mx = None
    for name in sorted(os.listdir(dirpath)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(dirpath, name)
        pf = pq.ParquetFile(path)
        names = pf.schema_arrow.names
        if col not in names:
            continue
        idx = names.index(col)
        for rg in range(pf.metadata.num_row_groups):
            rgmeta = pf.metadata.row_group(rg)
            if rgmeta.num_rows == 0:
                continue
            st = rgmeta.column(idx).statistics
            if st is not None and st.has_min_max:
                v = st.max
            else:
                import pyarrow.compute as pc

                v = pc.max(pf.read_row_group(rg, columns=[col]).column(col)).as_py()
            if v is not None:
                mx = v if mx is None else max(mx, v)
    return mx


def replicate(
    feed_dir: str,
    replica_lake: str,
    *,
    bootstrap_dir: str,
    num_partitions: int = 8,
    shard: tuple[int, int] | None = None,
) -> dict:
    """Downstream CONSUMER of a published feed — build (or catch up) a
    replica lake by turning each feed epoch back into change events and
    applying them through the engine's own idempotent upsert path.  The
    full loop this closes: source lake --publish--> feed --replicate-->
    replica lake, with ``snapshot(replica) == snapshot(source)`` at
    every published epoch (the reference's consumer services rebuilt on
    the same machinery as its producer).

    ``bootstrap_dir`` is the parquet export of the source's snapshot AS
    OF the feed's bootstrap epoch (``snapshot --upto-epoch <bootstrap>``)
    — the one-time initial sync every log-shipping consumer performs.
    Re-running is incremental and idempotent: already-applied feed
    epochs skip.  Feeds must carry every payload column as ``new_*``
    (publish with ``value_cols`` covering the schema) or this raises.

    Feed rows map to events vectorized: added/changed -> op='upsert'
    with the ``new_*`` columns; deleted -> op='delete' carrying the old
    winner's order tuple with only the lsn tie-breaker bumped, which
    beats the replica's current winner for that key exactly (the
    replica's winner IS the old side).

    The feed's ``_cursor.json`` is the consumer's source of truth: the
    entity's merge spec (the replica lake is created with the SOURCE's
    semantics, not a default) plus two bootstrap integrity stamps the
    export is checked against before anything is built on it — the
    ``_export_marker`` epoch when the export carries one (exact), and
    ``bootstrap_max_lsn`` always: the export's max lsn (parquet
    row-group statistics, metadata-only) must not EXCEED the lsn
    watermark recorded at bootstrap — an export taken after later
    epochs were ingested is refused.  (An export taken too early is
    caught by the marker; a marker-less too-early export with a
    hand-stripped lsn column is outside what cheap metadata can prove.)
    Republished (invalidated) feed epochs are detected by content
    fingerprint and force-reapplied, so a replica that consumed a stale
    feed reconverges on the next run.

    The feed→event conversion itself is a distributed ``map_batches``
    pass per epoch (written to a temp dir, atomically renamed — the
    rename is the conversion's commit point); the driver never holds an
    epoch's rows, so a tens-of-GB catch-up feed epoch streams through
    the object store like any other pipeline.  Converted event chunks
    for already-committed epochs are dead bytes; ``maintain.vacuum``
    sweeps them (the ``_feed.json`` fingerprints stay behind so re-runs
    still skip those epochs).
    """
    import hashlib
    import shutil

    import ray.data as rd

    from ..schema import MergeSpec
    from .apply import _parquet_dir_schema, apply_epoch, apply_log, bootstrap

    meta = read_json(_cursor_path(feed_dir))
    # a feed-erase that crashed mid-swap leaves an epoch with its live
    # dir missing and the pre-rewrite dir parked as _erase-old-epoch=E;
    # the consumer must not read around the hole (and must not mutate
    # the producer's directory) — fail loudly until the producer re-runs
    # erase_feed_keys, whose recovery preamble restores the invariant
    for name in os.listdir(feed_dir):
        if name.startswith("_erase-old-epoch="):
            e = name.split("=", 1)[1]
            if not os.path.isdir(os.path.join(feed_dir, f"epoch={e}")):
                raise RuntimeError(
                    f"feed erase crashed mid-swap for epoch {e}: re-run "
                    "erase_feed_keys on the feed before consuming"
                )
    spec = (
        MergeSpec.from_dict(meta["merge_spec"]) if "merge_spec" in meta else None
    )
    if spec is not None and not spec.has_tombstones:
        raise ValueError(
            "replicate requires a tombstoned entity (op column): the feed's "
            f"merge spec {meta['merge_spec']} cannot express deletes as events"
        )

    # integrity-check the bootstrap export against the feed's recorded
    # bootstrap epoch BEFORE building anything on top of it: a snapshot
    # taken at the wrong epoch would silently diverge the replica.  The
    # export's provenance marker (written by export_snapshot) is exact;
    # a marker-less directory (hand-assembled) is accepted as-is.  Only
    # a replica that does not exist yet consumes the export — for an
    # existing replica the checks are skipped, because retention
    # (retire_feed_epochs) legitimately advances the feed's bootstrap
    # point past the export the replica was originally built from.
    replica_exists = os.path.exists(os.path.join(replica_lake, "lake.json"))
    marker_path = os.path.join(bootstrap_dir, "_export_marker")
    if not replica_exists and os.path.exists(marker_path) and "bootstrap_epoch" in meta:
        marker = read_json(marker_path)
        if marker.get("upto_epoch") != meta["bootstrap_epoch"]:
            raise ValueError(
                f"bootstrap export watermark mismatch: export was taken "
                f"as of epoch {marker.get('upto_epoch')} but the feed was "
                f"bootstrapped at epoch {meta['bootstrap_epoch']} — export "
                f"the snapshot with --upto-epoch {meta['bootstrap_epoch']}"
            )
    # lsn bound check (works for marker-less, hand-assembled exports
    # too): the export's max lsn cannot exceed the lsn watermark the
    # publisher recorded at bootstrap — a higher value proves the export
    # was taken AFTER later epochs were ingested, which would silently
    # diverge the replica (deletes between the bootstrap epoch and the
    # export time never reach it as feed events).  Equality is not
    # required: the snapshot keeps only LWW winners, so the row carrying
    # the file-level max lsn may legitimately be absent (tombstoned, or
    # beaten by a higher-order lower-lsn late row).
    if not replica_exists and "bootstrap_max_lsn" in meta and spec is not None:
        export_lsn = _parquet_dir_col_max(bootstrap_dir, spec.lsn_col)
        if export_lsn is not None and export_lsn > meta["bootstrap_max_lsn"]:
            raise ValueError(
                f"bootstrap export is too new: its max {spec.lsn_col} "
                f"{export_lsn} exceeds the feed's bootstrap watermark "
                f"{meta['bootstrap_max_lsn']} — export the snapshot with "
                f"--upto-epoch {meta.get('bootstrap_epoch')}"
            )

    # ``shard=(k, n)``: this consumer owns only its key-space shard —
    # n replicate() drivers (own lakes, own Ray sessions) over the SAME
    # feed form a consumer fleet whose union equals the source, exactly
    # like the sharded ingest side (the reference's one-consumer-per-
    # partition deployment on the downstream end).  The bootstrap load
    # and every apply drop non-owned rows at the exchange; the shard is
    # persisted in the replica's lake.json like any other lake.
    boot_res = bootstrap(
        bootstrap_dir, replica_lake, num_partitions, merge_spec=spec, shard=shard
    )
    man = Manifest(replica_lake)
    if not boot_res.get("skipped") and "bootstrap_epoch" in meta:
        # remember which feed epoch this replica's bootstrap covers: the
        # replica's own manifest starts empty (compaction at -1), so
        # without this stamp a not-yet-caught-up replica cannot prove
        # it is ahead of a later retention floor
        man.meta["feed_bootstrap_epoch"] = meta["bootstrap_epoch"]
        atomic_write_json(os.path.join(replica_lake, "lake.json"), man.meta)
    # retention fence: feed epochs at/below the floor were retired
    # (retire_feed_epochs) — a replica whose watermark is behind the
    # floor is missing changes that no longer exist as feeds and MUST
    # re-bootstrap from a fresh snapshot; silently consuming only the
    # surviving epochs would diverge it forever
    if "retention_floor" in meta:
        watermark = max(
            man.committed_epochs() + [man.meta.get("feed_bootstrap_epoch", -1)]
        )
        if watermark < meta["retention_floor"]:
            # NOTE: a replica created before feed_bootstrap_epoch
            # stamping existed that has applied no feed epochs yet
            # lands here with watermark -1 even if its bootstrap in
            # fact covered the floor — we cannot prove that, so the
            # safe answer is still resync (or stamp lake.json's
            # feed_bootstrap_epoch by hand if the coverage is known).
            raise ValueError(
                f"replica watermark {watermark} is behind the feed's "
                f"retention floor {meta['retention_floor']}: the missing "
                "epochs were retired — re-bootstrap the replica from a "
                f"snapshot as of epoch {meta['bootstrap_epoch']} (a "
                "legacy replica whose lake.json lacks feed_bootstrap_epoch "
                "can instead be stamped manually if its bootstrap "
                "provably covered the floor)"
            )
    spec = man.merge_spec
    if not spec.has_tombstones:
        raise ValueError("replicate requires a tombstoned entity (op column)")
    key_cols = list(spec.key_cols)
    order_cols = list(spec.order_cols)
    # payload columns come from EACH FEED EPOCH's new_* columns, not the
    # replica's bootstrap schema: a column added upstream mid-log (F3
    # schema evolution) appears in later feeds only — deriving from the
    # bootstrap schema would silently drop it from the replica forever
    bootstrap_payload = {
        f.name
        for f in man.load_state().schema
        if f.name not in key_cols + order_cols + ["op"]
    }

    events_dir = os.path.join(replica_lake, "_replica_events")
    os.makedirs(events_dir, exist_ok=True)
    # sweep crashed conversion attempts: the dir rename below is the
    # conversion's commit point, so a *.tmp-replica dir was never done
    for name in os.listdir(events_dir):
        if name.endswith(".tmp-replica"):
            shutil.rmtree(os.path.join(events_dir, name), ignore_errors=True)
    epochs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(feed_dir)
        if d.startswith("epoch=") and not d.endswith(".tmp-publish")
    )

    def _feed_fingerprint(e: int) -> str:
        # streamed fixed-size reads: the fingerprint never holds more
        # than one 8 MiB chunk regardless of feed-epoch size
        h = hashlib.md5()
        fdir = os.path.join(feed_dir, f"epoch={e}")
        for name in sorted(os.listdir(fdir)):
            if name.endswith(".parquet"):
                with open(os.path.join(fdir, name), "rb") as fh:
                    for chunk in iter(lambda: fh.read(8 << 20), b""):
                        h.update(chunk)
        return h.hexdigest()

    force_epochs: list[int] = []
    for e in epochs:
        fdir = os.path.join(feed_dir, f"epoch={e}")
        edir = os.path.join(events_dir, f"epoch={e}")
        fp = _feed_fingerprint(e)
        fp_path = os.path.join(edir, "_feed.json")
        # the fingerprint file is written INSIDE the temp dir before the
        # rename, so "dir exists with matching _feed.json" means the
        # conversion completed for exactly these feed bytes.  Event
        # chunks may have been vacuumed after the epoch committed
        # (maintain.vacuum) — still done.  A REPUBLISHED epoch
        # (late-data invalidation upstream) has a different fingerprint:
        # rebuild, and force-reapply if the replica already committed
        # the stale version, otherwise it diverges forever.  The force
        # is DURABLE: "force_pending" rides the _feed.json commit and is
        # cleared only after the force-apply succeeds, so a crash
        # between the conversion rename and the apply cannot strand the
        # stale delta (review r4 #1).
        rec = read_json(fp_path) if os.path.exists(fp_path) else None
        if rec is not None and rec["md5"] == fp:
            has_chunks = any(n.endswith(".parquet") for n in os.listdir(edir))
            if rec.get("force_pending"):
                if has_chunks:
                    force_epochs.append(e)  # converted; apply still owed
                    continue
                # chunks gone in the crash window: fall through, rebuild
            elif has_chunks or man.has_epoch(e):
                continue
        # owed iff the replica already committed SOME version of this
        # epoch — NOT conditioned on the old events dir still existing:
        # a crash after the rmtree below (or mid-conversion) must not
        # demote the rebuild to a skip on the next run.  A spurious
        # force is an idempotent rewrite.
        needs_force = man.has_epoch(e)
        if os.path.isdir(edir):
            shutil.rmtree(edir)

        # validation is metadata-only: the feed epoch's unified parquet
        # schema names every published column without reading a row
        feed_schema = _parquet_dir_schema(fdir)
        feed_files = sorted(
            os.path.join(fdir, n) for n in os.listdir(fdir) if n.endswith(".parquet")
        )
        payload_cols = [
            c[len("new_") :]
            for c in feed_schema.names
            if c.startswith("new_") and c[len("new_") :] not in order_cols
        ]
        tmp = f"{edir}.tmp-replica"
        shutil.rmtree(tmp, ignore_errors=True)
        if feed_files:
            for col in order_cols:
                if f"new_{col}" not in feed_schema.names:
                    raise ValueError(f"feed epoch {e} lacks order column new_{col}")
            # completeness is judged against the payload universe AS OF
            # this feed epoch when the publisher recorded it (newer
            # feeds carry _epoch_meta.json): a pre-evolution epoch
            # legitimately lacks columns added later.  Meta-less feeds
            # fall back to the replica's bootstrap schema.
            emeta_path = os.path.join(fdir, "_epoch_meta.json")
            expected = (
                set(read_json(emeta_path)["payload_cols_asof"])
                if os.path.exists(emeta_path)
                else bootstrap_payload
            )
            missing = expected - set(payload_cols)
            if missing:
                raise ValueError(
                    f"feed epoch {e} lacks new_* for payload column(s) "
                    f"{sorted(missing)}: publish with value_cols covering the "
                    "full payload to make the feed replicable"
                )
            convert = _make_feed_to_events(
                key_cols, order_cols, payload_cols, spec.first_wins
            )
            rd.read_parquet(feed_files).map_batches(
                convert, batch_format="pyarrow"
            ).write_parquet(tmp)
        else:
            os.makedirs(tmp, exist_ok=True)  # empty feed epoch -> empty fence
        atomic_write_json(
            os.path.join(tmp, "_feed.json"),
            {"md5": fp, **({"force_pending": True} if needs_force else {})},
        )
        os.rename(tmp, edir)  # conversion commit point
        if needs_force:
            force_epochs.append(e)

    refreshed = []
    for e in force_epochs:
        apply_epoch(events_dir, replica_lake, e, force=True)
        # the force is done: clear the durable marker (idempotent; a
        # crash before this line just force-reapplies again next run)
        fp_path = os.path.join(events_dir, f"epoch={e}", "_feed.json")
        rec = read_json(fp_path)
        rec.pop("force_pending", None)
        atomic_write_json(fp_path, rec)
        refreshed.append(e)
    results = apply_log(events_dir, replica_lake)
    applied = [r["epoch"] for r in results if not r.get("skipped")]
    return {
        "applied_epochs": applied,
        "refreshed_epochs": refreshed,
        "feed_epochs": epochs,
    }
