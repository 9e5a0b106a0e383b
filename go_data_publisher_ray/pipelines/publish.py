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
    # a marker-less directory (hand-assembled) is accepted as-is.
    marker_path = os.path.join(bootstrap_dir, "_export_marker")
    if os.path.exists(marker_path) and "bootstrap_epoch" in meta:
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
    if "bootstrap_max_lsn" in meta and spec is not None:
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
    bootstrap(bootstrap_dir, replica_lake, num_partitions, merge_spec=spec, shard=shard)
    man = Manifest(replica_lake)
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
