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

    cpath = _cursor_path(out_dir)
    if os.path.exists(cpath):
        cursor = read_json(cpath)
    else:
        cursor = {"upto": epochs[0], "bootstrap_epoch": epochs[0]}
        atomic_write_json(cpath, cursor)

    published = []
    prev = cursor["upto"]
    for e in [x for x in epochs if x > cursor["upto"]]:
        edir = os.path.join(out_dir, f"epoch={e}")
        if not os.path.isdir(edir):
            tmp = f"{edir}.tmp-publish"
            ds = snapshot_diff(lake_dir, prev, e, value_cols=value_cols)
            ds.write_parquet(tmp)
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
