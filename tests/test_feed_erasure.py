"""Feed-side right-to-be-forgotten (VERDICT r4 "What's missing" #1):
``erase_keys`` cleans the lake root, but published feed dirs were a
durable copy of every erased value.  These tests pin the closed loop:
``erase_keys(feed_dirs=...)`` removes every payload byte from the feed
immediately (delete tombstones keep key + nulls, Kafka-compaction
style), ``retire_feed_epochs`` past the erasure epoch removes the key
identifier too (Kafka retention), replicas reconverge throughout, and a
replica behind the retention floor gets a loud resync error instead of
silently diverging.  Reference analog: Kafka retention/compaction + the
absolute ES delete (`tick-intervals-consumer/elastic/client.go:97-147`).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.maintain import erase_keys
from go_data_publisher_ray.pipelines.publish import (
    erase_feed_keys,
    publish_changefeed,
    replicate,
    retire_feed_epochs,
)
from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_table
from go_data_publisher_ray.pipelines.verify import tables_equal
from go_data_publisher_ray.state.manifest import read_json

P = 8
VALUE_COLS = ("text", "lang", "html")


def _value_in_feed(feed: str, value: str) -> bool:
    """True if any string cell of any feed parquet file equals value."""
    for root, _dirs, files in os.walk(feed):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f))
            for col in t.columns:
                if pa.types.is_string(col.type) and pc.any(
                    pc.equal(col, value)
                ).as_py():
                    return True
    return False


def _key_rows(feed: str, url: str) -> list[dict]:
    out = []
    for root, _dirs, files in os.walk(feed):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f))
            if "url" not in t.column_names:
                continue
            out.extend(t.filter(pc.equal(t.column("url"), url)).to_pylist())
    return out


def test_erase_reaches_published_feed(ray_session, small_log, lake_dir, tmp_path):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")

    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    export_snapshot(lake_dir, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    # pick a live key whose payload text provably sits in the feed
    snap = snapshot_table(lake_dir)
    url = text = None
    for r in snap.to_pylist():
        if r["text"] and _value_in_feed(feed, r["text"]):
            url, text = r["url"], r["text"]
            break
    assert url is not None, "no published payload found to erase"
    assert _value_in_feed(feed, url)

    res = erase_keys(lake_dir, [url], feed_dirs=(feed,))
    assert res["erased"] == 1 and res["feeds"][feed]["rewritten_epochs"]

    # payload gone everywhere; the key survives ONLY as delete
    # tombstones whose payload columns are all null
    assert not _value_in_feed(feed, text)
    rows = _key_rows(feed, url)
    assert rows, "the delete tombstone must remain until retention"
    for r in rows:
        assert r["change"] == "deleted"
        for c in VALUE_COLS:
            assert r.get(f"old_{c}") is None and r.get(f"new_{c}") is None

    # existing replica reconverges: rewritten epochs force-reapply, the
    # published erasure epoch delivers the delete
    r2 = replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert res["epoch"] in r2["applied_epochs"]
    # every rewritten epoch the replica had already consumed must be
    # force-reapplied; the erasure epoch itself arrives as a fresh apply
    assert set(r2["refreshed_epochs"]) == set(
        res["feeds"][feed]["rewritten_epochs"]
    ) - set(r2["applied_epochs"])
    ok, msg = tables_equal(snapshot_table(lake_dir), snapshot_table(replica))
    assert ok, msg
    assert snapshot_table(replica).filter(
        pc.equal(snapshot_table(replica).column("url"), url)
    ).num_rows == 0

    # retention past the erasure epoch removes the tombstones too: now
    # NO byte of the key survives under the feed dir (value scan AND a
    # raw byte scan — the positive counterpart was asserted above)
    ret = retire_feed_epochs(lake_dir, feed, res["epoch"])
    assert res["epoch"] in ret["retired"]
    assert not _value_in_feed(feed, url)
    needle = url.encode()
    for root, _dirs, files in os.walk(feed):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                assert needle not in fh.read(), os.path.join(root, f)

    # the caught-up replica keeps consuming across the retention fence
    assert replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)[
        "applied_epochs"
    ] == []
    ok, msg = tables_equal(snapshot_table(lake_dir), snapshot_table(replica))
    assert ok, msg


def test_retention_fences_stale_replica(ray_session, small_log, lake_dir, tmp_path):
    import pytest

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    stale = str(tmp_path / "stale")

    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=5)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    export_snapshot(lake_dir, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, stale, bootstrap_dir=boot, num_partitions=4)  # watermark 4

    apply_log(events, lake_dir)
    publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    ret = retire_feed_epochs(lake_dir, feed, 6)
    assert ret["floor"] == 6 and max(ret["retired"]) == 6
    cursor = read_json(os.path.join(feed, "_cursor.json"))
    assert cursor["bootstrap_epoch"] == 6 and cursor["retention_floor"] == 6

    # the stale replica (watermark 4) is missing retired epochs 5..6
    with pytest.raises(ValueError, match="retention floor"):
        replicate(feed, stale, bootstrap_dir=boot, num_partitions=4)

    # a fresh consumer bootstraps at the new floor and converges
    boot2 = str(tmp_path / "boot2")
    fresh = str(tmp_path / "fresh")
    export_snapshot(lake_dir, boot2, upto_epoch=6)
    replicate(feed, fresh, bootstrap_dir=boot2, num_partitions=4)
    ok, msg = tables_equal(snapshot_table(lake_dir), snapshot_table(fresh))
    assert ok, msg

    # retiring ahead of the publish cursor is refused
    with pytest.raises(ValueError, match="only published"):
        retire_feed_epochs(lake_dir, feed, 99)


def test_retention_sweep_is_rerunnable(ray_session, small_log, lake_dir, tmp_path):
    """Crash window between the retention cursor commit and the dir
    sweep (r5 review finding): a re-run at the same floor must finish
    the sweep instead of early-returning with retired bytes on disk —
    and a parked ``_erase-old-epoch`` dir below the floor is deleted,
    never resurrected by the publish-path crash recovery."""
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)

    ret = retire_feed_epochs(lake_dir, feed, 5)
    assert ret["floor"] == 5

    # simulate the crash: re-materialize a retired live dir and park a
    # crashed-erase leftover, both at/below the committed floor
    os.makedirs(os.path.join(feed, "epoch=3"))
    os.makedirs(os.path.join(feed, "_erase-old-epoch=4"))

    again = retire_feed_epochs(lake_dir, feed, 5)  # same floor: re-run
    assert 3 in again["retired"]
    assert not os.path.exists(os.path.join(feed, "epoch=3"))
    assert not os.path.exists(os.path.join(feed, "_erase-old-epoch=4"))

    # the publish path's recovery must DELETE a below-floor parked dir,
    # not rename it back into a live epoch the retention already retired
    os.makedirs(os.path.join(feed, "_erase-old-epoch=4"))
    publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    assert not os.path.exists(os.path.join(feed, "epoch=4"))
    assert not os.path.exists(os.path.join(feed, "_erase-old-epoch=4"))


def test_erase_hook_survives_legacy_cursor(ray_session, small_log, lake_dir, tmp_path):
    """A feed cursor predating the ``value_cols`` field (r5 review
    finding): the erasure hook must recover the payload contract from
    the newest epoch meta — publishing the erasure epoch with () would
    wedge replication permanently (the defective dir is renamed into
    place and re-publish skips existing dirs)."""
    from go_data_publisher_ray.state.manifest import atomic_write_json

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    export_snapshot(lake_dir, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    cpath = os.path.join(feed, "_cursor.json")
    cur = read_json(cpath)
    del cur["value_cols"]  # legacy cursor
    atomic_write_json(cpath, cur)

    url = snapshot_table(lake_dir).column("url")[0].as_py()
    res = erase_keys(lake_dir, [url], feed_dirs=(feed,))
    assert res["feeds"][feed]["rewritten_epochs"]

    # the erasure epoch replicates (no wedge) and the replica converges
    r2 = replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert res["epoch"] in r2["applied_epochs"]
    ok, msg = tables_equal(snapshot_table(lake_dir), snapshot_table(replica))
    assert ok, msg
    # and the hook's publish backfilled the recovered contract
    assert read_json(cpath)["value_cols"] == sorted(VALUE_COLS)


def test_feed_erase_crash_recovery(ray_session, small_log, lake_dir, tmp_path):
    """A crash between the two swap renames leaves the epoch parked as
    _erase-old-epoch=E: consumers fail loudly, the producer's next
    publish (or erase re-run) restores the dir, and re-running the
    erase completes it."""
    import pytest

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    url = snapshot_table(lake_dir).column("url")[0].as_py()

    victim = max(
        int(d.split("=")[1]) for d in os.listdir(feed) if d.startswith("epoch=")
    )
    os.rename(
        os.path.join(feed, f"epoch={victim}"),
        os.path.join(feed, f"_erase-old-epoch={victim}"),
    )
    boot = str(tmp_path / "boot")
    with pytest.raises(RuntimeError, match="crashed mid-swap"):
        replicate(feed, str(tmp_path / "r"), bootstrap_dir=boot, num_partitions=4)

    erase_feed_keys(feed, [url])  # recovery preamble restores, then rewrites
    assert os.path.isdir(os.path.join(feed, f"epoch={victim}"))
    assert not any(n.startswith("_erase-") for n in os.listdir(feed))

    # the producer's publish also heals the parked dir on its own
    os.rename(
        os.path.join(feed, f"epoch={victim}"),
        os.path.join(feed, f"_erase-old-epoch={victim}"),
    )
    publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    assert os.path.isdir(os.path.join(feed, f"epoch={victim}"))
