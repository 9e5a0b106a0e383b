"""Outgoing changefeed publisher: a downstream consumer that bootstraps
from the first-epoch snapshot and applies the published feeds in order
must reconstruct the lake's final state exactly (the producer-side
replay-equivalence mirror of the apply tests)."""

from __future__ import annotations

import os

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.publish import publish_changefeed
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.state.manifest import read_json

P = 8
VALUE_COLS = ("text", "lang", "html")


def _consume(feed_dir: str, state: dict, key: str = "url") -> dict:
    """Reference downstream consumer: deleted removes, else upsert new_*."""
    import pyarrow.parquet as pq

    t = pq.read_table(feed_dir)
    for r in t.to_pylist():
        if r["change"] == "deleted":
            state.pop(r[key], None)
        else:
            state[r[key]] = {
                key: r[key],
                **{c: r[f"new_{c}"] for c in ("warc_ts", "lsn") + VALUE_COLS},
            }
    return state


def test_publish_reconstructs_final_state(ray_session, small_log, lake_dir, tmp_path):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=4)

    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    b = out["bootstrap_epoch"]
    assert [p["epoch"] for p in out["published"]] == [e for e in range(10) if b < e <= 3]

    # incremental: later epochs publish on a second call; re-run is a no-op
    apply_log(events, lake_dir)
    out2 = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    assert out2["published"] and out2["published"][0]["from_epoch"] == 3
    assert publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)["published"] == []
    cursor = read_json(os.path.join(feed, "_cursor.json"))
    assert cursor["upto"] == 9 and cursor["bootstrap_epoch"] == b

    # downstream replay: snapshot as of the bootstrap epoch + feeds in order
    init = snapshot_table(lake_dir, upto_epoch=b)
    state = {
        r["url"]: {c: r[c] for c in ("url", "warc_ts", "lsn") + VALUE_COLS}
        for r in init.to_pylist()
    }
    for e in sorted(
        int(d.split("=")[1]) for d in os.listdir(feed) if d.startswith("epoch=")
    ):
        _consume(os.path.join(feed, f"epoch={e}"), state)

    want = {
        r["url"]: {c: r[c] for c in ("url", "warc_ts", "lsn") + VALUE_COLS}
        for r in snapshot_table(lake_dir).to_pylist()
    }
    assert state == want


def test_publish_idempotent_after_partial_crash(ray_session, small_log, lake_dir, tmp_path):
    """A crash between feed rename and cursor write re-advances the
    cursor without rewriting (existing epoch dirs are the publish
    truth); a leftover temp dir from a crash mid-write is rebuilt."""
    import shutil

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=3)
    publish_changefeed(lake_dir, feed)

    # simulate crash: roll the cursor back one epoch and plant a stale tmp
    cpath = os.path.join(feed, "_cursor.json")
    cursor = read_json(cpath)
    import json

    with open(cpath, "w") as f:
        json.dump({**cursor, "upto": cursor["upto"] - 1}, f)
    stale = os.path.join(feed, f"epoch={cursor['upto']}.tmp-publish")
    os.makedirs(stale)

    before = sorted(os.listdir(os.path.join(feed, f"epoch={cursor['upto']}")))
    mtimes = {
        f: os.path.getmtime(os.path.join(feed, f"epoch={cursor['upto']}", f))
        for f in before
    }
    out = publish_changefeed(lake_dir, feed)
    # the on-disk dir is the publish truth: the cursor re-advances from
    # it without re-deriving (so `published` stays empty) and the feed
    # files are byte-untouched
    assert out["published"] == [] and out["upto"] == cursor["upto"]
    after = sorted(os.listdir(os.path.join(feed, f"epoch={cursor['upto']}")))
    assert after == before  # not rewritten
    for f in after:
        assert os.path.getmtime(os.path.join(feed, f"epoch={cursor['upto']}", f)) == mtimes[f]
    assert not os.path.exists(stale)
    assert read_json(cpath)["upto"] == cursor["upto"]


def test_tail_relay_publishes_incrementally(ray_session, small_log, lake_dir, tmp_path):
    """tail(publish_to=...) is a full CDC relay: epochs appearing in the
    upstream log stream through the lake into downstream feeds within
    the same loop."""
    import shutil

    from go_data_publisher_ray.pipelines.tail import tail

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    staged = str(tmp_path / "staged_events")
    feed = str(tmp_path / "feed")
    os.makedirs(staged)
    bootstrap(base, lake_dir, P)

    # stage half the log, relay it, then stage the rest and relay again
    epochs = sorted(
        int(d.split("=")[1]) for d in os.listdir(events) if d.startswith("epoch=")
    )
    for e in epochs[:5]:
        shutil.copytree(os.path.join(events, f"epoch={e}"), os.path.join(staged, f"epoch={e}"))
    r1 = tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed)
    pubs1 = [p for r in r1 if "published" in r for p in r["published"]]
    assert [p["epoch"] for p in pubs1] == epochs[1:5]  # first epoch = bootstrap cursor

    for e in epochs[5:]:
        shutil.copytree(os.path.join(events, f"epoch={e}"), os.path.join(staged, f"epoch={e}"))
    r2 = tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed)
    pubs2 = [p for r in r2 if "published" in r for p in r["published"]]
    assert [p["epoch"] for p in pubs2] == epochs[5:]

    on_disk = sorted(
        int(d.split("=")[1]) for d in os.listdir(feed) if d.startswith("epoch=")
    )
    assert on_disk == epochs[1:]


def test_relay_invalidates_feeds_on_late_data(ray_session, small_log, lake_dir, tmp_path):
    """Review r3: a force-reapplied (late-data) epoch changes the as-of
    state at that epoch and beyond — already-published feeds are stale
    and must be invalidated and republished, or the downstream silently
    misses the late rows forever."""
    import shutil

    import pyarrow.parquet as pq

    from go_data_publisher_ray.pipelines.snapshot import snapshot_table as snap
    from go_data_publisher_ray.pipelines.tail import tail

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    staged = str(tmp_path / "staged")
    feed = str(tmp_path / "feed")
    shutil.copytree(events, staged)
    bootstrap(base, lake_dir, P)
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=VALUE_COLS)

    # late data lands in already-published epoch 5: a NEW key only this
    # file carries (so missing it downstream is unambiguous)
    late_url = "https://late.example/only-in-late-file"
    late = pa_table_late(late_url)
    pq.write_table(late, os.path.join(staged, "epoch=5", "late-chunk.parquet"))

    r = tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
             publish_value_cols=VALUE_COLS)
    inv = [x for x in r if "feed_invalidated_from" in x]
    assert inv and inv[0]["feed_invalidated_from"] == 5
    assert min(inv[0]["invalidated"]) == 5
    pubs = [p for x in r if "published" in x for p in x["published"]]
    assert [p["epoch"] for p in pubs] == list(range(5, 10))  # rebuilt from 5

    # downstream replay over the rebuilt feeds now carries the late row
    cursor = read_json(os.path.join(feed, "_cursor.json"))
    init = snap(lake_dir, upto_epoch=cursor["bootstrap_epoch"])
    state = {
        row["url"]: {c: row[c] for c in ("url", "warc_ts", "lsn") + VALUE_COLS}
        for row in init.to_pylist()
    }
    for e in sorted(
        int(d.split("=")[1]) for d in os.listdir(feed) if d.startswith("epoch=")
    ):
        _consume(os.path.join(feed, f"epoch={e}"), state)
    assert late_url in state
    want = {
        row["url"]: {c: row[c] for c in ("url", "warc_ts", "lsn") + VALUE_COLS}
        for row in snap(lake_dir).to_pylist()
    }
    assert state == want


def pa_table_late(url: str):
    import numpy as np
    import pyarrow as pa

    return pa.table(
        {
            "url": [url],
            "warc_ts": pa.array(np.array([1_900_000_000_000_000], "datetime64[us]")),
            "html": [b"late-html"],
            "text": ["late text"],
            "lang": ["en"],
            "lsn": pa.array([999_999], pa.int64()),
            "op": ["upsert"],
            "epoch": pa.array([5], pa.int32()),
        }
    )


def test_replicate_builds_identical_replica(ray_session, small_log, lake_dir, tmp_path):
    """Full loop: source lake --publish--> feed --replicate--> replica
    lake built by the engine's own apply path; replica snapshot equals
    the source snapshot, incrementally and after deletes."""
    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot
    from go_data_publisher_ray.pipelines.verify import tables_equal

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")

    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=5)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    export_snapshot(lake_dir, boot, upto_epoch=out["bootstrap_epoch"])

    r = replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert r["applied_epochs"] == [p["epoch"] for p in out["published"]]
    ok, msg = tables_equal(snapshot_table(lake_dir), snapshot_table(replica))
    assert ok, msg

    # incremental catch-up (the rest of the log includes deletes)
    apply_log(events, lake_dir)
    publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    r2 = replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert r2["applied_epochs"]  # only the new feed epochs applied
    ok, msg = tables_equal(snapshot_table(lake_dir), snapshot_table(replica))
    assert ok, msg

    # idempotent: nothing new -> nothing applied
    assert replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)[
        "applied_epochs"
    ] == []


def test_replica_reconverges_after_feed_invalidation(
    ray_session, small_log, lake_dir, tmp_path
):
    """Review r3 (2nd pass): a replica that consumed a feed epoch which
    was later invalidated+republished (late data upstream) must detect
    the changed content and force-reapply — not skip and silently
    diverge."""
    import shutil

    import pyarrow.parquet as pq

    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot
    from go_data_publisher_ray.pipelines.tail import tail
    from go_data_publisher_ray.pipelines.verify import tables_equal

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    staged = str(tmp_path / "staged")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")
    shutil.copytree(events, staged)
    bootstrap(base, lake_dir, P)
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=VALUE_COLS)
    from go_data_publisher_ray.state.manifest import read_json as rj

    export_snapshot(
        lake_dir, boot, upto_epoch=rj(os.path.join(feed, "_cursor.json"))["bootstrap_epoch"]
    )
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    # late data lands upstream in already-published+consumed epoch 6
    late = pa_table_late("https://late.example/replica-divergence-probe")
    late = late.set_column(
        late.schema.get_field_index("epoch"),
        "epoch",
        __import__("pyarrow").array([6], __import__("pyarrow").int32()),
    )
    pq.write_table(late, os.path.join(staged, "epoch=6", "late-chunk.parquet"))
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=VALUE_COLS)

    r = replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert 6 in r["refreshed_epochs"]
    ok, msg = tables_equal(snapshot_table(lake_dir), snapshot_table(replica))
    assert ok, msg


def test_replicate_rejects_wrong_bootstrap(ray_session, small_log, lake_dir, tmp_path):
    """Review r3 (2nd pass): a bootstrap export taken at the wrong epoch
    must be rejected by the watermark stamp, not silently diverge."""
    import pytest

    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)

    wrong = str(tmp_path / "wrong_boot")
    export_snapshot(lake_dir, wrong, upto_epoch=out["bootstrap_epoch"] + 2)
    with pytest.raises(ValueError, match="watermark mismatch"):
        replicate(feed, str(tmp_path / "replica"), bootstrap_dir=wrong, num_partitions=4)


def test_publish_cursor_heals_past_compaction(ray_session, small_log, lake_dir, tmp_path):
    """Review r3 (2nd pass): a crash between the feed-dir rename and the
    cursor write, followed by compaction, must self-heal from the
    on-disk publish truth instead of demanding a full re-sync."""
    from go_data_publisher_ray.pipelines.compact import compact
    from go_data_publisher_ray.state.manifest import read_json as rj

    import json

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)

    # simulate the crash window: cursor one epoch behind the on-disk feeds
    cpath = os.path.join(feed, "_cursor.json")
    cursor = rj(cpath)
    with open(cpath, "w") as f:
        json.dump({**cursor, "upto": cursor["upto"] - 1}, f)
    compact(lake_dir)  # floor moves past the rolled-back cursor

    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    assert out["published"] == []  # healed from disk; nothing re-derived
    assert rj(cpath)["upto"] == cursor["upto"]


def test_replicate_tracks_schema_evolution(ray_session, tmp_path):
    """F3 through the full loop: a column added upstream mid-log rides
    the feeds (value_cols includes it) and evolves the REPLICA's schema
    too — deriving payload columns from the bootstrap schema would have
    silently dropped it."""
    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot
    from go_data_publisher_ray.pipelines.verify import tables_equal
    from go_data_publisher_ray.sources.generator import LogSpec, cached_fixture

    spec = LogSpec(
        n_base=1_000, n_sites=20, n_events=4_000, epoch_size=1_000,
        chunk_size=2_000, html_min=16, html_max=32, text_pad=16, evolve_epoch=2,
    )
    log = cached_fixture(spec)
    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")

    bootstrap(os.path.join(log, "base"), src, 4)
    apply_log(os.path.join(log, "events"), src)
    assert "fetch_status" in snapshot_table(src).schema.names  # evolved upstream

    out = publish_changefeed(
        src, feed, value_cols=VALUE_COLS + ("fetch_status",)
    )
    export_snapshot(src, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    got = snapshot_table(replica)
    assert "fetch_status" in got.schema.names
    ok, msg = tables_equal(snapshot_table(src), got)
    assert ok, msg


def test_replica_survives_invalidation_across_evolution(ray_session, tmp_path):
    """ADVICE r4 (medium): late-data invalidation reaching BEHIND a
    schema-evolution epoch republishes pre-evolution feeds that
    legitimately lack new_* for the later-added column.  The replica
    validates completeness against the payload set AS OF each feed
    epoch (recorded by the publisher in _epoch_meta.json), not its own
    current schema — otherwise replication wedges permanently."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot
    from go_data_publisher_ray.pipelines.tail import tail
    from go_data_publisher_ray.pipelines.verify import tables_equal
    from go_data_publisher_ray.sources.generator import LogSpec, cached_fixture

    spec = LogSpec(
        n_base=1_000, n_sites=20, n_events=4_000, epoch_size=1_000,
        chunk_size=2_000, html_min=16, html_max=32, text_pad=16, evolve_epoch=2,
    )
    log = cached_fixture(spec)
    src = str(tmp_path / "src")
    staged = str(tmp_path / "staged")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")
    shutil.copytree(os.path.join(log, "events"), staged)
    vcols = VALUE_COLS + ("fetch_status",)

    bootstrap(os.path.join(log, "base"), src, P)
    tail(staged, src, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=vcols)
    cursor = read_json(os.path.join(feed, "_cursor.json"))
    export_snapshot(src, boot, upto_epoch=cursor["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert "fetch_status" in snapshot_table(replica).schema.names

    # late data lands in epoch 1 — BEFORE the evolution epoch (2): the
    # invalidation republishes epoch-1's feed with the epoch-1 schema,
    # which has no fetch_status
    late = pa_table_late("https://late.example/pre-evolution-late-row")
    late = late.set_column(
        late.schema.get_field_index("epoch"), "epoch", pa.array([1], pa.int32())
    )
    pq.write_table(late, os.path.join(staged, "epoch=1", "late-chunk.parquet"))
    tail(staged, src, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=vcols)

    r = replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)  # must not raise
    assert 1 in r["refreshed_epochs"]
    ok, msg = tables_equal(snapshot_table(src), snapshot_table(replica))
    assert ok, msg


def test_vacuum_sweeps_replica_events_and_erase_claim(
    ray_session, small_log, lake_dir, tmp_path
):
    """ADVICE r4: converted feed events under _replica_events are dead
    bytes once their epoch committed — vacuum sweeps them, replicate
    still skips the swept epochs, and erase_keys' 'no byte of the key
    survives under the lake root' claim holds on replica lakes too."""
    from go_data_publisher_ray.pipelines.maintain import erase_keys, vacuum
    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_table as snap
    from go_data_publisher_ray.pipelines.verify import tables_equal

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    export_snapshot(lake_dir, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    ev_root = os.path.join(replica, "_replica_events")
    v = vacuum(replica)
    assert v["replica_event_files_deleted"] > 0
    leftover = [
        f for d in os.listdir(ev_root) if d.startswith("epoch=")
        for f in os.listdir(os.path.join(ev_root, d)) if f.endswith(".parquet")
    ]
    assert leftover == []
    # swept epochs still skip (fingerprint + committed), replica intact
    assert replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)[
        "applied_epochs"
    ] == []
    ok, msg = tables_equal(snapshot_table(lake_dir), snap(replica))
    assert ok, msg

    # erase a live key from the replica: its bytes must be gone from
    # EVERY file under the replica root, _replica_events included
    victim = snap(replica).column("url")[0].as_py()
    erase_keys(replica, [victim])
    hits = []
    for root, _dirs, files in os.walk(replica):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                if victim.encode() in fh.read():
                    hits.append(os.path.join(root, f))
    assert hits == []


def test_replicate_rejects_too_new_markerless_bootstrap(
    ray_session, small_log, lake_dir, tmp_path
):
    """ADVICE r4: bootstrap_max_lsn is now enforced — a marker-less
    (hand-assembled) export containing rows from epochs past the feed's
    bootstrap point is refused by the lsn bound, not silently applied."""
    import pytest

    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed = str(tmp_path / "feed")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)

    toonew = str(tmp_path / "toonew_boot")
    export_snapshot(lake_dir, toonew, upto_epoch=out["bootstrap_epoch"] + 3)
    os.remove(os.path.join(toonew, "_export_marker"))  # hand-assembled dir
    with pytest.raises(ValueError, match="too new"):
        replicate(feed, str(tmp_path / "replica"), bootstrap_dir=toonew, num_partitions=4)


def test_force_reapply_survives_crash_between_convert_and_apply(
    ray_session, small_log, lake_dir, tmp_path, monkeypatch
):
    """Review r4 #1: the force-reapply owed for a republished feed epoch
    is DURABLE (force_pending in _feed.json) — a crash after the
    conversion rename but before the apply must not strand the stale
    delta forever."""
    import shutil

    import pyarrow.parquet as pq

    from go_data_publisher_ray.pipelines import publish as publish_mod
    from go_data_publisher_ray.pipelines.maintain import vacuum
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_table as snap
    from go_data_publisher_ray.pipelines.tail import tail
    from go_data_publisher_ray.pipelines.verify import tables_equal

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    staged, feed = str(tmp_path / "staged"), str(tmp_path / "feed")
    boot, replica = str(tmp_path / "boot"), str(tmp_path / "replica")
    shutil.copytree(events, staged)
    bootstrap(base, lake_dir, P)
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=VALUE_COLS)
    export_snapshot(
        lake_dir, boot,
        upto_epoch=read_json(os.path.join(feed, "_cursor.json"))["bootstrap_epoch"],
    )
    publish_mod.replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    # late data upstream invalidates+republishes epoch 6
    late = pa_table_late("https://late.example/crash-window-probe")
    late = late.set_column(
        late.schema.get_field_index("epoch"),
        "epoch",
        __import__("pyarrow").array([6], __import__("pyarrow").int32()),
    )
    pq.write_table(late, os.path.join(staged, "epoch=6", "late-chunk.parquet"))
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=VALUE_COLS)

    # crash exactly between the conversion commit and the force-apply
    # (replicate imports apply_epoch at call time, so patch its source)
    from go_data_publisher_ray.pipelines import apply as apply_mod

    real_apply = apply_mod.apply_epoch

    def _crash_on_force(*a, **kw):
        if kw.get("force"):
            raise RuntimeError("injected crash before force-apply")
        return real_apply(*a, **kw)

    monkeypatch.setattr(apply_mod, "apply_epoch", _crash_on_force)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        publish_mod.replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    # the owed force is durable...
    fp = read_json(
        os.path.join(replica, "_replica_events", "epoch=6", "_feed.json")
    )
    assert fp.get("force_pending") is True
    # ...and vacuum must NOT sweep the owed epoch's chunks meanwhile
    vacuum(replica)
    assert any(
        f.endswith(".parquet")
        for f in os.listdir(os.path.join(replica, "_replica_events", "epoch=6"))
    )

    monkeypatch.setattr(apply_mod, "apply_epoch", real_apply)
    r = publish_mod.replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert 6 in r["refreshed_epochs"]
    fp2 = read_json(
        os.path.join(replica, "_replica_events", "epoch=6", "_feed.json")
    )
    assert "force_pending" not in fp2
    ok, msg = tables_equal(snapshot_table(lake_dir), snap(replica))
    assert ok, msg


def test_sharded_replica_fleet_union_equals_source(
    ray_session, small_log, lake_dir, tmp_path
):
    """Downstream consumer fleet: N replicate() drivers over the SAME
    feed, each owning one key shard (replicate(..., shard=(k, n))),
    together reproduce the source exactly — the consumer-side mirror of
    the sharded ingest test."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot
    from go_data_publisher_ray.pipelines.verify import tables_equal
    from go_data_publisher_ray.state.manifest import Manifest

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed, boot = str(tmp_path / "feed"), str(tmp_path / "boot")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    export_snapshot(lake_dir, boot, upto_epoch=out["bootstrap_epoch"])

    parts = []
    for k in (0, 1):
        rl = str(tmp_path / f"replica{k}")
        r = replicate(feed, rl, bootstrap_dir=boot, num_partitions=4, shard=(k, 2))
        assert r["applied_epochs"]
        assert Manifest(rl).shard == (k, 2)
        parts.append(snapshot_table(rl))
    union = pa.concat_tables(parts)
    union = union.take(pc.sort_indices(union, sort_keys=[("url", "ascending")]))
    want = snapshot_table(lake_dir)
    ok, msg = tables_equal(union, want)
    assert ok, msg
    assert 0 < parts[0].num_rows < want.num_rows  # real disjoint slices


def test_force_survives_crash_during_rebuild_conversion(
    ray_session, small_log, lake_dir, tmp_path
):
    """Review r4 (2nd pass): the owed force must also survive a crash
    BETWEEN the old events rmtree and the conversion rename — the next
    run recomputes needs_force from the replica manifest, not from the
    (now missing) events dir."""
    import shutil

    import pyarrow.parquet as pq

    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_table as snap
    from go_data_publisher_ray.pipelines.tail import tail
    from go_data_publisher_ray.pipelines.verify import tables_equal

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    staged, feed = str(tmp_path / "staged"), str(tmp_path / "feed")
    boot, replica = str(tmp_path / "boot"), str(tmp_path / "replica")
    shutil.copytree(events, staged)
    bootstrap(base, lake_dir, P)
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=VALUE_COLS)
    export_snapshot(
        lake_dir, boot,
        upto_epoch=read_json(os.path.join(feed, "_cursor.json"))["bootstrap_epoch"],
    )
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    late = pa_table_late("https://late.example/rebuild-crash-probe")
    late = late.set_column(
        late.schema.get_field_index("epoch"),
        "epoch",
        __import__("pyarrow").array([7], __import__("pyarrow").int32()),
    )
    pq.write_table(late, os.path.join(staged, "epoch=7", "late-chunk.parquet"))
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=1, publish_to=feed,
         publish_value_cols=VALUE_COLS)

    # simulate: crash AFTER the rmtree of the stale events, BEFORE the
    # new conversion committed — the events dir is simply gone
    shutil.rmtree(os.path.join(replica, "_replica_events", "epoch=7"))
    r = replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)
    assert 7 in r["refreshed_epochs"]
    ok, msg = tables_equal(snapshot_table(lake_dir), snap(replica))
    assert ok, msg


def test_erase_refuses_pending_force(ray_session, small_log, lake_dir, tmp_path):
    """Review r4 (2nd pass): erase_keys on a replica with a pending
    force-reapply must refuse — vacuum deliberately keeps the owed
    chunks, so 'no byte survives' would be silently false."""
    import pytest

    from go_data_publisher_ray.pipelines.maintain import erase_keys
    from go_data_publisher_ray.pipelines.publish import replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_table as snap
    from go_data_publisher_ray.state.manifest import atomic_write_json

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    feed, boot = str(tmp_path / "feed"), str(tmp_path / "boot")
    replica = str(tmp_path / "replica")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    out = publish_changefeed(lake_dir, feed, value_cols=VALUE_COLS)
    export_snapshot(lake_dir, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=4)

    fp_path = os.path.join(replica, "_replica_events", "epoch=5", "_feed.json")
    rec = read_json(fp_path)
    atomic_write_json(fp_path, {**rec, "force_pending": True})
    victim = snap(replica).column("url")[0].as_py()
    with pytest.raises(ValueError, match="pending force"):
        erase_keys(replica, [victim])
