"""Tail loop, status API, and late-data (backfill) force re-apply."""

from __future__ import annotations

import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.apply import apply_epoch, apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.tail import status, tail
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal

P = 8


def test_tail_applies_incrementally(ray_session, small_log, lake_dir, tmp_path):
    """Epoch dirs appearing over time are picked up in order; the final
    state equals a one-shot apply."""
    src_events = os.path.join(small_log, "events")
    staged = str(tmp_path / "staged_events")
    os.makedirs(staged)
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)

    # stage the first 3 epochs, tail, then stage the rest and tail again
    for e in range(3):
        shutil.copytree(os.path.join(src_events, f"epoch={e}"), os.path.join(staged, f"epoch={e}"))
    r1 = tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=2)
    assert len([r for r in r1 if not r.get("skipped")]) == 3
    assert status(lake_dir)["last_committed_epoch"] == 2

    for e in range(3, 10):
        shutil.copytree(os.path.join(src_events, f"epoch={e}"), os.path.join(staged, f"epoch={e}"))
    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=2)

    st = status(lake_dir)
    assert st["last_committed_epoch"] == 9
    assert st["epoch_intervals"] == [(0, 9)]
    assert st["gaps"] == []
    assert st["committed_at_lsn"] == 10_000

    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), src_events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_late_data_force_reapply(ray_session, small_log, lake_dir, tmp_path):
    """Backfill: an old epoch gains a late event file after commit;
    force re-apply folds it in (PublishSingleTicks analog)."""
    staged = str(tmp_path / "events")
    shutil.copytree(os.path.join(small_log, "events"), staged)
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)

    # hold back one chunk file of epoch 4 as the "late" delivery
    edir = os.path.join(staged, "epoch=4")
    files = sorted(f for f in os.listdir(edir) if f.endswith(".parquet"))
    late_file = files[0]
    held = str(tmp_path / "held.parquet")
    shutil.move(os.path.join(edir, late_file), held)

    apply_log(staged, lake_dir)
    partial = snapshot_table(lake_dir)

    # late data arrives; a plain re-apply is a no-op, force folds it in
    shutil.move(held, os.path.join(edir, late_file))
    assert apply_epoch(staged, lake_dir, 4)["skipped"]
    r = apply_epoch(staged, lake_dir, 4, force=True)
    assert not r["skipped"]

    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), staged)
    ok, msg = tables_equal(got, want)
    assert ok, msg
    # and the late rows actually changed something
    assert not partial.equals(got)


def test_tail_detects_grown_epoch(ray_session, small_log, lake_dir, tmp_path):
    """An already-committed epoch whose directory gains a late file is
    force-reapplied by the tail loop (the '(or grown)' promise)."""
    staged = str(tmp_path / "events")
    shutil.copytree(os.path.join(small_log, "events"), staged)
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)

    edir = os.path.join(staged, "epoch=4")
    files = sorted(f for f in os.listdir(edir) if f.endswith(".parquet"))
    held = str(tmp_path / "held.parquet")
    shutil.move(os.path.join(edir, files[0]), held)

    tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=2)
    partial = snapshot_table(lake_dir)

    # the late file lands in the already-committed epoch dir
    shutil.move(held, os.path.join(edir, files[0]))
    r2 = tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=2)
    regrown = [r for r in r2 if r.get("regrown")]
    assert len(regrown) == 1 and regrown[0]["epoch"] == 4
    assert "refused" not in regrown[0]

    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), staged)
    ok, msg = tables_equal(got, want)
    assert ok, msg
    assert not partial.equals(got)


def test_force_reapply_refused_after_compaction(ray_session, small_log, lake_dir):
    """Once an epoch is folded into a compacted base, force-reapply must
    fail loudly instead of silently losing the late rows (ADVICE r1
    high: the rebuilt delta would be invisible to live_files)."""
    import pytest

    from go_data_publisher_ray.pipelines.compact import compact

    events = os.path.join(small_log, "events")
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(events, lake_dir, stop_after=5)
    compact(lake_dir)

    with pytest.raises(ValueError, match="folded into the compacted base"):
        apply_epoch(events, lake_dir, 2, force=True)

    # tail records the refusal instead of crashing when the grown epoch
    # is already compacted
    rec = __import__(
        "go_data_publisher_ray.state.manifest", fromlist=["Manifest"]
    ).Manifest(lake_dir).epoch_record(2)
    assert rec["metrics"]["src_files"] >= 1


def test_tail_refused_grown_epoch_terminates(ray_session, small_log, lake_dir, tmp_path):
    """ADVICE r2 high: a grown-but-compacted epoch can never be
    force-reapplied, and its source metrics never update — tail() must
    record the refusal ONCE and then go idle (terminate via
    max_idle_polls), not hot-spin re-reporting it every poll."""
    import threading

    from go_data_publisher_ray.pipelines.compact import compact

    staged = str(tmp_path / "events")
    shutil.copytree(os.path.join(small_log, "events"), staged)
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(staged, lake_dir)
    compact(lake_dir)

    # late file lands in an epoch already folded into the compacted base
    edir = os.path.join(staged, "epoch=2")
    src = sorted(f for f in os.listdir(os.path.join(staged, "epoch=3")))[0]
    shutil.copy(
        os.path.join(staged, "epoch=3", src), os.path.join(edir, "late-extra.parquet")
    )

    out: dict = {}

    def run():
        out["results"] = tail(staged, lake_dir, poll_interval=0.05, max_idle_polls=3)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=60)  # pre-fix behavior: infinite hot loop, never returns
    assert not t.is_alive(), "tail() busy-looped on a refused grown epoch"
    refusals = [r for r in out["results"] if r.get("refused")]
    assert len(refusals) == 1 and refusals[0]["epoch"] == 2


def test_spill_sweep_removes_committed_orphans(ray_session, small_log, lake_dir):
    """Startup GC: spill dirs for committed epochs (left by a crash
    during a force reapply) are swept; uncommitted ones are kept for the
    retry path's own rebuild."""
    from go_data_publisher_ray.pipelines.apply import sweep_orphan_spill

    events = os.path.join(small_log, "events")
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(events, lake_dir, stop_after=2)

    spill = os.path.join(lake_dir, "spill")
    os.makedirs(os.path.join(spill, "epoch=000001"))  # committed -> orphan
    os.makedirs(os.path.join(spill, "epoch=000009"))  # not committed -> keep
    removed = sweep_orphan_spill(lake_dir)
    assert removed == ["epoch=000001"]
    assert not os.path.isdir(os.path.join(spill, "epoch=000001"))
    assert os.path.isdir(os.path.join(spill, "epoch=000009"))

    # apply_log runs the sweep on entry (resume path)
    os.makedirs(os.path.join(spill, "epoch=000000"))
    apply_log(events, lake_dir, stop_after=1)
    assert not os.path.isdir(os.path.join(spill, "epoch=000000"))


def test_serve_status_http(ray_session, small_log, lake_dir):
    """The status-service HTTP surface analog: GET /status returns the
    same lineage JSON, /health is ok."""
    import json
    import urllib.request

    from go_data_publisher_ray.pipelines.tail import serve_status

    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(os.path.join(small_log, "events"), lake_dir, stop_after=2)
    srv = serve_status(lake_dir)
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        assert urllib.request.urlopen(f"{base}/health").read() == b"ok"
        body = json.load(urllib.request.urlopen(f"{base}/status"))
        assert body["last_committed_epoch"] == 1
        assert body["num_partitions"] == P

        # VERDICT r3 #7: the Prometheus scrape surface carries the same
        # numbers in text exposition format
        resp = urllib.request.urlopen(f"{base}/metrics")
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
        metrics = {}
        for line in text.splitlines():
            if line and not line.startswith("#"):
                name, val = line.rsplit(" ", 1)
                metrics[name] = float(val)
        assert metrics["gdp_last_committed_epoch"] == 1
        assert metrics["gdp_num_partitions"] == P
        assert metrics["gdp_epoch_gaps"] == 0
        assert metrics["gdp_total_rows"] == body["total_rows"]
        assert metrics["gdp_committed_at_lsn"] == body["committed_at_lsn"]
        assert metrics["gdp_last_epoch_events"] > 0
        assert (
            metrics['gdp_partition_last_lsn{partition="0"}']
            == body["partitions"]["0"]["last_lsn"]
        )
        assert "# TYPE gdp_partition_rows gauge" in text
    finally:
        srv.shutdown()


def test_status_shape(ray_session, small_log, lake_dir):
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(os.path.join(small_log, "events"), lake_dir, stop_after=2)
    st = status(lake_dir)
    assert st["num_partitions"] == P
    assert set(st["partitions"][0]) == {"partition", "last_lsn", "row_count", "bytes"}
    assert st["total_rows"] > 0 and st["total_bytes"] > 0
    assert st["schema_version"] >= 1
