"""T2 error-policy tests: mid-epoch worker death (crash-retry) and
poison-partition skip-and-record (deadletter) — the analog of the
reference's consecutive-error worker shrink and skip-and-record
(`status-service/sync/tick_processor.go:361-369`, `238-249`)."""

from __future__ import annotations

import json
import os

from go_data_publisher_ray.pipelines.apply import apply_epoch, apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal

P = 8


import pytest


@pytest.mark.parametrize("exchange", ["sort", "ref"])
def test_crash_mid_epoch_task_retried_idempotent(
    ray_session, small_log, lake_dir, tmp_path, monkeypatch, exchange
):
    """A writer task dies (os._exit) mid-epoch — under BOTH the sort
    exchange (DeltaWriter) and the payload-reference exchange
    (RefDeltaWriter); Ray retries the task, the idempotent rewrite
    produces identical bytes, and the final commit matches the replay
    oracle."""
    if exchange != "sort":
        monkeypatch.setenv("GDP_EXCHANGE", exchange)
    events = os.path.join(small_log, "events")
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(events, lake_dir, stop_after=2)

    marker = str(tmp_path / "crash_once")
    r = apply_epoch(events, lake_dir, 2, fault={"crash_marker": marker})
    assert not r["skipped"]
    assert os.path.exists(marker), "fault never fired"

    apply_log(events, lake_dir)  # remaining epochs, no faults
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_poison_partition_deadlettered_then_healed(ray_session, small_log, lake_dir):
    """A partition whose merge raises a data error is skipped and
    recorded to deadletter/ (the commit proceeds for healthy
    partitions); a later force re-apply with the poison gone heals the
    lake to the exact oracle state."""
    events = os.path.join(small_log, "events")
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(events, lake_dir, stop_after=3)

    r = apply_epoch(events, lake_dir, 3, fault={"poison_parts": [2]})
    assert not r["skipped"]
    assert r["deadletter_parts"] == [2]
    dl = os.path.join(lake_dir, "deadletter", "epoch_000003_part_00002.json")
    assert os.path.exists(dl)
    rec = json.load(open(dl))
    assert rec["partition"] == 2 and "poison" in rec["error"]

    # healthy partitions committed; the poisoned one is absent
    from go_data_publisher_ray.state.manifest import Manifest

    man = Manifest(lake_dir)
    erec = man.epoch_record(3)
    assert 2 not in {f["partition"] for f in erec["files"]}
    assert erec["metrics"]["deadletter_parts"] == [2]

    # heal: re-drive the epoch without the poison
    r2 = apply_epoch(events, lake_dir, 3, force=True)
    assert not r2["skipped"] and r2.get("deadletter_parts", []) == []

    apply_log(events, lake_dir)
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_adaptive_shrink_on_consecutive_errors(ray_session, small_log, lake_dir):
    """Adaptive degradation (`tick_processor.go:361-369` analog): two
    consecutive transient failures of an epoch shrink task parallelism
    to 1/4 width, the third attempt succeeds, the shrink is recorded in
    the result AND the manifest metrics, the NEXT epoch runs at full
    width again, and the final table still equals the replay oracle."""
    from go_data_publisher_ray.pipelines.apply import apply_epoch_adaptive
    from go_data_publisher_ray.state.manifest import Manifest

    events = os.path.join(small_log, "events")
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)

    fault = {"raise_times": [2]}
    results = apply_log(events, lake_dir, retries=2, fault=fault)
    assert fault["raise_times"] == [0], "fault never fired"
    shrunk = [r for r in results if "attempts" in r]
    assert len(shrunk) == 1  # only epoch 0 hit the injected errors
    assert shrunk[0]["attempts"] == 3
    assert shrunk[0]["parallelism_scale"] == 0.25
    # later epochs ran clean at full width
    man = Manifest(lake_dir)
    assert man.epoch_record(0)["metrics"]["parallelism_scale"] == 0.25
    assert "parallelism_scale" not in man.epoch_record(1)["metrics"]

    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), events)
    ok, msg = tables_equal(got, want)
    assert ok, msg

    # retries exhausted -> the final error propagates with context
    fault = {"raise_times": [99]}
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        apply_epoch_adaptive(
            events, lake_dir, 0, retries=1, fault=fault, force=True
        )
