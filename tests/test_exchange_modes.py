"""Alternate epoch-exchange implementations must produce the same
final table state as the default sort exchange:

- GDP_EXCHANGE=hash: hash repartition on part + whole-block
  multi-partition writer (no global sort of payload rows);
- GDP_EXCHANGE=ref: payload-reference exchange — only light key rows
  go through the sort shuffle, payload bytes take map-side
  per-partition spill files on the lake's shared storage (the
  exchange-volume reduction for the scaling criterion).
"""

from __future__ import annotations

import os

import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal

P = 8


@pytest.mark.parametrize("mode", ["hash", "ref"])
def test_exchange_mode_matches_oracle(ray_session, small_log, lake_dir, monkeypatch, mode):
    monkeypatch.setenv("GDP_EXCHANGE", mode)
    events = os.path.join(small_log, "events")
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(events, lake_dir)
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), events)
    ok, msg = tables_equal(got, want)
    assert ok, f"{mode}: {msg}"
    # ref mode must clean up its transient spill files
    if mode == "ref":
        assert not os.listdir(os.path.join(lake_dir, "spill"))


def test_ref_exchange_idempotent_reapply(ray_session, small_log, lake_dir, monkeypatch):
    """Re-applying an epoch under the ref exchange is an idempotent
    overwrite (deterministic delta bytes), same as the sort path."""
    import pyarrow.parquet as pq

    from go_data_publisher_ray.pipelines.apply import apply_epoch
    from go_data_publisher_ray.state.manifest import Manifest

    monkeypatch.setenv("GDP_EXCHANGE", "ref")
    events = os.path.join(small_log, "events")
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(events, lake_dir, stop_after=2)

    man = Manifest(lake_dir)
    _base, deltas = man.load_state().live_files(1)
    victim = os.path.join(lake_dir, deltas[-1].path)
    before = open(victim, "rb").read()
    apply_epoch(events, lake_dir, 1, force=True)
    after = open(victim, "rb").read()
    assert before == after
