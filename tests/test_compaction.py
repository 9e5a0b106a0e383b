"""Compaction + tombstones: folding deltas into a new base preserves
the merged view exactly, physically removes deleted urls
(FIXTURES.md `test_delete_tombstones`), and later epochs keep applying
on top of the compacted base."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import (
    lineage_check,
    replay_oracle_table,
    tables_equal,
)
from go_data_publisher_ray.state.manifest import Manifest

P = 8


def test_compaction_preserves_state(ray_session, small_log, lake_dir):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=6)
    before = snapshot_table(lake_dir)

    r = compact(lake_dir)
    assert r["compacted_partitions"] == P
    after = snapshot_table(lake_dir)
    ok, msg = tables_equal(before, after)
    assert ok, msg

    # all deltas folded: each partition now serves from a single base file
    man = Manifest(lake_dir)
    state = man.load_state()
    for p in range(P):
        b, deltas = state.live_files(p)
        assert b is not None and deltas == []
    assert lineage_check(lake_dir)["mismatches"] == []

    # remaining epochs apply on top of the compacted base
    apply_log(events, lake_dir)
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_auto_compaction_policy(ray_session, small_log, lake_dir):
    """apply_log(compact_every=K) bounds live files per partition and
    preserves replay equivalence."""
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    results = apply_log(events, lake_dir, compact_every=3)
    assert sum(1 for r in results if "compaction" in r) == 3  # after epochs 3,6,9
    man = Manifest(lake_dir)
    state = man.load_state()
    for p in range(P):
        _b, deltas = state.live_files(p)
        assert len(deltas) <= 3
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_delta_ratio_requires_count_backstop(tmp_path):
    """delta_ratio with min_deltas=1 is inert (the count backstop folds
    every partition with any delta, the exact write amplification the
    caller asked to avoid) — refused loudly, before touching the lake."""
    import pytest

    with pytest.raises(ValueError, match="min_deltas >= 2"):
        compact(str(tmp_path / "nolake"), delta_ratio=2.0)


def test_size_tiered_trigger(ray_session, small_log, lake_dir):
    """delta_ratio bounds write amplification: a cold partition with a
    tiny delta atop a big base skips the rewrite until the bytes ratio
    OR the min_deltas count backstop trips — and the merged view is
    unchanged either way."""
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=6)
    compact(lake_dir)  # big warm base per partition, zero deltas

    apply_log(events, lake_dir, stop_after=1)  # one small delta each
    man = Manifest(lake_dir)
    state = man.load_state()
    for p in range(P):
        b, deltas = state.live_files(p)
        assert b is not None and len(deltas) == 1
        # precondition for the skip branch: the delta really is small
        assert sum(d.bytes for d in deltas) < 2.0 * b.bytes

    want = snapshot_table(lake_dir)

    # ratio 2.0 not reached, count 1 < backstop 10 -> nothing rewrites
    r = compact(lake_dir, min_deltas=10, delta_ratio=2.0)
    assert r["compacted_partitions"] == 0
    state = Manifest(lake_dir).load_state()
    assert all(len(state.live_files(p)[1]) == 1 for p in range(P))

    # tiny ratio -> the bytes trigger fires even though count < backstop
    r = compact(lake_dir, min_deltas=10, delta_ratio=1e-6)
    assert r["compacted_partitions"] == P
    state = Manifest(lake_dir).load_state()
    assert all(state.live_files(p)[1] == [] for p in range(P))
    got = snapshot_table(lake_dir)
    ok, msg = tables_equal(got, want)
    assert ok, msg

    # count backstop: deltas pile up past min_deltas -> folds even
    # though each is tiny relative to the (now larger) base
    apply_log(events, lake_dir, stop_after=2)
    r = compact(lake_dir, min_deltas=2, delta_ratio=100.0)
    assert r["compacted_partitions"] == P

    # remaining epoch on top with a size-tiered in-loop sweep (its tiny
    # delta correctly skips the rewrite): replay equivalence end to end
    apply_log(events, lake_dir, compact_every=1, compact_delta_ratio=0.5)
    state = Manifest(lake_dir).load_state()
    assert any(len(state.live_files(p)[1]) == 1 for p in range(P))
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_tombstones_gone_after_compaction(ray_session, small_log, lake_dir):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)

    man = Manifest(lake_dir)
    state = man.load_state()

    def live_rows() -> int:
        total = 0
        for p in range(P):
            b, deltas = man.load_state().live_files(p)
            for fe in ([b] if b else []) + deltas:
                total += pq.ParquetFile(os.path.join(lake_dir, fe.path)).metadata.num_rows
        return total

    # deltas contain tombstone rows before compaction
    deltas_have_ops = False
    for p in range(P):
        _b, deltas = state.live_files(p)
        for fe in deltas:
            t = pq.read_table(os.path.join(lake_dir, fe.path), columns=["op"])
            if pc.any(pc.equal(t.column("op"), "delete")).as_py():
                deltas_have_ops = True
    assert deltas_have_ops

    rows_before = live_rows()
    want = snapshot_table(lake_dir)
    compact(lake_dir)
    rows_after = live_rows()
    assert rows_after == want.num_rows  # exactly the live rows, no tombstones
    assert rows_after < rows_before

    # no op column survives in base files
    for p in range(P):
        b, deltas = man.load_state().live_files(p)
        assert deltas == []
        schema = pq.read_schema(os.path.join(lake_dir, b.path))
        assert "op" not in schema.names

    got = snapshot_table(lake_dir)
    ok, msg = tables_equal(got, want)
    assert ok, msg
