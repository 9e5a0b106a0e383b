"""Replay-equivalence: the engine's final table must equal a brute-force
replay of the change log — including byte-identical ``text`` per url
(BASELINE.json north_rule; the source-vs-sink verification of
``status-service/sync/tick_processor.go:203-334``)."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import (
    duckdb_oracle_table,
    gap_scan,
    lineage_check,
    replay_oracle_table,
    tables_equal,
)

P = 8


@pytest.fixture()
def applied_lake(ray_session, small_log, lake_dir):
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    results = apply_log(os.path.join(small_log, "events"), lake_dir)
    assert all(not r.get("skipped") for r in results)
    return lake_dir


def test_replay_equivalence(applied_lake, small_log):
    got = snapshot_table(applied_lake)
    want = replay_oracle_table(
        os.path.join(small_log, "base"), os.path.join(small_log, "events")
    )
    ok, msg = tables_equal(got, want)
    assert ok, msg
    # text byte-identity per url, explicitly
    assert got.column("text").equals(want.column("text"))
    assert got.column("html").cast("binary").equals(want.column("html").cast("binary"))


def test_sharded_ingest_union_equals_full(ray_session, small_log, tmp_path):
    """Horizontal service sharding (GDP_SHARD analog): two independent
    drivers, each owning half the key space (part % 2 == k) with its own
    lake, together reproduce the unsharded final table exactly — the
    correctness basis of the multi-process node-scaling probe."""
    import pyarrow as pa

    base = os.path.join(small_log, "base")
    events = os.path.join(small_log, "events")

    shards = []
    for k in range(2):
        lk = str(tmp_path / f"shard{k}")
        bootstrap(base, lk, P, shard=(k, 2))
        apply_log(events, lk, shard=(k, 2))
        shards.append(snapshot_table(lk))
    # disjoint and complete
    union = pa.concat_tables(shards)
    union = union.take(pc.sort_indices(union, sort_keys=[("url", "ascending")]))
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(union, want)
    assert ok, msg
    assert 0 < shards[0].num_rows < want.num_rows


def test_sharded_lake_verifies(ray_session, small_log, tmp_path):
    """A sharded lake must be VERIFIABLE: the shard recorded at
    bootstrap (lake.json) makes both replay-verification paths compare
    against the shard's slice of the source, not the full key space —
    a healthy sharded deployment must not report false corruption."""
    from go_data_publisher_ray.pipelines.verify import verify_partitions
    from go_data_publisher_ray.state.manifest import Manifest

    base = os.path.join(small_log, "base")
    events = os.path.join(small_log, "events")
    lk = str(tmp_path / "shard0")
    bootstrap(base, lk, P, shard=(0, 2))
    # apply WITHOUT an explicit shard: resolved from lake.json
    apply_log(events, lk)
    man = Manifest(lk)
    assert man.shard == (0, 2)

    # driver-side replay oracle, shard-filtered
    got = snapshot_table(lk)
    want = replay_oracle_table(base, events, shard=(0, 2), num_partitions=P)
    ok, msg = tables_equal(got, want)
    assert ok, msg
    assert 0 < got.num_rows

    # distributed per-partition audit: only owned partitions checked
    rep = verify_partitions(lk, base, events)
    assert rep["mismatched_partitions"] == []
    assert rep["shard"] == "0/2"
    assert rep["partitions_checked"] == P // 2

    # conflicting explicit shard is refused
    with pytest.raises(ValueError, match="shard"):
        apply_log(events, lk, shard=(1, 2))

    # full CLI verify surface on the sharded lake (fresh process: the
    # in-process CLI would shut down the session Ray fixture)
    import json as _json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "go_data_publisher_ray.cli", "--num-cpus", "4",
         "verify", "--lake", lk, "--base", base, "--events", events],
        capture_output=True, text=True, cwd="/root/repo",
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["replay_equivalent"] is True, out


def test_presharded_log_ingest_union_equals_full(ray_session, small_log, tmp_path):
    """Broker-side log pre-partitioning (pipelines/shard.py): each
    driver reads ONLY its shard's epoch dirs — no hash-and-drop of
    other shards' rows — and the shard lakes still union to the oracle."""
    import pyarrow as pa

    from go_data_publisher_ray.pipelines.shard import shard_events

    base = os.path.join(small_log, "base")
    events = os.path.join(small_log, "events")
    sharded = str(tmp_path / "sharded")
    info = shard_events(events, sharded, 2, num_partitions=P)
    assert sum(info["rows_per_shard"].values()) == 10_000  # SMALL_SPEC n_events
    assert min(info["rows_per_shard"].values()) > 0

    shards = []
    for k in range(2):
        lk = str(tmp_path / f"slake{k}")
        bootstrap(base, lk, P, shard=(k, 2))
        apply_log(os.path.join(sharded, f"shard={k}"), lk, shard=(k, 2))
        shards.append(snapshot_table(lk))
    union = pa.concat_tables(shards)
    union = union.take(pc.sort_indices(union, sort_keys=[("url", "ascending")]))
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(union, want)
    assert ok, msg


def test_duckdb_oracle_agrees(applied_lake, small_log):
    got = snapshot_table(applied_lake)
    want = duckdb_oracle_table(
        os.path.join(small_log, "base"), os.path.join(small_log, "events")
    )
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_deletes_absent(applied_lake):
    got = snapshot_table(applied_lake)
    # the fixture deletes ~10% of events' targets; ensure nothing with a
    # winning delete survived: snapshot carries no 'op' column and the
    # oracle equality above already proves the row set; spot-check size
    assert got.num_rows > 0
    assert "op" not in got.schema.names


def test_lineage_and_gaps(applied_lake):
    gaps = gap_scan(applied_lake)
    assert gaps["gaps"] == []
    assert gaps["committed"] == 10
    lin = lineage_check(applied_lake)
    assert lin["mismatches"] == []


def test_snapshot_partition_pruning(applied_lake):
    # every url appears exactly once
    got = snapshot_table(applied_lake)
    assert pc.count_distinct(got.column("url")).as_py() == got.num_rows
