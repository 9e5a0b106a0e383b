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
