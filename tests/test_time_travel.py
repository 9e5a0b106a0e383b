"""Time-travel reads: ``snapshot(lake, upto_epoch=E)`` returns the
merged state exactly as it stood when epoch E committed — deltas beyond
E excluded by the manifest (a metadata-only operation), the schema the
cumulative one recorded at E's commit, and travel fenced by the
compaction horizon (folded deltas are gone, so the view is
unreconstructable and must refuse loudly).  The lakehouse analog of the
reference re-serving an older tick range by timestamp filter
(status-service/sync/tick_processor.go:203-334)."""

from __future__ import annotations

import dataclasses
import os

import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.snapshot import snapshot, snapshot_table
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal
from go_data_publisher_ray.sources.generator import cached_fixture
from go_data_publisher_ray.state.manifest import Manifest

from conftest import SMALL_SPEC

P = 8

# evolution at epoch 6 so the as-of schema visibly changes mid-log
TRAVEL_SPEC = dataclasses.replace(SMALL_SPEC, evolve_epoch=6)


def _build(tmp_path) -> tuple[str, str]:
    log = cached_fixture(TRAVEL_SPEC)
    lake = str(tmp_path / "lake")
    bootstrap(os.path.join(log, "base"), lake, P)
    apply_log(os.path.join(log, "events"), lake)
    return log, lake


def test_time_travel_matches_truncated_replay(ray_session, tmp_path):
    log, lake = _build(tmp_path)
    for upto in (0, 4, TRAVEL_SPEC.n_epochs - 1):
        got = snapshot_table(lake, upto_epoch=upto)
        want = replay_oracle_table(
            os.path.join(log, "base"), os.path.join(log, "events"), upto_epoch=upto
        )
        if upto < TRAVEL_SPEC.evolve_epoch:
            # the driver-side oracle unifies over ALL event files before
            # truncating rows, so it carries the later-added column (as
            # nulls); the as-of view correctly predates it
            want = want.drop_columns(["fetch_status"])
        ok, msg = tables_equal(got, want)
        assert ok, f"upto={upto}: {msg}"


def test_time_travel_schema_as_of(ray_session, tmp_path):
    _, lake = _build(tmp_path)
    # before the evolution fence the historical view must NOT show the
    # later-added column; from the fence on it must
    pre = snapshot_table(lake, upto_epoch=5)
    post = snapshot_table(lake, upto_epoch=6)
    assert "fetch_status" not in pre.schema.names
    assert "fetch_status" in post.schema.names


def test_time_travel_refusals(ray_session, tmp_path):
    _, lake = _build(tmp_path)
    # uncommitted epoch -> loud error
    with pytest.raises(ValueError, match="not committed"):
        snapshot(lake, upto_epoch=10_000)
    # compaction folds deltas into the base: travel behind the horizon
    # is impossible and must refuse, travel at/after it still works
    compact(lake, min_deltas=1)
    with pytest.raises(ValueError, match="compaction"):
        snapshot_table(lake, upto_epoch=0)
    last = max(Manifest(lake).committed_epochs())
    got = snapshot_table(lake, upto_epoch=last)
    cur = snapshot_table(lake)
    ok, msg = tables_equal(got, cur)
    assert ok, msg
