"""Schema evolution (F3): from ``evolve_epoch`` on, events carry an
added ``fetch_status:int32``; the lake's unified schema must gain the
column, pre-evolution rows read back as nulls, and replay equivalence
must hold across the evolution fence (``pa.unify_schemas`` per epoch —
the explicit version of the reference's tolerant JSON decode,
``tick-data-publisher/domain/tick_data.go:8-12``)."""

from __future__ import annotations

import dataclasses
import os

import pyarrow as pa
import pyarrow.compute as pc

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal
from go_data_publisher_ray.sources.generator import cached_fixture
from go_data_publisher_ray.state.manifest import Manifest

from conftest import SMALL_SPEC

P = 8

EVOLVE_SPEC = dataclasses.replace(SMALL_SPEC, evolve_epoch=6)


def test_schema_evolution(ray_session, tmp_path):
    log = cached_fixture(EVOLVE_SPEC)
    lake = str(tmp_path / "lake")
    bootstrap(os.path.join(log, "base"), lake, P)
    apply_log(os.path.join(log, "events"), lake)

    man = Manifest(lake)
    state = man.load_state()
    assert "fetch_status" in state.schema.names
    assert state.schema.field("fetch_status").type == pa.int32()
    # schema version bumped at the evolution fence
    import json

    v5 = json.load(open(os.path.join(lake, "manifest", "epoch_000005.json")))
    v6 = json.load(open(os.path.join(lake, "manifest", "epoch_000006.json")))
    assert "fetch_status" not in v5["schema"]
    assert "fetch_status" in v6["schema"]
    assert v6["schema_version"] == v5["schema_version"] + 1

    got = snapshot_table(lake)
    assert "fetch_status" in got.schema.names
    # rows last touched before the fence -> null fetch_status
    pre = got.filter(pc.less_equal(got.column("lsn"), 6 * SMALL_SPEC.epoch_size))
    assert pre.column("fetch_status").null_count == pre.num_rows

    want = replay_oracle_table(os.path.join(log, "base"), os.path.join(log, "events"))
    ok, msg = tables_equal(got, want)
    assert ok, msg
