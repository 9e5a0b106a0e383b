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


def test_int_widen_evolution(ray_session, tmp_path):
    """A later epoch widening an int column (int32 -> int64) unifies
    via promote_options='permissive': pre-widen rows read back cast to
    the wider type and the manifest schema records int64."""
    import numpy as np
    import pyarrow.parquet as pq

    base_dir = str(tmp_path / "base")
    events_dir = str(tmp_path / "events")
    os.makedirs(base_dir)
    base = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(20)]),
            "warc_ts": pa.array(
                np.arange(20, dtype=np.int64) + 1_000, type=pa.timestamp("us")
            ),
            "score": pa.array(np.arange(20, dtype=np.int32)),
            "lsn": pa.array(np.zeros(20, dtype=np.int64)),
        }
    )
    pq.write_table(base, os.path.join(base_dir, "chunk-00000.parquet"))
    for e, typ in ((0, pa.int32()), (1, pa.int64())):
        edir = os.path.join(events_dir, f"epoch={e}")
        os.makedirs(edir)
        t = pa.table(
            {
                "lsn": pa.array(np.arange(5, dtype=np.int64) + 1 + e * 5),
                "op": pa.array(["update"] * 5),
                "url": pa.array([f"u{i}" for i in range(5)]),
                "warc_ts": pa.array(
                    np.arange(5, dtype=np.int64) + 2_000 + e * 100,
                    type=pa.timestamp("us"),
                ),
                "score": pa.array(
                    (np.arange(5) + 100 + e * 1_000_000_000_000).astype(
                        "int32" if typ == pa.int32() else "int64"
                    ),
                    type=typ,
                ),
            }
        )
        pq.write_table(t, os.path.join(edir, "chunk-00000.parquet"))

    lake = str(tmp_path / "lake")
    bootstrap(base_dir, lake, 4)
    apply_log(events_dir, lake)
    state = Manifest(lake).load_state()
    assert state.schema.field("score").type == pa.int64()
    got = snapshot_table(lake)
    assert got.schema.field("score").type == pa.int64()
    # widened value from epoch 1 survived; un-touched rows keep int32
    # values upcast losslessly
    by_url = dict(zip(got.column("url").to_pylist(), got.column("score").to_pylist()))
    assert by_url["u0"] == 100 + 1_000_000_000_000
    assert by_url["u19"] == 19
